"""Stage-level profiling of the 1080p P-frame pipeline on the real chip.

Separates: device transforms (fused encode / params / reconstruct / g_a / g_s),
device→host transfers, and host rANS encode/decode — to direct the perf work.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import spatiotemporalentropymodel_tpu as stem_tpu
from spatiotemporalentropymodel_tpu.entropy import base as entropy_base
from spatiotemporalentropymodel_tpu.models import (
    MeanScaleHyperprior,
    SpatioTemporalPriorModel,
)


def timed(name, fn, *args, n=10, sync=True):
    out = fn(*args)
    if sync:
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    if sync:
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt * 1e3:9.2f} ms")
    return out


def main():
    stem_tpu.set_entropy_coder("rans_interleaved")
    h, w = 1088, 1920
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, h, w, 3), jnp.float32)

    imodel = MeanScaleHyperprior(192, 192)
    imodel.init(x)
    stem = SpatioTemporalPriorModel(variant="without_spm")
    ga = imodel._jitted("ga", lambda v: imodel._apply(v, method="analysis")[0])
    y_shape = ga(x).shape
    y_cond = 0.5 * jax.random.normal(rng, y_shape, jnp.float32)
    stem.init(y_cond, y_cond)
    stem.update()
    gs = imodel._jitted("gs", lambda v: imodel._apply(v, method="get_x"))

    # realistic latents: sample from the model's own prediction, σ floored
    def sample(y0, y_cond, key):
        z = stem._apply(y0, y_cond, method="hyper_encode")
        med = jnp.asarray(stem.tables["entropy_bottleneck"].medians, jnp.float32)
        z_hat = jnp.round(z - med) + med
        scales, means = stem._apply(z_hat, y_cond, method="entropy_params")
        sigma = jnp.clip(jnp.abs(scales), 0.11, 0.25)
        return means + sigma * jax.random.normal(key, means.shape)

    y_cur = jax.jit(sample)(y_cond, y_cond, jax.random.PRNGKey(1))
    jax.block_until_ready(y_cur)

    enc_fn = stem._fused_encode_fn()
    params_fn = stem._fused_params_fn()
    rec_fn = stem._fused_reconstruct_fn()

    print("== device ==")
    timed("g_a (analysis)", ga, x)
    z_sym, y_sym, idx = timed("fused_encode", enc_fn, y_cur, y_cond)
    means, idx2 = timed("fused_params (dec side)", params_fn, z_sym, y_cond)
    y_hat = timed("fused_reconstruct", rec_fn, y_sym, means, y_cond)
    timed("g_s (synthesis)", gs, y_hat)

    print("== transfers ==")
    t = timed("y_sym -> host (np.asarray)", lambda a: np.asarray(a), y_sym,
              sync=False)
    timed("idx -> host", lambda a: np.asarray(a), idx, sync=False)
    timed("z_sym -> host", lambda a: np.asarray(a), z_sym, sync=False)
    timed("y_sym -> device", lambda a: jax.device_put(a).block_until_ready(),
          np.asarray(y_sym), sync=False)

    print("== host coder ==")
    zt = stem.tables["entropy_bottleneck"]
    gt = stem.tables["gaussian_conditional"]
    z_np = np.asarray(z_sym)
    y_np = np.asarray(y_sym)
    idx_np = np.asarray(idx, np.int32)
    z_idx = entropy_base.bottleneck_indexes(z_np.shape, zt.rows)
    coder = stem.coder

    def enc_z():
        return entropy_base.compress(z_np, z_idx, zt, coder)

    def enc_y():
        return entropy_base.compress(y_np, idx_np, gt, coder)

    zs = timed("rANS encode z", enc_z, sync=False)
    ys = timed("rANS encode y", enc_y, sync=False)
    timed("rANS decode z", lambda: entropy_base.decompress(zs, z_idx, zt, coder),
          sync=False)
    timed("rANS decode y",
          lambda: entropy_base.decompress(ys, idx_np, gt, coder), sync=False)
    nbytes = sum(len(s) for s in ys) + sum(len(s) for s in zs)
    print(f"bitstream: {nbytes} bytes = {nbytes * 8 / (h * w):.4f} bpp")
    print(f"symbols: y {y_np.size}, z {z_np.size}")


if __name__ == "__main__":
    main()
