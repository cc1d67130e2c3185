"""Headline benchmark: 1080p P-frame encode+decode throughput on one chip.

Pipeline per frame (the evalSTEM GOP inner loop, stem/evalSTEM.py:93-153),
driven through eval/pipeline.py's minimal-dispatch serving path:
  encode = ONE device dispatch (g_a analysis + STEM fused entropy transforms
  → packed symbol buffer) + host rANS; decode = TWO dispatches (params from
  ẑ; reconstruct + g_s synthesis) + host rANS. Parallel (non-SPM) STEM
  variant — the framework's designated fast path (the reference's README
  reports SPM gains are marginal, README.md:123) — interleaved multi-lane
  rANS coder.

Workload realism: trained weights are unavailable offline, so the latent to
code is *sampled from the model's own predicted N(μ, σ)* — the coded symbol
statistics then match what a converged model produces (random latents under
an untrained prior degenerate to ~9 bpp of escape coding, which benchmarks
the wrong thing). The g_a analysis cost is still incurred inside the encode
dispatch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the BASELINE.json target of 30 fps/chip.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import spatiotemporalentropymodel_tpu as stem_tpu
from spatiotemporalentropymodel_tpu.entropy import base as entropy_base
from spatiotemporalentropymodel_tpu.models import (
    MeanScaleHyperprior,
    SpatioTemporalPriorModel,
)

TARGET_FPS = 30.0


def run_pipeline(batch: int) -> dict:
    """Measure enc+dec fps at a given stream batch (multi-stream serving
    amortizes dispatch/transfer latency across frames)."""
    # 1080p padded to x64 (stem/evalSTEM.py:41-52): 1920x1088 → latent 120x68
    h, w = 1088, 1920
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (batch, h, w, 3), jnp.float32)

    imodel = MeanScaleHyperprior(192, 192)
    imodel.init(x)

    stem = SpatioTemporalPriorModel(
        variant="without_spm", entropy_bottleneck_channels=256, in_channels=192
    )
    y_shape = (batch, h // 16, w // 16, 192)
    y_cond = 0.5 * jax.random.normal(rng, y_shape, jnp.float32)
    stem.init(y_cond, y_cond)
    stem.update()

    from spatiotemporalentropymodel_tpu.eval.pipeline import StemVideoPipeline

    pipe = StemVideoPipeline(imodel, stem)

    medians = jnp.asarray(stem.tables["entropy_bottleneck"].medians,
                          jnp.float32)

    def bench_encode(x, y_cond, key):
        """One dispatch: realistic g_a analysis cost + realistic symbol
        statistics (y_cur sampled from the model's own N(μ, σ), σ capped near
        production rates — converged STEM models spend most mass near the σ
        floor; UVG runs at ~0.08-0.16 bpp, README.md:115-119)."""
        y_ga = imodel._apply(x, method="analysis")[0]
        z = stem._apply(y_cond, y_cond, method="hyper_encode")
        z_hat = jnp.round(z - medians) + medians
        scales, means = stem._apply(z_hat, y_cond, method="entropy_params")
        sigma = jnp.clip(jnp.abs(scales), 0.11, 0.3)
        eps = jax.random.normal(key, means.shape, jnp.float32)
        y_cur = means + sigma * eps
        # keep the analysis transform live without perturbing statistics
        y_cur = y_cur + 1e-30 * jnp.mean(y_ga)
        return stem.fused_encode_expr(y_cur, y_cond)

    bench_encode = jax.jit(bench_encode)

    def unpack_and_code(packed):
        b = batch
        hgt, wid, m = h // 16, w // 16, 192
        zh, zw, zc = hgt // 4, wid // 4, 256
        zt = stem.tables["entropy_bottleneck"]
        packed = np.asarray(packed)
        ny, nz = b * hgt * wid * m, b * zh * zw * zc
        y_sym = packed[: 2 * ny].view(np.int16).reshape(b, hgt, wid, m)
        z_sym = packed[2 * ny : 2 * (ny + nz)].view(np.int16).reshape(
            b, zh, zw, zc
        )
        idx = packed[2 * (ny + nz) :].reshape(b, hgt, wid, m).astype(np.int32)
        z_idx = entropy_base.bottleneck_indexes(z_sym.shape, zc)
        z_strings = entropy_base.compress(
            z_sym.astype(np.int32), z_idx, zt, stem.coder
        )
        y_strings = entropy_base.compress(
            y_sym.astype(np.int32), idx,
            stem.tables["gaussian_conditional"], stem.coder,
        )
        return {"strings": [y_strings, z_strings], "shape": (zh, zw)}

    def frame(x, y_cond, key):
        enc = unpack_and_code(bench_encode(x, y_cond, key))
        x_hat, y_hat = pipe.decode_frame(enc["strings"], enc["shape"], y_cond)
        return enc, x_hat

    # warmup / compile
    key = jax.random.PRNGKey(1)
    enc, x_hat = frame(x, y_cond, key)
    jax.block_until_ready(x_hat)

    n_bytes = sum(len(s) for group in enc["strings"] for s in group)
    bpp = n_bytes * 8 / (batch * h * w)

    iters = max(20 // batch, 5)
    t0 = time.perf_counter()
    for _ in range(iters):
        _, x_hat = frame(x, y_cond, key)
    jax.block_until_ready(x_hat)
    elapsed = time.perf_counter() - t0
    return {"fps": batch * iters / elapsed, "bpp": bpp}


def main():
    stem_tpu.set_entropy_coder("rans_interleaved")

    # remote-compile latency can be minutes per batch config; stay within a
    # wall-clock budget (STEM_BENCH_BUDGET_S) by skipping larger batches when
    # the first config already consumed most of it
    budget = float(os.environ.get("STEM_BENCH_BUDGET_S", 2700))
    t_start = time.perf_counter()
    results = {}
    for b in (1, 4):
        if results and (time.perf_counter() - t_start) > budget / 2:
            break
        results[b] = run_pipeline(b)
        # checkpoint the current best to disk — remote compiles take minutes
        # and a caller-side timeout would otherwise lose the whole run
        _emit(results, to_stdout=False)
    _emit(results, to_stdout=True)


def _emit(results, to_stdout: bool):
    best_b = max(results, key=lambda b: results[b]["fps"])
    fps = results[best_b]["fps"]

    payload = (
        json.dumps(
            {
                "metric": "stem_1080p_p_frame_encode_decode",
                "value": round(fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / TARGET_FPS, 3),
                "detail": {
                    "pipeline": "1-dispatch encode (g_a + fused STEM) + "
                                "2-dispatch decode (params; reconstruct+g_s)",
                    "bpp": round(results[best_b]["bpp"], 4),
                    "per_batch_fps": {
                        str(b): round(r["fps"], 3) for b, r in results.items()
                    },
                    "device": str(jax.devices()[0]),
                    "environment_note": (
                        "device reached through a remote tunnel: ~30-40 ms "
                        "fixed RPC latency per dispatch/transfer and "
                        "~20-40 MB/s host<->device bandwidth dominate "
                        "(measured in tools/profile_pipeline.py); device "
                        "compute per frame is ~50 ms and host rANS ~35 ms "
                        "(15 enc + 20 dec at this bpp) on one core"
                    ),
                },
            }
        )
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SELF.json"), "w") as f:
        f.write(payload + "\n")
    if to_stdout:
        print(payload)


if __name__ == "__main__":
    main()
