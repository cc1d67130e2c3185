"""Headline benchmark: 1080p P-frame encode+decode throughput on one chip.

Pipeline per frame (the evalSTEM GOP inner loop, stem/evalSTEM.py:93-153):
  I-model g_a (latent analysis) → STEM compress (device transforms + host
  rANS) → STEM decompress → I-model g_s (synthesis). Uses the parallel
  (non-SPM) STEM variant — the framework's designated fast path (the
  reference's own README reports SPM gains are marginal, README.md:123) —
  and the interleaved multi-lane rANS coder.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the BASELINE.json target of 30 fps/chip.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import spatiotemporalentropymodel_tpu as stem_tpu
from spatiotemporalentropymodel_tpu.models import (
    MeanScaleHyperprior,
    SpatioTemporalPriorModel,
)

TARGET_FPS = 30.0


def main():
    stem_tpu.set_entropy_coder("rans_interleaved")

    # 1080p padded to x64 (stem/evalSTEM.py:41-52): 1920x1088 → latent 120x68
    h, w = 1088, 1920
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, h, w, 3), jnp.float32)

    imodel = MeanScaleHyperprior(192, 192)
    imodel.init(x)

    stem = SpatioTemporalPriorModel(
        variant="without_spm", entropy_bottleneck_channels=256, in_channels=192
    )
    ga = imodel._jitted(
        "bench_ga", lambda v: imodel._apply(v, method="analysis")[0]
    )
    y_cur = ga(x)
    y_cond = y_cur + 0.1 * jax.random.normal(rng, y_cur.shape, jnp.float32)
    stem.init(y_cur, y_cond)
    stem.update()

    gs = imodel._jitted("bench_gs", lambda v: imodel._apply(v, method="get_x"))

    def frame(x, y_cond):
        y_cur = ga(x)
        enc = stem.compress(y_cur, y_cond)
        dec = stem.decompress(enc["strings"], enc["shape"], y_cond)
        x_hat = gs(dec["y_hat"])
        return enc, dec, x_hat

    # warmup / compile
    enc, dec, x_hat = frame(x, y_cond)
    jax.block_until_ready(x_hat)

    n_bytes = sum(len(s) for group in enc["strings"] for s in group)
    bpp = n_bytes * 8 / (h * w)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        _, dec, x_hat = frame(x, y_cond)
    jax.block_until_ready(x_hat)
    elapsed = time.perf_counter() - t0
    fps = iters / elapsed

    print(
        json.dumps(
            {
                "metric": "stem_1080p_p_frame_encode_decode",
                "value": round(fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / TARGET_FPS, 3),
                "detail": {
                    "pipeline": "g_a + STEM(without_spm) compress+decompress + g_s",
                    "bpp_random_input": round(bpp, 4),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
