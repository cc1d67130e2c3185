"""Headline benchmark: 1080p P-frame encode+decode throughput on one chip.

Pipeline per frame (the evalSTEM GOP inner loop, stem/evalSTEM.py:93-153):
  I-model g_a (latent analysis) → STEM compress (one fused device dispatch +
  host rANS) → STEM decompress → I-model g_s (synthesis). Uses the parallel
  (non-SPM) STEM variant — the framework's designated fast path (the
  reference's own README reports SPM gains are marginal, README.md:123) —
  and the interleaved multi-lane rANS coder.

Workload realism: trained weights are unavailable offline, so the latent to
code is *sampled from the model's own predicted N(μ, σ)* — the coded symbol
statistics then match what a converged model produces, giving a realistic
entropy-coder load (random latents under an untrained prior degenerate to
~9 bpp of escape coding, which benchmarks the wrong thing).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the BASELINE.json target of 30 fps/chip.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import spatiotemporalentropymodel_tpu as stem_tpu
from spatiotemporalentropymodel_tpu.entropy import build_indexes
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
    ga = imodel._jitted(
        "bench_ga", lambda v: imodel._apply(v, method="analysis")[0]
    )
    y_shape = ga(x).shape
    y_cond = 0.5 * jax.random.normal(rng, y_shape, jnp.float32)
    stem.init(y_cond, y_cond)
    stem.update()

    gs = imodel._jitted("bench_gs", lambda v: imodel._apply(v, method="get_x"))

    # Self-consistent workload: y_cur ~ N(μ, min(σ, 2)) under the model's own
    # entropy parameters for (z from a provisional pass, y_cond).
    table = stem.tables["gaussian_conditional"].scale_table

    def sample_latent(y0, y_cond, key):
        z = stem._apply(y0, y_cond, method="hyper_encode")
        med = jnp.asarray(stem.tables["entropy_bottleneck"].medians, jnp.float32)
        z_hat = jnp.round(z - med) + med
        scales, means = stem._apply(z_hat, y_cond, method="entropy_params")
        # σ floored at the table bound and capped near production statistics
        # (converged STEM models spend most mass near the σ floor; UVG runs at
        # ~0.08-0.16 bpp, README.md:115-119)
        sigma = jnp.clip(jnp.abs(scales), 0.11, 0.3)
        eps = jax.random.normal(key, means.shape, jnp.float32)
        y = means + sigma * eps
        return y_cond + y if stem.residual else y

    sample_latent = jax.jit(sample_latent)
    y_cur = sample_latent(y_cond, y_cond, jax.random.PRNGKey(1))
    jax.block_until_ready(y_cur)

    def frame(x, y_cur, y_cond):
        enc = stem.compress(y_cur, y_cond)
        dec = stem.decompress(enc["strings"], enc["shape"], y_cond)
        x_hat = gs(dec["y_hat"])
        return enc, dec, x_hat

    # warmup / compile (also compiles ga via y_shape above)
    enc, dec, x_hat = frame(x, y_cur, y_cond)
    jax.block_until_ready(x_hat)

    n_bytes = sum(len(s) for group in enc["strings"] for s in group)
    bpp = n_bytes * 8 / (h * w)

    # timed section includes the analysis transform (ga) to represent the
    # full per-frame pipeline
    iters = max(20 // batch, 5)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = ga(x)  # analysis cost of the real pipeline
        _, dec, x_hat = frame(x, y_cur, y_cond)
    jax.block_until_ready(x_hat)
    elapsed = time.perf_counter() - t0
    return {"fps": batch * iters / elapsed, "bpp": bpp / batch}


def main():
    stem_tpu.set_entropy_coder("rans_interleaved")

    # remote-compile latency can be minutes per batch config; stay within a
    # wall-clock budget (STEM_BENCH_BUDGET_S) by skipping larger batches when
    # the first config already consumed most of it
    import os

    budget = float(os.environ.get("STEM_BENCH_BUDGET_S", 2700))
    t_start = time.perf_counter()
    results = {}
    for b in (1, 4):
        if results and (time.perf_counter() - t_start) > budget / 2:
            break
        results[b] = run_pipeline(b)
    best_b = max(results, key=lambda b: results[b]["fps"])
    fps = results[best_b]["fps"]

    print(
        json.dumps(
            {
                "metric": "stem_1080p_p_frame_encode_decode",
                "value": round(fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / TARGET_FPS, 3),
                "detail": {
                    "pipeline": "g_a + STEM(without_spm) fused compress+decompress + g_s",
                    "bpp": round(results[best_b]["bpp"], 4),
                    "per_batch_fps": {
                        str(b): round(r["fps"], 3) for b, r in results.items()
                    },
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
