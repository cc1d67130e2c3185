"""A/B the manual-DMA input path (_GDN_CONV_DMA) on the g_a fused stages.

Round-4 conclusion (BENCH_NOTES, artifacts/gdn_th_sweep.json): stage1 is
capped at TH=2 by the Element-window's 2x double-buffered VMEM term —
136 grid steps/frame at ~20 us/step is the ~2.65 ms baseline.  The DMA
path keeps x in HBM and feeds the window by chunked async copies, so
TH=4 (stage1) / TH=8 (stage2) fit and the step count halves/quarters.

Writes artifacts/gdn_dma_ab.json; the production default (auto) follows
the measured winner per-shape (strictly-larger-TH rule).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.roofline import measure  # noqa: E402


def main():
    import jax.numpy as jnp
    import numpy as np

    from spatiotemporalentropymodel_tpu.ops import pallas_kernels as pk

    b, C = 4, 192
    # fresh entropy per run: the tunnel memoizes identical (executable,
    # input) dispatches, and a repeated fixed-seed run can return cache
    # hits as ~0 ms timings (seen on the round-5 align probe)
    seed = np.random.SeedSequence().entropy % (2 ** 31)
    rng = np.random.default_rng(seed)
    rows = {"seed": int(seed)}
    for name, (H, W) in (("stage1@544x960", (544, 960)),
                         ("stage2@272x480", (272, 480)),
                         ("stage3@136x240", (136, 240))):
        x = jnp.asarray(rng.normal(0, 0.5, (b, H, W, C)), jnp.bfloat16)
        gt = jnp.asarray(rng.uniform(0.01, 0.1, (C, C)), jnp.float32)
        beta = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.05, (5, 5, C, C)), jnp.float32)
        bias = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
        ref = np.asarray(pk._gdn_conv_ref(x, gt, beta, k, bias), np.float32)
        scale = max(1.0, float(np.abs(ref).max()))
        el_th = pk._gdn_conv_th(x)
        dma_th = pk._gdn_conv_dma_th(x, C)
        for mode in ("0", "1"):
            pk._GDN_CONV_DMA = mode
            th = el_th if mode == "0" else dma_th
            if th is None:
                continue
            y = np.asarray(pk.gdn_conv_fused(x, gt, beta, k, bias),
                           np.float32)
            err = float(np.abs(y - ref).max()) / scale
            assert err < 0.15, (name, mode, err)
            r = measure(f"{name} dma={mode}",
                        lambda v: pk.gdn_conv_fused(v, gt, beta, k, bias),
                        x, 8)
            key = f"{name} dma={mode}"
            rows[key] = {"per_frame_ms": round(r["ms"] / b, 3),
                         "th": th, "rel_err": round(err, 5)}
            print(key, rows[key], flush=True)
    pk._GDN_CONV_DMA = "auto"
    with open("artifacts/gdn_dma_ab.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote artifacts/gdn_dma_ab.json", flush=True)


if __name__ == "__main__":
    main()
