"""Stripe-height (grid-step count) sweep for the fused GDN→conv g_a stages.

Tests the per-grid-step-overhead hypothesis from the round-4 input-path
A/Bs (BENCH_NOTES "Round-4 g_a input-path A/Bs"): stage1's ~2.65 ms/frame
baseline is neither DMA (halo A/B null) nor fill nor dots. If it is
per-step fixed cost, halving TH (doubling steps) should add ~2.65 ms and
doubling TH (where VMEM admits it) should remove ~1.3.

stage1 (544×960, ws=480) compiles at th≤2 (th=4 OOMs the 16 MB VMEM
limit); stage2 (272×480, ws=240) admits th=4, so the th=1/2/4 ladder
there calibrates the per-step cost directly.
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
    rng = np.random.default_rng(0)
    rows = {}
    for name, (H, W), ths in (("stage1@544x960", (544, 960), (1, 2)),
                              ("stage2@272x480", (272, 480), (1, 2, 4))):
        x = jnp.asarray(rng.normal(0, 0.5, (b, H, W, C)), jnp.bfloat16)
        gt = jnp.asarray(rng.uniform(0.01, 0.1, (C, C)), jnp.float32)
        beta = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.05, (5, 5, C, C)), jnp.float32)
        bias = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
        ref = np.asarray(pk._gdn_conv_ref(x, gt, beta, k, bias), np.float32)
        scale = max(1.0, float(np.abs(ref).max()))
        for th in ths:
            pk._GDN_CONV_TH = th
            try:
                y = np.asarray(pk.gdn_conv_fused(x, gt, beta, k, bias),
                               np.float32)
            except Exception as e:  # noqa: BLE001 - OOM rows are data
                rows[f"{name} th={th}"] = {"error": type(e).__name__}
                print(name, th, "FAILED", type(e).__name__, flush=True)
                continue
            err = float(np.abs(y - ref).max()) / scale
            assert err < 0.15, (name, th, err)
            r = measure(f"{name} th={th}",
                        lambda v: pk.gdn_conv_fused(v, gt, beta, k, bias),
                        x, 8)
            steps = b * (H // 2) // th
            rows[f"{name} th={th}"] = {
                "per_frame_ms": round(r["ms"] / b, 3),
                "grid_steps": steps,
                "rel_err": round(err, 5),
            }
            print(f"{name} th={th}", rows[f"{name} th={th}"], flush=True)
        pk._GDN_CONV_TH = 0
    with open("artifacts/gdn_th_sweep.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote artifacts/gdn_th_sweep.json", flush=True)


if __name__ == "__main__":
    main()
