"""Microbench: fused GDN→k5s2-conv Pallas kernel vs the XLA composition.

Shapes are the g_a trunk stages at 1080p (the device-only hot path). The
fused kernel targets the MXU rate the conv probes showed XLA leaving on the
table (artifacts/conv_s2d.json: ~47 TF/s bf16 across every XLA lowering).

Usage: python tools/gdn_conv_tune.py [--batch 4] [--th 0] \
           [--out artifacts/gdn_conv_tune.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.roofline import measure, _conv_flops  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--th", type=int, default=0)
    ap.add_argument("--deconv", action="store_true",
                    help="bench igdn_deconv_wide (g_s stages) instead")
    ap.add_argument("--out", default="artifacts/gdn_conv_tune.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from spatiotemporalentropymodel_tpu.ops import pallas_kernels as pk

    if args.th:
        pk._GDN_CONV_TH = args.th

    b = args.batch
    C = 192
    rng = np.random.default_rng(0)
    rows = []
    shapes = [
        ("stage1 @544x960", (544, 960)),
        ("stage2 @272x480", (272, 480)),
        ("stage3 @136x240", (136, 240)),
    ]
    if args.deconv:
        shapes = [("dstage2 in272x480", (272, 480)),
                  ("dstage1 in136x240", (136, 240))]
    for name, (H, W) in shapes:
        x = jnp.asarray(rng.normal(0, 0.5, (b, H, W, C)), jnp.bfloat16)
        gt = jnp.asarray(rng.uniform(0.01, 0.1, (C, C)), jnp.float32)
        beta = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.05, (5, 5, C, C)), jnp.float32)
        bias = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
        # conv flops only (the GDN matmul adds ~16% at 2C block-diag)
        fl = _conv_flops(H // 2, W // 2, C, C, 5) * b

        if args.deconv:
            def fused(v):
                return pk.igdn_deconv_wide(v, gt, beta, k, bias)

            def unfused(v):
                return pk._igdn_deconv_ref(v, gt, beta, k, bias, 2)
        else:
            def fused(v):
                return pk.gdn_conv_fused(v, gt, beta, k, bias)

            def unfused(v):
                y = pk.gdn_fused(v, gt, beta, False)
                out = jax.lax.conv_general_dilated(
                    y, k.astype(y.dtype), (2, 2), ((2, 2), (2, 2)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return out + bias.astype(out.dtype)

        ya = np.asarray(fused(x), np.float32)
        yb = np.asarray(unfused(x), np.float32)
        scale = max(1.0, float(np.abs(yb).max()))
        err = float(np.abs(ya - yb).max()) / scale
        print(f"{name} rel err {err:.4f} (bf16 window rounding)", flush=True)
        assert err < 0.15, err

        if args.deconv:
            applicable = pk.igdn_deconv_wide_applicable(x, C, 5, 2)
            th = pk._wide_th(x, 4 * C)
        else:
            applicable = pk.gdn_conv_applicable(x, C, 5, 2)
            th = pk._GDN_CONV_TH or pk._gdn_conv_th(x)
        for vname, vfn in (("fused", fused), ("unfused", unfused)):
            r = measure(f"{name} {vname}", vfn, x, args.iters)
            r["achieved_tflops_analytic"] = round(
                fl / (r["ms"] * 1e-3) / 1e12, 2)
            r["per_frame_ms"] = round(r["ms"] / b, 3)
            r["th"] = th if vname == "fused" else None
            r["applicable"] = applicable
            print(f"  ^ {r['name']} {r['per_frame_ms']} ms/frame, "
                  f"{r['achieved_tflops_analytic']} TF/s", flush=True)
            rows.append(r)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "batch": b,
                   "layers": rows}, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
