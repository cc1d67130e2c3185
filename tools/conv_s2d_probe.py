"""A/B probe: k5 stride-2 conv vs space-to-depth + k3 stride-1 equivalent.

The encoder stack (g_a, reference compressai/models/utils.py:112-121 geometry)
is 4× k5s2 convs. A k5s2 conv is EXACTLY a k3s1 conv on the 2×2
space-to-depth rearrangement of its input:

  out(i,j,o) = Σ_{u,v<5} w[u,v,c,o] · x[2i+u−2, 2j+v−2, c]
  with u = 2m + a + 2 (block offset m = −1,0,1; phase a = 0,1):
  K3[m+1, n+1, (a·2+b)·C + c, o] = w[2m+a+2, 2n+b+2, c, o]   (zero elsewhere)

36·C·C' MAC slots vs 25·C·C' (44% zero-padded taps) but a dense stride-1
contraction with 4C input channels — the question is whether the MXU
utilization win beats the extra zeros at the g_a shapes, esp. in bf16.

Usage: python tools/conv_s2d_probe.py [--batch 4] [--out artifacts/conv_s2d.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.roofline import measure, _conv_flops  # noqa: E402


def s2d_kernel(np, w):
    """(5, 5, C, O) k5s2 kernel → (3, 3, 4C, O) s2d-equivalent kernel."""
    k, _, c, o = w.shape
    assert k == 5
    K3 = np.zeros((3, 3, 4 * c, o), w.dtype)
    for m in (-1, 0, 1):
        for a in (0, 1):
            u = 2 * m + a + 2
            if not (0 <= u < k):
                continue
            for n in (-1, 0, 1):
                for b in (0, 1):
                    v = 2 * n + b + 2
                    if not (0 <= v < k):
                        continue
                    ch = (a * 2 + b) * c
                    K3[m + 1, n + 1, ch:ch + c, :] = w[u, v]
    return K3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="artifacts/conv_s2d.json")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes: correctness-only smoke on CPU")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    b = args.batch
    C = 192
    shapes = [
        ("conv1 192->192 @544x960", (544, 960, C)),
        ("conv2 192->192 @272x480", (272, 480, C)),
        ("conv0 3->192 @1088x1920", (1088, 1920, 3)),
    ]
    if args.small:
        C = 8
        shapes = [("conv_small 8->8 @32x48", (32, 48, C))]
    rows = []
    for name, (H, W, cin) in shapes:
        for dt in (jnp.bfloat16, jnp.float32):
            tag = "bf16" if dt == jnp.bfloat16 else "f32"
            w = (np.random.default_rng(0)
                 .normal(0, 0.05, (5, 5, cin, C)).astype(np.float32))
            x0 = jax.random.normal(
                jax.random.PRNGKey(1), (b, H, W, cin), jnp.float32) * 0.1
            x0 = x0.astype(dt)
            wj = jnp.asarray(w, dt)
            k3 = jnp.asarray(s2d_kernel(np, w), dt)
            fl = _conv_flops(H // 2, W // 2, cin, C, 5) * b

            def direct(v):
                return jax.lax.conv_general_dilated(
                    v, wj, (2, 2), ((2, 2), (2, 2)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            def s2d(v):
                B, h, wd, c = v.shape
                v = v.reshape(B, h // 2, 2, wd // 2, 2, c)
                v = v.transpose(0, 1, 3, 2, 4, 5).reshape(
                    B, h // 2, wd // 2, 4 * c)
                return jax.lax.conv_general_dilated(
                    v, k3, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            def direct_hi(v):
                return jax.lax.conv_general_dilated(
                    v, wj, (2, 2), ((2, 2), (2, 2)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=jax.lax.Precision.HIGHEST)

            def direct_lo(v):
                return jax.lax.conv_general_dilated(
                    v, wj, (2, 2), ((2, 2), (2, 2)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=jax.lax.Precision.DEFAULT)

            def tapdot(v):
                # shift-and-matmul: pad the s2d input once, then one
                # (B·h·w, 4C)×(4C, O) dot per 3×3 tap, accumulated — XLA
                # sees plain dot_generals and can run them at matmul rate
                B, h, wd, c = v.shape
                v = v.reshape(B, h // 2, 2, wd // 2, 2, c)
                v = v.transpose(0, 1, 3, 2, 4, 5).reshape(
                    B, h // 2, wd // 2, 4 * c)
                vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
                hh, ww = h // 2, wd // 2
                acc = None
                for mu in range(3):
                    for nu in range(3):
                        sl = jax.lax.dynamic_slice(
                            vp, (0, mu, nu, 0), (B, hh, ww, 4 * c))
                        t = jnp.einsum(
                            "bhwc,co->bhwo", sl, k3[mu, nu],
                            preferred_element_type=jnp.float32)
                        acc = t if acc is None else acc + t
                return acc.astype(dt)

            ya = np.asarray(direct(x0), np.float32)
            for f2 in (s2d, tapdot):
                yb = np.asarray(f2(x0), np.float32)
                err = float(np.abs(ya - yb).max())
                assert err < (2e-1 if dt == jnp.bfloat16 else 1e-3), (
                    f2.__name__, err)

            variants = [("direct", direct), ("s2d", s2d),
                        ("tapdot", tapdot), ("direct_hi", direct_hi),
                        ("direct_lo", direct_lo)]
            for vname, vfn in variants:
                r = measure(f"{name} {vname}[{tag}]", vfn, x0, args.iters)
                r["achieved_tflops_analytic"] = round(
                    fl / (r["ms"] * 1e-3) / 1e12, 2)
                r["per_frame_ms"] = round(r["ms"] / b, 3)
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
