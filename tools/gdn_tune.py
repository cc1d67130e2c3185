"""A/B the fused-GDN Pallas kernel: tile sizes vs the plain-XLA lowering,
plus the low-cout deconv sub-pixel question, at the real 1080p serving
shapes. Informs ops/pallas_kernels._TILE_ROWS and the selective FAST_DECONV
policy (layer_probe.json shows GDN+iGDN ≈ 13 ms/frame and gs.deconv3 ≈
6.6 ms/frame of the 30 ms device budget).

Usage: python tools/gdn_tune.py [--batch 4] [--iters 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.roofline import measure  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="artifacts/gdn_tune.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from spatiotemporalentropymodel_tpu.ops import pallas_kernels as pk

    b, C = args.batch, 192
    H, W = 544, 960
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (b, H, W, C), jnp.float32) * 0.1
    gamma_t = jnp.abs(jax.random.normal(rng, (C, C), jnp.float32)) * 0.01
    beta = jnp.ones((C,), jnp.float32)

    rows = []

    # XLA reference lowering (x2 @ gamma in one matmul, epilogue separate)
    def ref_fn(v):
        return pk._gdn_ref(v.reshape(-1, C), gamma_t, beta, False).reshape(
            v.shape)

    rows.append(measure("gdn_xla_ref", ref_fn, x0, args.iters))

    for tile in (256, 512, 1024, 2048):
        old = pk._TILE_ROWS
        try:
            pk._TILE_ROWS = tile

            def pl_fn(v):
                return pk._gdn_pallas(
                    v.reshape(-1, C), gamma_t, beta, False).reshape(v.shape)

            row = measure(f"gdn_pallas_tile{tile}", pl_fn, x0, args.iters)
        finally:
            pk._TILE_ROWS = old
        rows.append(row)

    # bf16 I/O variant (kernel computes f32 internally either way): if GDN
    # is BW-bound, halving the block I/O should halve the time
    x0h = x0.astype(jnp.bfloat16)

    def pl_bf16(v):
        return pk._gdn_pallas(v.reshape(-1, C), gamma_t, beta, False).reshape(
            v.shape)

    rows.append(measure("gdn_pallas_bf16io_tile256", pl_bf16, x0h,
                        args.iters))

    # --- diagnostic kernel variants at tile 1024: which factor carries the
    # 17.7 ms (vs the 6 ms streaming floor)? The inner dot's precision, the
    # rsqrt, or the N=192 lane padding.
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE = 1024
    r = b * 544 * 960
    x2d = x0.reshape(r, C)
    gamma_pad = jnp.zeros((C, 256), jnp.float32).at[:, :C].set(gamma_t)
    gamma_bf = gamma_t.astype(jnp.bfloat16)

    def run_variant(name, kernel, operands, out_c=C):
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r, out_c), jnp.float32),
            grid=(pl.cdiv(r, TILE),),
            in_specs=[pl.BlockSpec((TILE, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(op.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for op in operands],
            out_specs=pl.BlockSpec((TILE, out_c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        rows.append(measure(name, lambda v: f(v, *operands), x2d,
                            args.iters))

    def k_no_rsqrt(x_ref, g_ref, b_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = x * (jnp.dot(x * x, g_ref[:],
                                preferred_element_type=jnp.float32)
                        + b_ref[:])

    run_variant("gdn_no_rsqrt", k_no_rsqrt, (gamma_t, beta[None, :]))

    def k_no_dot(x_ref, b_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = x * jax.lax.rsqrt(x * x + b_ref[:])

    run_variant("gdn_no_dot", k_no_dot, (beta[None, :],))

    def k_bf16dot(x_ref, g_ref, b_ref, o_ref):
        x = x_ref[:]
        n = jnp.dot((x * x).astype(jnp.bfloat16), g_ref[:],
                    preferred_element_type=jnp.float32)
        o_ref[:] = x * jax.lax.rsqrt(n + b_ref[:])

    run_variant("gdn_bf16dot", k_bf16dot, (gamma_bf, beta[None, :]))

    def k_pad256(x_ref, g_ref, b_ref, o_ref):
        x = x_ref[:]
        n = jnp.dot(x * x, g_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = jnp.pad(x, ((0, 0), (0, 64))) * jax.lax.rsqrt(
            n + b_ref[:])

    run_variant("gdn_pad256", k_pad256,
                (gamma_pad, jnp.ones((1, 256), jnp.float32)), out_c=256)

    # --- deconv3 (192->3 @544x960): lhs_dilation vs sub-pixel, layer-only
    import importlib

    convmod = importlib.import_module(
        "spatiotemporalentropymodel_tpu.layers.conv")

    m = convmod.Deconv(3, 5, 2)
    params = m.init(jax.random.PRNGKey(1), x0)
    for fast in (False, True):
        old = convmod.FAST_DECONV
        try:
            convmod.FAST_DECONV = fast
            row = measure(f"deconv3_fast{fast}",
                          lambda v: m.apply(params, v), x0, args.iters)
        finally:
            convmod.FAST_DECONV = old
        rows.append(row)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "batch": b,
                   "rows": rows}, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__" and "--round2" not in sys.argv:
    main()
    sys.exit(0)


def round2():
    """Layout experiments: is the (TILE, 192) block DMA the whole cost?

    192 f32 lanes = 1.5 native (8,128) tiles (padded to 2); the same buffer
    viewed as (r/2, 384) is exactly 3 lane tiles. Also: the sub-pixel
    deconv3 without the device-side pixel shuffle (ship (544,960,12); the
    shuffle is a free strided view host-side during fetch)."""
    import argparse
    import functools
    import json
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="artifacts/gdn_tune2.json")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--round2", action="store_true")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, C = args.batch, 192
    H, W = 544, 960
    r = b * H * W
    rng = jax.random.PRNGKey(0)
    x2d = jax.random.normal(rng, (r, C), jnp.float32) * 0.1
    xwide = jax.random.normal(rng, (r // 2, 2 * C), jnp.float32) * 0.1
    gamma_t = jnp.abs(jax.random.normal(rng, (C, C), jnp.float32)) * 0.01
    beta = jnp.ones((C,), jnp.float32)
    rows = []
    TILE = 1024

    def blockspec(c):
        return pl.BlockSpec((TILE, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    # 1. pure copy at (TILE, 192)
    def k_copy(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    f1 = pl.pallas_call(k_copy, out_shape=jax.ShapeDtypeStruct((r, C),
                                                               jnp.float32),
                        grid=(pl.cdiv(r, TILE),), in_specs=[blockspec(C)],
                        out_specs=blockspec(C))
    rows.append(measure("copy_192", f1, x2d, args.iters))

    # 2. pure copy at (TILE, 384)
    f2 = pl.pallas_call(k_copy,
                        out_shape=jax.ShapeDtypeStruct((r // 2, 2 * C),
                                                       jnp.float32),
                        grid=(pl.cdiv(r // 2, TILE),),
                        in_specs=[blockspec(2 * C)],
                        out_specs=blockspec(2 * C))
    rows.append(measure("copy_384", f2, xwide, args.iters))

    # 3. GDN with 384-wide I/O, in-kernel split to two 192 halves for the dot
    def k_gdn384(x_ref, g_ref, b_ref, o_ref):
        x = x_ref[:]
        for sl in (slice(0, C), slice(C, 2 * C)):
            xs = x[:, sl]
            n = jnp.dot(xs * xs, g_ref[:],
                        preferred_element_type=jnp.float32)
            o_ref[:, sl] = xs * jax.lax.rsqrt(n + b_ref[:])

    f3 = pl.pallas_call(
        k_gdn384,
        out_shape=jax.ShapeDtypeStruct((r // 2, 2 * C), jnp.float32),
        grid=(pl.cdiv(r // 2, TILE),),
        in_specs=[blockspec(2 * C),
                  pl.BlockSpec((C, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=blockspec(2 * C))
    rows.append(measure("gdn_384io", lambda v: f3(v, gamma_t, beta[None, :]),
                        xwide, args.iters))

    # 4. XLA elementwise at (r, 192) — does XLA pay the same layout tax?
    rows.append(measure("xla_elemwise_192",
                        lambda v: v * jax.lax.rsqrt(v * v + 0.1), x2d,
                        args.iters))

    # 5. sub-pixel deconv3 WITHOUT the pixel shuffle: conv 192->12 stride 1
    import importlib

    convmod = importlib.import_module(
        "spatiotemporalentropymodel_tpu.layers.conv")
    x4d = x2d.reshape(b, H, W, C)
    kernel = jax.random.normal(rng, (5, 5, C, 3), jnp.float32) * 0.05
    sub, R, pl_, ph = convmod._subpixel_kernel(kernel, 5, 2)

    def deconv_nosh(v):
        return jax.lax.conv_general_dilated(
            v, sub, window_strides=(1, 1), padding=((pl_, ph), (pl_, ph)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    rows.append(measure("deconv3_subpixel_noshuffle", deconv_nosh, x4d,
                        args.iters))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"rows": rows}, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__" and "--round2" in sys.argv:
    round2()
    sys.exit(0)
