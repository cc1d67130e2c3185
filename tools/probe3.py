"""Round-3 de-risk probes for the device transform optimizations:

A. deconv3 sub-pixel with NCHW ("planar") output — dodges the 12->128 lane
   padding on the output write that makes the RGB deconv 19.8 ms.
B. dtype-preserving bf16 Pallas GDN (bf16 in AND out; f32 math in VMEM).
C. conv1 with bf16 I/O.

Usage: python tools/probe3.py [--batch 4] [--iters 8]
"""

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.roofline import measure  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="artifacts/probe3.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import importlib

    convmod = importlib.import_module(
        "spatiotemporalentropymodel_tpu.layers.conv")

    b, C = args.batch, 192
    H, W = 544, 960
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (b, H, W, C), jnp.float32) * 0.1
    rows = []

    # --- A: sub-pixel deconv3, NCHW out (planar RGB phases)
    kernel = jax.random.normal(rng, (5, 5, C, 3), jnp.float32) * 0.05
    sub, R, pl_, ph = convmod._subpixel_kernel(kernel, 5, 2)

    def deconv_nchw(v):
        return jax.lax.conv_general_dilated(
            v, sub, window_strides=(1, 1), padding=((pl_, ph), (pl_, ph)),
            dimension_numbers=("NHWC", "HWIO", "NCHW"))

    rows.append(measure("deconv3_subpixel_nchw_out", deconv_nchw, x0,
                        args.iters))

    # + the planar pixel shuffle: (b,12,544,960) -> (b,3,1088,1920); in
    # NCHW both source and target have lane-friendly minor dims
    def deconv_nchw_shuffled(v):
        y = deconv_nchw(v)  # (b, out*s*s = 12, H, W), o*4 + a*2 + c ordering
        B = y.shape[0]
        y = y.reshape(B, 3, 2, 2, H, W)
        y = y.transpose(0, 1, 4, 2, 5, 3)  # b, o, H, a, W, c
        return y.reshape(B, 3, 2 * H, 2 * W)

    rows.append(measure("deconv3_subpixel_nchw_shuffled",
                        deconv_nchw_shuffled, x0, args.iters))

    # --- B: dtype-preserving bf16 GDN kernel
    gamma_t = jnp.abs(jax.random.normal(rng, (C, C), jnp.float32)) * 0.01
    beta = jnp.ones((C,), jnp.float32)
    r = b * H * W
    TILE = 1024

    def k_gdn(x_ref, g_ref, b_ref, o_ref):
        x = x_ref[:].astype(jnp.float32)
        n = jnp.dot(x * x, g_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = (x * jax.lax.rsqrt(n + b_ref[:])).astype(o_ref.dtype)

    for dname, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        xd = x0.reshape(r, C).astype(dt)
        f = pl.pallas_call(
            k_gdn,
            out_shape=jax.ShapeDtypeStruct((r, C), dt),
            grid=(pl.cdiv(r, TILE),),
            in_specs=[pl.BlockSpec((TILE, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((C, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM))
        rows.append(measure(f"gdn_iopreserve_{dname}",
                            lambda v: f(v, gamma_t, beta[None, :]), xd,
                            args.iters))

    # --- C: conv1 bf16 I/O vs f32 I/O
    ck = jax.random.normal(rng, (5, 5, C, C), jnp.float32) * 0.02

    def conv1(v):
        return jax.lax.conv_general_dilated(
            v, ck.astype(v.dtype), window_strides=(2, 2),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for dname, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        rows.append(measure(f"conv1_{dname}", conv1, x0.astype(dt),
                            args.iters))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"rows": rows}, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
