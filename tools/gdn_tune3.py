"""Round-3 GDN bandwidth hunt: the serving-path bf16 GDN runs ~9.4 ms at
the b=4 1080p shape (544x960x192) against a ~3 ms stream floor
(device_peaks: 531 GB/s 2-pass). gdn_tune2 showed the (T,384) lane fold
buys 1.3x at f32 (192 lanes = 1.5 native tiles, padded to 2); this round
combines the fold with bf16 I/O, single unsliced writes, wider folds, and
measures XLA's own shape tax on (r,192) vs flat streams.

Usage: python tools/gdn_tune3.py [--batch 4] [--iters 8]
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
    ap.add_argument("--out", default="artifacts/gdn_tune3.json")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode numerics check (CPU)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, C = args.batch, 192
    H, W = (16, 32) if args.interpret else (544, 960)
    r = b * H * W  # 2,088,960 pixel rows
    rng = jax.random.PRNGKey(0)
    x2d = jax.random.normal(rng, (r, C), jnp.float32) * 0.1
    gamma_t = jnp.abs(jax.random.normal(rng, (C, C), jnp.float32)) * 0.01
    beta = jnp.ones((C,), jnp.float32)
    rows = []

    # --- XLA shape tax: the flat stream hits 531 GB/s; does the same sqrt
    # chain on the GDN-shaped array pay a layout penalty?
    from spatiotemporalentropymodel_tpu.ops import pallas_kernels as pk

    def sqrt_chain(v):
        return jnp.sqrt(v * v + 1e-6)

    if not args.interpret:
        rows.append(measure("xla_sqrt_flat", sqrt_chain,
                            x2d.reshape(-1), args.iters))
        rows.append(measure("xla_sqrt_r192", sqrt_chain, x2d, args.iters))
        rows.append(measure("xla_sqrt_r384", sqrt_chain,
                            x2d.reshape(r // 2, 2 * C), args.iters))
        rows.append(measure("xla_sqrt_r192_bf16", sqrt_chain,
                            x2d.astype(jnp.bfloat16), args.iters))

    # --- GDN variants. All compute f32 math; I/O dtype + block shape vary.
    def gdn_fold_kernel(x_ref, g_ref, b_ref, o_ref, *, fold):
        x = x_ref[:].astype(jnp.float32)
        outs = []
        for f in range(fold):
            xs = x[:, f * C:(f + 1) * C]
            n = jnp.dot(xs * xs, g_ref[:],
                        preferred_element_type=jnp.float32)
            outs.append(xs * jax.lax.rsqrt(n + b_ref[:]))
        o_ref[:] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)

    def run_gdn(name, fold, tile, dtype):
        xs = x2d.reshape(r // fold, fold * C).astype(dtype)
        f = pl.pallas_call(
            functools.partial(gdn_fold_kernel, fold=fold),
            out_shape=jax.ShapeDtypeStruct(xs.shape, dtype),
            grid=(pl.cdiv(xs.shape[0], tile),),
            in_specs=[
                pl.BlockSpec((tile, fold * C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, fold * C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=args.interpret,
        )
        if args.interpret:  # numerics vs the reference math, then skip timing
            got = f(xs, gamma_t, beta[None, :])
            want = pk._gdn_ref(x2d.astype(jnp.float32), gamma_t, beta, False)
            err = float(jnp.max(jnp.abs(
                got.reshape(r, C).astype(jnp.float32) - want)))
            print(f"{name}: max err {err:.2e}")
            assert err < (1e-5 if dtype == jnp.float32 else 1e-2), name
            return
        rows.append(measure(
            name, lambda v: f(v, gamma_t, beta[None, :]), xs, args.iters))

    # fold=2 (384 lanes = 3 tiles exact), single concat write
    run_gdn("gdn384_f32_t1024", 2, 1024, jnp.float32)
    run_gdn("gdn384_bf16_t1024", 2, 1024, jnp.bfloat16)
    run_gdn("gdn384_bf16_t2048", 2, 2048, jnp.bfloat16)
    # fold=8 (1536 lanes = 12 tiles): fewer/fatter grid rows
    run_gdn("gdn1536_bf16_t512", 8, 512, jnp.bfloat16)
    run_gdn("gdn1536_f32_t256", 8, 256, jnp.float32)

    if args.interpret:
        print("interpret-mode numerics OK")
        return

    # current production kernel for reference (dtype-preserving, 192 lanes)
    for dname, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        rows.append(measure(
            f"gdn_current_{dname}",
            lambda v: pk._gdn_pallas(v, gamma_t, beta, False),
            x2d.astype(dt), args.iters))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "batch": b,
                   "rows": rows}, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
