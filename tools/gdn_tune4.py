"""Round-3b GDN: can manual double-buffered DMA beat the auto-pipelined
grid? gdn_tune3 landed the lane-aligned fold at 7.6 ms bf16 (211 GB/s
true two-way) against device_peaks' 531 GB/s stream — this probes whether
explicit in/out DMA overlap with deeper buffering closes the rest.

Usage: python tools/gdn_tune4.py [--iters 8]
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
    ap.add_argument("--out", default="artifacts/gdn_tune4.json")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from spatiotemporalentropymodel_tpu.ops import pallas_kernels as pk

    C = 192
    H, W = (16, 32) if args.interpret else (544, 960)
    r = args.batch * H * W
    FOLD = 2
    rw, cw = r // FOLD, FOLD * C
    rng = jax.random.PRNGKey(0)
    x2d = jax.random.normal(rng, (r, C), jnp.float32) * 0.1
    gamma_t = jnp.abs(jax.random.normal(rng, (C, C), jnp.float32)) * 0.01
    beta = jnp.ones((C,), jnp.float32)
    rows = []

    def gdn_math(x, g, bta, out_dtype):
        xf = x.astype(jnp.float32)
        outs = []
        for f in range(FOLD):
            xs = xf[:, f * C:(f + 1) * C]
            n = jnp.dot(xs * xs, g, preferred_element_type=jnp.float32)
            outs.append(xs * jax.lax.rsqrt(n + bta))
        return jnp.concatenate(outs, axis=1).astype(out_dtype)

    # --- manual double-buffered kernel: x stays in HBM; chunks of T rows
    # DMA'd in/out explicitly with NB slots each way.
    def manual_kernel(x_hbm, g_ref, b_ref, o_hbm, *, T, NB, nchunks):
        def body(in_scr, out_scr, in_sem, out_sem):
            def in_dma(slot, ci):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(ci * T, T), :], in_scr.at[slot],
                    in_sem.at[slot])

            def out_dma(slot, ci):
                return pltpu.make_async_copy(
                    out_scr.at[slot], o_hbm.at[pl.ds(ci * T, T), :],
                    out_sem.at[slot])

            for w in range(min(NB, nchunks)):
                in_dma(w, w).start()

            def loop(ci, _):
                slot = ci % NB

                in_dma(slot, ci).wait()
                y = gdn_math(in_scr[slot], g_ref[:], b_ref[:],
                             out_scr.dtype)

                @pl.when(ci >= NB)
                def _():  # slot's previous out DMA must have drained
                    out_dma(slot, ci - NB).wait()

                out_scr[slot] = y
                out_dma(slot, ci).start()

                @pl.when(ci + NB < nchunks)
                def _():
                    in_dma((ci + NB) % NB, ci + NB).start()

                return ()

            jax.lax.fori_loop(0, nchunks, loop, (), unroll=False)
            for w in range(min(NB, nchunks)):  # drain the tail
                ci = nchunks - min(NB, nchunks) + w
                out_dma(ci % NB, ci).wait()

        pl.run_scoped(
            body,
            in_scr=pltpu.VMEM((NB, T, cw), x_hbm.dtype),
            out_scr=pltpu.VMEM((NB, T, cw), o_hbm.dtype),
            in_sem=pltpu.SemaphoreType.DMA((NB,)),
            out_sem=pltpu.SemaphoreType.DMA((NB,)),
        )

    def run_manual(name, dtype, T, NB):
        xs = x2d.reshape(rw, cw).astype(dtype)
        if rw % T:
            print(f"{name}: skip (rw {rw} % T {T})")
            return
        nchunks = rw // T
        f = pl.pallas_call(
            functools.partial(manual_kernel, T=T, NB=NB, nchunks=nchunks),
            out_shape=jax.ShapeDtypeStruct((rw, cw), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            interpret=args.interpret,
        )
        fn = lambda v: f(v, gamma_t, beta[None, :])  # noqa: E731
        if args.interpret:
            got = fn(xs).reshape(r, C).astype(jnp.float32)
            want = pk._gdn_ref(x2d, gamma_t, beta, False)
            err = float(jnp.max(jnp.abs(got - want)))
            print(f"{name}: max err {err:.2e}")
            assert err < (1e-5 if dtype == jnp.float32 else 1e-2), name
            return
        rows.append(measure(name, fn, xs, args.iters))

    run_manual("gdn_manual_bf16_T2048_NB2", jnp.bfloat16, 2048, 2)
    run_manual("gdn_manual_bf16_T1024_NB4", jnp.bfloat16, 1024, 4)
    run_manual("gdn_manual_bf16_T512_NB4", jnp.bfloat16, 512, 4)
    run_manual("gdn_manual_f32_T1024_NB4", jnp.float32, 1024, 4)
    if args.interpret:
        print("interpret-mode numerics OK")
        return

    # --- fold kernel + input_output aliasing (write back in place)
    def fold_kernel(x_ref, g_ref, b_ref, o_ref):
        o_ref[:] = gdn_math(x_ref[:], g_ref[:], b_ref[:], o_ref.dtype)

    for dname, dt in (("bf16", jnp.bfloat16),):
        xs = x2d.reshape(rw, cw).astype(dt)
        f = pl.pallas_call(
            fold_kernel,
            out_shape=jax.ShapeDtypeStruct((rw, cw), dt),
            grid=(pl.cdiv(rw, 1024),),
            in_specs=[
                pl.BlockSpec((1024, cw), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1024, cw), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
        )
        rows.append(measure(f"gdn_fold_alias_{dname}",
                            lambda v: f(v, gamma_t, beta[None, :]),
                            xs, args.iters))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "rows": rows}, f,
                  indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
