"""Measure this device's ACHIEVABLE peaks: HBM stream bandwidth and MXU
matmul throughput (scan-folded so XLA cannot DCE or constant-fold — the
naive probe measured 36 PFLOP/s, i.e. nothing).

The roofline/layer-probe verdicts depend on these: spec peaks (819 GB/s,
197 TF/s bf16 for v5e) mean nothing if the shared tunnel chip sustains
less.

Usage: python tools/device_peaks.py [--out artifacts/device_peaks.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(jfn, x0, iters, reps=3):
    import jax

    out = jfn(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(x0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/device_peaks.json")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    rows = {}

    # --- HBM stream. Affine bodies (c*a + b) compose across iterations and
    # XLA collapses them to one pass (first cut read 600 TB/s); even a
    # mean-coupled scale simplifies (mean(c*s) = s*mean(c)). A sqrt chain
    # with per-iteration constants is not algebraically composable, and its
    # VPU cost (~3 elementwise ops) stays far under the byte cost. Traffic
    # per iter = read + write = 2 passes.
    for dname, dtype, n in (("f32", jnp.float32, 256 * 1024 * 1024),
                            ("bf16", jnp.bfloat16, 512 * 1024 * 1024)):
        x0 = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (n,), dtype))
        eps = jax.random.uniform(jax.random.PRNGKey(1), (args.iters,),
                                 jnp.float32, 1e-6, 2e-6)

        def scan_fn(x):
            def body(c, e):
                c = jnp.sqrt(c * c + e).astype(dtype)
                return c, ()

            c, _ = jax.lax.scan(body, x, eps, length=args.iters)
            return c

        s = _time(jax.jit(scan_fn), x0, args.iters)
        nbytes = n * x0.dtype.itemsize
        gbs = 2 * nbytes / s / 1e9
        rows[f"stream_{dname}"] = {
            "gb_array": round(nbytes / 1e9, 2), "ms": round(1e3 * s, 3),
            "achieved_gbs_2pass": round(gbs, 1)}
        print(f"stream {dname}: {1e3*s:.3f} ms/iter -> {gbs:.0f} GB/s "
              f"(2-pass accounting)", flush=True)

    # --- MXU matmul: (m,k)@(k,n), scan-folded on the lhs carry.
    for dname, dtype, m in (("bf16", jnp.bfloat16, 8192),
                            ("f32", jnp.float32, 4096)):
        k = n = m
        a0 = jax.random.normal(jax.random.PRNGKey(0), (m, k), dtype)
        b0 = jax.random.normal(jax.random.PRNGKey(1), (k, n), dtype)

        def scan_fn(a):
            def body(c, _):
                y = c @ b0
                # renormalize so values stay finite; keeps the matmul live
                c = y * jnp.asarray(1.0 / n, dtype)
                return c, ()

            c, _ = jax.lax.scan(body, a, None, length=args.iters)
            return c

        s = _time(jax.jit(scan_fn), a0, args.iters)
        tf = 2 * m * k * n / s / 1e12
        rows[f"matmul_{dname}_{m}"] = {"ms": round(1e3 * s, 3),
                                       "achieved_tflops": round(tf, 1)}
        print(f"matmul {dname} {m}^3: {1e3*s:.3f} ms/iter -> {tf:.1f} TF/s",
              flush=True)

    # --- MXU at the GDN shape: (HW, C)@(C, C), C=192 — how much the small
    # contraction dim costs vs the square peak.
    for hw, c in ((544 * 960, 192),):
        a0 = jax.random.normal(jax.random.PRNGKey(0), (hw, c), jnp.float32)
        b0 = jax.random.normal(jax.random.PRNGKey(1), (c, c), jnp.float32)

        def scan_fn(a):
            def body(cr, _):
                y = cr @ b0
                return y * jnp.asarray(1.0 / c, jnp.float32), ()

            cr, _ = jax.lax.scan(body, a, None, length=args.iters)
            return cr

        s = _time(jax.jit(scan_fn), a0, args.iters)
        tf = 2 * hw * c * c / s / 1e12
        gbs = (a0.nbytes * 2) / s / 1e9
        rows[f"matmul_f32_{hw}x{c}"] = {
            "ms": round(1e3 * s, 3), "achieved_tflops": round(tf, 1),
            "achieved_gbs": round(gbs, 1)}
        print(f"matmul f32 ({hw},{c})@({c},{c}): {1e3*s:.3f} ms/iter -> "
              f"{tf:.1f} TF/s, {gbs:.0f} GB/s", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "probes": rows}, f,
                  indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
