"""Per-stage roofline for the 1080p STEM serving path (VERDICT r2 #4).

Measures each device stage (g_a, HE, priors=HD+TPM+EPM, quantize+index, g_s,
and the full P-frame chain) with K iterations folded into ONE jit (so the
tunnel's per-dispatch RPC cost amortizes away), and reads XLA's own cost
model for FLOPs and bytes accessed. Emits achieved TFLOP/s and GB/s next to
the chip peaks, per dtype — the evidence for whether the transform stack is
HBM-bound (and whether bf16 should help or hurt).

v5e peaks used: 197 TFLOP/s bf16 MXU, ~49 TFLOP/s f32, 819 GB/s HBM.

Usage: python tools/roofline.py [--batch 4] [--iters 8] [--out artifacts/roofline.json]
(runs on whatever platform jax defaults to — the TPU tunnel in this env;
pass --platform cpu for a wiring smoke test)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_TFLOPS = 197.0
PEAK_F32_TFLOPS = 49.0
PEAK_HBM_GBS = 819.0


def _conv_flops(h, w, cin, cout, k):
    return h * w * cin * cout * k * k * 2


def _gdn_flops(h, w, c):
    return h * w * c * c * 2  # the channel matmul dominates


def analytic_flops(batch: int) -> dict:
    """Per-stage FLOPs from the architecture itself (N=M=192 at 1080p).

    XLA's ``cost_analysis`` does NOT count convolution custom-calls inside
    the scanned program (g_a measured 165 GF for b=4 where the L2 conv
    alone is 241 GF/frame) — the round-2 "7% MFU" conclusion was an
    artifact of that undercount. Transposed convs are counted at their
    useful MACs (Hin·Win·k²·Cin·Cout), identical for either lowering."""
    ga = (_conv_flops(544, 960, 3, 192, 5) + _gdn_flops(544, 960, 192)
          + _conv_flops(272, 480, 192, 192, 5) + _gdn_flops(272, 480, 192)
          + _conv_flops(136, 240, 192, 192, 5) + _gdn_flops(136, 240, 192)
          + _conv_flops(68, 120, 192, 192, 5))
    gs = (_conv_flops(68, 120, 192, 192, 5) + _gdn_flops(136, 240, 192)
          + _conv_flops(136, 240, 192, 192, 5) + _gdn_flops(272, 480, 192)
          + _conv_flops(272, 480, 192, 192, 5) + _gdn_flops(544, 960, 192)
          + _conv_flops(544, 960, 192, 3, 5))
    return {"g_a": batch * ga, "g_s": batch * gs,
            "full_P_chain": batch * (ga + gs)}  # + entropy stages (XLA)


def _cost(compiled):
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = float(c.get("flops", 0.0))
        nbytes = float(c.get("bytes accessed", 0.0))
        return flops, nbytes
    except Exception:
        return 0.0, 0.0


def measure(name, fn, x0, iters, reps=3):
    """Time a K-iteration scan of fn in one jit; returns per-iteration ms +
    XLA cost-model numbers (per iteration)."""
    import jax
    import jax.numpy as jnp

    def scan_fn(x):
        def body(carry, _):
            y = fn(carry)
            # keep shapes fixed across iterations: fold the output back into
            # the carry so XLA cannot dead-code or hoist the stage
            flat = sum(jnp.mean(jnp.asarray(v, jnp.float32))
                       for v in jax.tree_util.tree_leaves(y))
            return (carry + (1e-20 * flat).astype(carry.dtype)), flat

        _, outs = jax.lax.scan(body, x, None, length=iters)
        return outs

    jfn = jax.jit(scan_fn)
    lowered = jfn.lower(x0)
    compiled = lowered.compile()
    flops, nbytes = _cost(compiled)
    out = jfn(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(x0)
    jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / (reps * iters)
    flops /= iters
    nbytes /= iters
    tflops = flops / (ms * 1e-3) / 1e12 if ms else 0.0
    gbs = nbytes / (ms * 1e-3) / 1e9 if ms else 0.0
    row = {
        "name": name,
        "ms": round(ms, 3),
        "gflop": round(flops / 1e9, 2),
        "gb_moved": round(nbytes / 1e9, 4),
        "achieved_tflops": round(tflops, 2),
        "achieved_gbs": round(gbs, 1),
        "pct_hbm_peak": round(100 * gbs / PEAK_HBM_GBS, 1),
        "pct_f32_peak": round(100 * tflops / PEAK_F32_TFLOPS, 1),
        "pct_bf16_peak": round(100 * tflops / PEAK_BF16_TFLOPS, 1),
    }
    # memory-bound if the HBM time bound exceeds the compute time bound
    t_mem = nbytes / (PEAK_HBM_GBS * 1e9)
    t_cmp = flops / (PEAK_F32_TFLOPS * 1e12)
    row["bound"] = "hbm" if t_mem > t_cmp else "mxu"
    row["lb_ms_hbm"] = round(1e3 * t_mem, 3)
    row["lb_ms_mxu_f32"] = round(1e3 * t_cmp, 3)
    print(f"{name:28s} {ms:8.3f} ms  {row['gflop']:8.2f} GF "
          f"{row['gb_moved']:8.4f} GB  {tflops:6.2f} TF/s  {gbs:6.1f} GB/s "
          f"({row['bound']}-bound, lb {row['lb_ms_hbm']:.2f}/"
          f"{row['lb_ms_mxu_f32']:.2f} ms)", flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="artifacts/roofline.json")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtypes", nargs="+", default=["f32", "bf16"])
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import bench

    b = args.batch
    H, W, M = bench.H, bench.W, bench.M
    x, imodel, stem, _, y_cond = bench.build(b)
    medians = jnp.asarray(stem.tables["entropy_bottleneck"].medians,
                          jnp.float32)
    table = stem.tables["gaussian_conditional"].scale_table

    rows = []
    for dname in args.dtypes:
        dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dname]
        if dtype is jnp.bfloat16:
            cast = lambda p: p.astype(dtype)  # noqa: E731
            imodel.params = jax.tree_util.tree_map(cast, imodel.params)
            stem.params = jax.tree_util.tree_map(cast, stem.params)
        xc = x.astype(dtype)
        yc = y_cond.astype(dtype)
        z0 = stem._apply(yc, yc, method="hyper_encode")
        zh = z0.astype(dtype)

        def ga(v):
            return imodel._apply(v, method="analysis")[0]

        def he(v):
            return stem._apply(v, v, method="hyper_encode")

        def priors(v):
            return stem._apply(v, yc, method="entropy_params")

        def gs(v):
            return imodel._apply(v, method="get_x")

        def qidx(v):
            from spatiotemporalentropymodel_tpu.ops import pallas_kernels as pk

            scales, means = stem._apply(zh, yc, method="entropy_params")
            return pk.quantize_and_index(
                v.astype(jnp.float32), means.astype(jnp.float32),
                scales.astype(jnp.float32), table)

        def full(xpix):
            # true full P chain from pixels: g_a -> HE -> round(z) ->
            # priors -> quantize+index -> g_s (matches analytic ga+gs FLOPs)
            v = imodel._apply(xpix, method="analysis")[0].astype(dtype)
            z = stem._apply(v, v, method="hyper_encode")
            z32 = z.astype(jnp.float32)
            z_hat = (jnp.round(z32 - medians) + medians).astype(dtype)
            scales, means = stem._apply(z_hat, v, method="entropy_params")
            from spatiotemporalentropymodel_tpu.ops import pallas_kernels as pk

            y_sym, idx = pk.quantize_and_index(
                v.astype(jnp.float32), means.astype(jnp.float32),
                scales.astype(jnp.float32), table)
            y_hat = (y_sym.astype(jnp.float32)
                     + means.astype(jnp.float32)).astype(dtype)
            return imodel._apply(y_hat, method="get_x")

        print(f"--- dtype {dname} (batch {b}, per-frame numbers = /batch)",
              flush=True)
        aflops = analytic_flops(b)
        for name, fn, inp in (
            ("g_a", ga, xc),
            ("HE", he, yc),
            ("HD+TPM+EPM", priors, zh),
            ("quantize+index", qidx, yc),
            ("g_s", gs, yc),
            ("full_P_chain", full, xc),
        ):
            row = measure(f"{name}[{dname}]", fn, inp, args.iters)
            row["dtype"] = dname
            row["per_frame_ms"] = round(row["ms"] / b, 3)
            if name in aflops:  # replace XLA's conv-blind count
                fl = aflops[name]
                if name == "full_P_chain":  # + XLA-counted entropy stages
                    fl += sum(r["gflop"] for r in rows
                              if r["dtype"] == dname and r["name"].split("[")[0]
                              in ("HE", "HD+TPM+EPM", "quantize+index")) * 1e9
                tflops = fl / (row["ms"] * 1e-3) / 1e12
                row["gflop_xla"] = row["gflop"]
                row["gflop"] = round(fl / 1e9, 2)
                row["achieved_tflops"] = round(tflops, 2)
                row["pct_f32_peak"] = round(100 * tflops / PEAK_F32_TFLOPS, 1)
                row["pct_bf16_peak"] = round(
                    100 * tflops / PEAK_BF16_TFLOPS, 1)
                row["flops_source"] = "analytic"
                t_cmp = fl / (PEAK_F32_TFLOPS * 1e12)
                row["lb_ms_mxu_f32"] = round(1e3 * t_cmp, 3)
                row["bound"] = ("hbm" if row["lb_ms_hbm"] / 1e3 > t_cmp
                                else "mxu")
                print(f"  ^ analytic: {row['gflop']} GF -> "
                      f"{tflops:.1f} TF/s ({row['pct_f32_peak']}% f32 / "
                      f"{row['pct_bf16_peak']}% bf16 peak)", flush=True)
            rows.append(row)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({
            "device": str(jax.devices()[0]),
            "batch": b,
            "peaks": {"bf16_tflops": PEAK_BF16_TFLOPS,
                      "f32_tflops": PEAK_F32_TFLOPS,
                      "hbm_gbs": PEAK_HBM_GBS},
            "stages": rows,
        }, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
