"""A/B the fused IGDN→deconv g_s tail kernel against production.

The g_s tail — ``GDN(inverse=True)`` then ``Deconv(3, 5, 2)``
(compressai/models/priors.py:158-161) — costs 18.4 + 26.3 ms of the
130.7 ms f32 b=4 1080p device chain (artifacts/layer_probe.json), both
HBM-bound. ``ops/pallas_kernels.igdn_deconv_fused`` collapses the pair
into one VMEM pass. This tool answers the only question that matters:
does the FULL device-only chain get faster with the peephole on, in the
serving dtype?

Measures (TPU):
  tail_{prod,fused}_{f32,bf16}  — the isolated pair at the bench tail
                                  shape (B, 544, 960, 192)
  chain_{off,on}_{f32,bf16}     — bench.run_device_only(batch) fps with
                                  the Sequential peephole toggled

Usage:  python tools/fused_tail_tune.py [--batch 4] [--iters 8]
Writes artifacts/fused_tail_ab.json.
"""

import argparse
import json
import os
import sys
import time  # noqa: F401  (roofline helpers use module-level time)

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip-chain", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from roofline import measure

    import bench
    from spatiotemporalentropymodel_tpu.layers import GDN, Deconv, Sequential
    from spatiotemporalentropymodel_tpu.ops import pallas_kernels as pk

    print("device:", jax.devices()[0].device_kind, flush=True)
    rows = []

    # --- isolated tail pair at the bench g_s tail shape -------------------
    c = bench.M
    h, w = bench.H // 2, bench.W // 2
    seq = Sequential([GDN(c, inverse=True), Deconv(3, 5, 2)])
    params = seq.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 8, c), jnp.float32))

    for dname, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x = (jax.random.normal(jax.random.PRNGKey(1),
                               (args.batch, h, w, c)) * 0.5).astype(dt)
        p = jax.tree_util.tree_map(lambda v: v.astype(dt), params)
        for label, flag in (("prod", False), ("fused", True)):
            pk.FUSE_IGDN_DECONV = flag
            rows.append(measure(
                f"tail_{label}_{dname}",
                lambda v: seq.apply(p, v), x, args.iters))

    # --- full device-only chain A/B ---------------------------------------
    chain = {}
    if not args.skip_chain:
        for dname, dt in (("f32", None), ("bf16", jnp.bfloat16)):
            for label, flag in (("off", False), ("on", True)):
                pk.FUSE_IGDN_DECONV = flag
                r = bench.run_device_only(args.batch, dtype=dt)
                chain[f"chain_{label}_{dname}"] = r
                print(f"chain_{label}_{dname}: {r['fps']:.2f} fps "
                      f"({r['ms_per_frame']} ms/frame)", flush=True)
    pk.FUSE_IGDN_DECONV = True

    out = {"batch": args.batch, "tail": rows, "chain": chain}
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "fused_tail_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.relpath(path), flush=True)


if __name__ == "__main__":
    main()
