"""Chain A/B for the packed g_s trunk (pallas_kernels.FUSE_GS_PACKED).

Measures the FULL production g_s — Deconv(N) → IGDN → Deconv(N) → IGDN →
Deconv(N) → IGDN → Deconv(3), the synthesis transform of every image codec
(compressai/models/priors.py:158-161) and the per-frame pixel transform of
the STEM serving pipeline — at 1080p latents, bf16, batch 4, under each
fusion config:

  xla          every Pallas deconv fusion off (GDN itself still Pallas)
  r3_default   narrow-tail fusion only (the config that shipped in round 3)
  wide         + shuffled wide IGDN->deconv (regressed in-chain in round 3:
               the pixel-shuffle epilogue relayouts ~200 MB/frame)
  packed       + the packed chain: wide stage emits phase-major pre-shuffle,
               tail consumes it — the shuffled intermediate never exists

Round-3 finding being answered: VERDICT r3 weak-#4 ("carry the pre-shuffle
paired layout through g_s").

Usage: python tools/gs_packed_tune.py [--batch 4] [--iters 8] \
           [--out artifacts/gs_packed_tune.json]
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
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--hw", type=int, nargs=2, default=(68, 120),
                    help="latent spatial dims (1080p default)")
    ap.add_argument("--out", default="artifacts/gs_packed_tune.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from spatiotemporalentropymodel_tpu.layers import Deconv, GDN, Sequential
    from spatiotemporalentropymodel_tpu.ops import pallas_kernels as pk

    n = args.n
    b, (h, w) = args.batch, args.hw
    seq = Sequential([
        Deconv(n, 5, 2), GDN(n, inverse=True), Deconv(n, 5, 2),
        GDN(n, inverse=True), Deconv(n, 5, 2), GDN(n, inverse=True),
        Deconv(3, 5, 2)], name="g_s")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.6, (b, h, w, n)), jnp.bfloat16)
    params = seq.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.ndim >= 4 else a, params)

    configs = [
        ("xla", dict(FUSE_IGDN_DECONV=False, FUSE_IGDN_DECONV_WIDE=False,
                     FUSE_GS_PACKED=False)),
        ("r3_default", dict(FUSE_IGDN_DECONV=True,
                            FUSE_IGDN_DECONV_WIDE=False,
                            FUSE_GS_PACKED=False)),
        ("wide", dict(FUSE_IGDN_DECONV=True, FUSE_IGDN_DECONV_WIDE=True,
                      FUSE_GS_PACKED=False)),
        ("packed", dict(FUSE_IGDN_DECONV=True, FUSE_IGDN_DECONV_WIDE=True,
                        FUSE_GS_PACKED=True)),
        # the shipped defaults: the interior IGDN->Deconv pair stays XLA
        # (the shuffled wide kernel regresses in-chain), only the final
        # quadruple runs packed
        ("packed_no_wide", dict(FUSE_IGDN_DECONV=True,
                                FUSE_IGDN_DECONV_WIDE=False,
                                FUSE_GS_PACKED=True)),
    ]
    saved = {k: getattr(pk, k) for k in configs[-1][1]}
    rows, ref_out = [], None
    try:
        for name, knobs in configs:
            for k, v in knobs.items():
                setattr(pk, k, v)

            def fn(v):
                return seq.apply(params, v)

            y = np.asarray(fn(x), np.float32)
            if ref_out is None:
                ref_out = y
                err = 0.0
            else:
                err = float(np.abs(y - ref_out).max()) / max(
                    1.0, float(np.abs(ref_out).max()))
                assert err < 0.15, (name, err)
            r = measure(f"g_s {name}", fn, x, args.iters)
            r["per_frame_ms"] = round(r["ms"] / b, 3)
            r["rel_err_vs_xla"] = round(err, 5)
            r["knobs"] = knobs
            print(f"{name}: {r['per_frame_ms']} ms/frame "
                  f"(rel err {err:.4f})", flush=True)
            rows.append(r)
    finally:
        for k, v in saved.items():
            setattr(pk, k, v)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "batch": b,
                   "shape": [b, h, w, n], "chains": rows}, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
