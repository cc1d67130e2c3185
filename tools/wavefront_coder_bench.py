"""Standalone wavefront host-coder A/B: v1 lane order vs v2 grouped rounds.

Measures ONLY the host rANS side of the wavefront codec path at 1080p scale
(the device rounds are measured separately by bench.py::run_wavefront) so the
wire-format choice is decided on clean single-core numbers, before any device
traffic. Symbol statistics mirror bench.py::measure_host_coder (~12%
nonzeros, rows 0-30 of the 64-row scale table).

The decode leg replays the real per-round serving loop: per round the decoder
is handed that round's CDF indexes (in serving they are fetched from the
device) and must return symbols in lane order — for v2 that includes the
bincount/argsort/scatter host transform, so the comparison charges v2 its
full cost.

Usage: python tools/wavefront_coder_bench.py [--tile TH TW] [--out FILE]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # host-only measurement

from bench import H, M, W, _realistic_symbols  # noqa: E402  shared workload


def round_layout(tile, m: int):
    """Per-round flat symbol counts for a tiled 1080p latent."""
    from spatiotemporalentropymodel_tpu.models import ar_wavefront as wf

    hgt, wid = H // 16, W // 16
    th, tw = tile
    nt = (hgt // th) * (wid // tw)
    _, valid = wf.wavefront_tables(th, tw)
    return wf.round_sizes(valid, nt, m)


def t_median(fn, reps: int = 5):
    fn(), fn()  # warm (LUT build + first-touch faults)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        vals.append(time.perf_counter() - t0)
    return r, 1e3 * float(np.median(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, nargs=2, default=(1, 4))
    ap.add_argument("--out")
    args = ap.parse_args()

    from spatiotemporalentropymodel_tpu.coders import get_coder
    from spatiotemporalentropymodel_tpu.entropy import base as eb
    from spatiotemporalentropymodel_tpu.models import ar_wavefront as wf

    coder = get_coder()
    sym, idx, tables = _realistic_symbols()
    sizes = round_layout(args.tile, M)
    assert int(sizes.sum()) == sym.size
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    esym = eb.get_enc_table(tables, coder)
    lut = eb.get_lut(tables, coder)
    rounds = [
        (sym[bounds[t]:bounds[t + 1]], idx[bounds[t]:bounds[t + 1]])
        for t in range(sizes.shape[0])
    ]

    # ---- v1: lane order, per-symbol indexed coding --------------------------
    def enc_v1():
        return coder.encode_with_indexes(
            sym, idx, tables.cdf, tables.cdf_length, tables.offset, esym=esym
        )

    s1, enc1_ms = t_median(enc_v1)

    def dec_v1():
        dec = coder.make_stream_decoder(s1)
        return [
            dec.decode(ir, tables.cdf, tables.cdf_length, tables.offset,
                       lut=lut)
            for _, ir in rounds
        ]

    out1, dec1_ms = t_median(dec_v1)

    # ---- v2: grouped rounds, run-based coding --------------------------------
    def enc_v2():
        sym_g, seg_counts = wf.group_round_symbols(
            sym, idx, sizes, tables.cdf.shape[0]
        )
        return coder.encode_runs_segmented(
            sym_g, seg_counts, tables.cdf, tables.cdf_length, tables.offset,
            esym=esym,
        )

    s2, enc2_ms = t_median(enc_v2)

    # encode-side host transform alone (the permutation v2 adds)
    _, group_ms = t_median(
        lambda: wf.group_round_symbols(sym, idx, sizes, tables.cdf.shape[0])
    )

    def dec_v2():
        dec = coder.make_stream_decoder(s2)
        return [
            wf.decode_round_grouped(dec, ir, tables, lut=lut)
            for _, ir in rounds
        ]

    out2, dec2_ms = t_median(dec_v2)

    for a, b, (sr, _) in zip(out1, out2, rounds):
        assert np.array_equal(a, sr) and np.array_equal(b, sr)

    res = {
        "tile": list(args.tile),
        "rounds": int(sizes.shape[0]),
        "n_symbols": int(sym.size),
        "bytes": {"v1": len(s1), "v2": len(s2)},
        "v1_lane": {"enc_ms": round(enc1_ms, 2), "dec_ms": round(dec1_ms, 2)},
        "v2_grouped": {
            "enc_ms": round(enc2_ms, 2),
            "dec_ms": round(dec2_ms, 2),
            "enc_group_transform_ms": round(group_ms, 2),
        },
        "speedup": {
            "enc": round(enc1_ms / enc2_ms, 2),
            "dec": round(dec1_ms / dec2_ms, 2),
        },
    }
    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
