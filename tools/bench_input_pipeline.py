"""Input-pipeline throughput: can the loader keep a chip busy?

Measures images/s for Vimeo-shaped PNG septuplets (written to a tmpdir)
through data/pipeline.batch_iterator at worker counts {0, 2, 4}, and
compares against a representative train-step consumption rate (frames/s the
device path can absorb — pass ``--train-ms`` from a measured step, default
from BENCH_NOTES). VERDICT r1 #8.

Usage: python tools/bench_input_pipeline.py [--n-seqs 24] [--train-ms 350]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_vimeo_tree(root: str, n_seqs: int, hw=(256, 448)) -> str:
    """Write a miniature Vimeo90k layout: sequences/xxxxx/yyyy/im{1..7}.png."""
    from PIL import Image

    rng = np.random.default_rng(0)
    seq_dir = os.path.join(root, "sequences")
    names = []
    for i in range(n_seqs):
        d = os.path.join(seq_dir, f"{i // 4 + 1:05d}", f"{i % 4 + 1:04d}")
        os.makedirs(d, exist_ok=True)
        for t in range(1, 8):
            arr = rng.integers(0, 255, (*hw, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"im{t}.png"))
        names.append(f"{i // 4 + 1:05d}/{i % 4 + 1:04d}")
    with open(os.path.join(root, "sep_trainlist.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(root, "sep_testlist.txt"), "w") as f:
        f.write(names[0] + "\n")
    return root


def measure(root: str, batch_size: int, workers: int, n_batches: int) -> float:
    from spatiotemporalentropymodel_tpu.data import VimeoSepTuplet
    from spatiotemporalentropymodel_tpu.data.pipeline import batch_iterator

    ds = VimeoSepTuplet(root, is_training=True, cropsize=256)
    it = batch_iterator(ds, batch_size, seed=1, workers=workers)
    next(it)  # warm caches
    t0 = time.perf_counter()
    frames = 0
    for _ in range(n_batches):
        b = next(it)
        frames += b.shape[0] * b.shape[1]
    dt = time.perf_counter() - t0
    return frames / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-seqs", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--n-batches", type=int, default=5)
    ap.add_argument("--train-ms", type=float, default=350.0,
                    help="measured train-step ms per batch (consumption)")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as d:
        make_vimeo_tree(d, args.n_seqs)
        need = args.batch_size * 7 / (args.train_ms / 1e3)
        print(f"train-step consumption: {need:.1f} frames/s")
        for w in (0, 2, 4):
            fps = measure(d, args.batch_size, w, args.n_batches)
            util = min(1.0, fps / need)
            print(f"workers={w}: {fps:7.1f} frames/s "
                  f"(chip utilization bound: {util:.0%})")


if __name__ == "__main__":
    main()
