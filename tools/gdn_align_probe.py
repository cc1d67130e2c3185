"""Timing isolation: are the six sublane-misaligned tap-slab reads the
~2.65 ms/frame residual in g_a stage 1?

The nine _PAIR_BLOCKS slabs slice the s2d window at row bases
1 + (du+1)·Ws + m ≡ {0, 1, 2} (mod 16) — six of nine MXU operands are
sublane-misaligned, so Mosaic must rotate each (TH·Ws, K) slab before the
dot. debug="aligndots" forces every base onto the tiling (wrong results,
same shapes/op count). Input-path nulls (artifacts/gdn_dma_ab.json: the
rolling-DMA kernel that halves and overlaps input traffic measures the
same 5.49 ms/frame) ruled the window DMA out.

Writes artifacts/gdn_align_probe.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.roofline import measure  # noqa: E402


def main():
    import jax.numpy as jnp
    import numpy as np

    from spatiotemporalentropymodel_tpu.ops import pallas_kernels as pk

    b, C = 4, 192
    # fresh entropy per run — the tunnel memoizes identical (executable,
    # input) dispatches and returns ~0 ms timings on repeats
    seed = np.random.SeedSequence().entropy % (2 ** 31)
    rng = np.random.default_rng(seed)
    rows = {"seed": int(seed)}
    for name, (H, W) in (("stage1@544x960", (544, 960)),
                         ("stage2@272x480", (272, 480))):
        x = jnp.asarray(rng.normal(0, 0.5, (b, H, W, C)), jnp.bfloat16)
        gt = jnp.asarray(rng.uniform(0.01, 0.1, (C, C)), jnp.float32)
        beta = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.05, (5, 5, C, C)), jnp.float32)
        bias = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
        for mode, debug in (("prod", ""), ("aligndots", "aligndots"),
                            ("nofill", "nofill"), ("onedot", "onedot")):
            pk._GDN_CONV_DMA = "0"
            pk._GDN_CONV_DEBUG = debug
            r = measure(f"{name} {mode}",
                        lambda v: pk.gdn_conv_fused(v, gt, beta, k, bias),
                        x, 8)
            rows[f"{name} {mode}"] = round(r["ms"] / b, 3)
            print(f"{name} {mode}", rows[f"{name} {mode}"], flush=True)
    pk._GDN_CONV_DEBUG = ""
    pk._GDN_CONV_DMA = "auto"
    with open("artifacts/gdn_align_probe.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote artifacts/gdn_align_probe.json", flush=True)


if __name__ == "__main__":
    main()
