"""A/B the _GDN_CONV_HALO input-path knob on the g_a fused stages (TPU).

Motivation (artifacts/gdn_fill_probe.json): ~2.65 of stage1's 5.4 ms/frame
is neither fill nor dots; the halo variant feeds the same bytes as three
standard block-indexed operands that Mosaic provably double-buffers, to
test whether the Element-indexed window's DMA was the serialized part.

RESULT (artifacts/gdn_halo_ab.json): NULL-to-slight-LOSS — stage1 5.596
halo vs 5.449 Element, stage2 1.524 vs 1.520. The Element window already
pipelines; the baseline is per-grid-step cost (see tools/gdn_th_sweep.py).
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
    rng = np.random.default_rng(0)
    rows = {}
    for name, (H, W) in (("stage1@544x960", (544, 960)),
                         ("stage2@272x480", (272, 480))):
        x = jnp.asarray(rng.normal(0, 0.5, (b, H, W, C)), jnp.bfloat16)
        gt = jnp.asarray(rng.uniform(0.01, 0.1, (C, C)), jnp.float32)
        beta = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.05, (5, 5, C, C)), jnp.float32)
        bias = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
        ref = np.asarray(pk._gdn_conv_ref(x, gt, beta, k, bias), np.float32)
        scale = max(1.0, float(np.abs(ref).max()))
        for halo in (True, False):
            pk._GDN_CONV_HALO = halo
            y = np.asarray(pk.gdn_conv_fused(x, gt, beta, k, bias),
                           np.float32)
            err = float(np.abs(y - ref).max()) / scale
            assert err < 0.15, (name, halo, err)
            r = measure(f"{name} halo={halo}",
                        lambda v: pk.gdn_conv_fused(v, gt, beta, k, bias),
                        x, 8)
            key = f"{name} halo={halo}"
            rows[key] = {"per_frame_ms": round(r["ms"] / b, 3),
                         "rel_err": round(err, 5)}
            print(key, rows[key], flush=True)
    pk._GDN_CONV_HALO = False  # the shipped default (measured winner)
    with open("artifacts/gdn_halo_ab.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote artifacts/gdn_halo_ab.json", flush=True)


if __name__ == "__main__":
    main()
