"""Decompose the fused GDN→conv stage1 cost with the _GDN_CONV_DEBUG knobs.

Hypothesis (round 4): the window-fill GDN normalization dot runs f32 on the
MXU (1/4-1/8 the bf16 rate) and is a large slice of the 5.4 ms/frame stage1
cost.  Modes: "" (production), "nogdn" (fill copies raw rows — isolates the
GDN dot), "nofill" (skips the fill — isolates fill DMA+GDN together),
"onedot" (single tap block — isolates conv-dot issue cost).
Wrong results by construction for the debug modes; timing only.
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

    b, C, H, W = 4, 192, 544, 960
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (b, H, W, C)), jnp.bfloat16)
    gt = jnp.asarray(rng.uniform(0.01, 0.1, (C, C)), jnp.float32)
    beta = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.05, (5, 5, C, C)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)

    rows = {}
    for mode in ("", "nogdn", "nofill", "onedot"):
        pk._GDN_CONV_DEBUG = mode
        r = measure(f"stage1 debug={mode or 'prod'}",
                    lambda v: pk.gdn_conv_fused(v, gt, beta, k, bias), x, 8)
        rows[mode or "prod"] = round(r["ms"] / b, 3)
        print(f"stage1 debug={mode or 'prod'}: {rows[mode or 'prod']} "
              "ms/frame", flush=True)
    pk._GDN_CONV_DEBUG = ""
    out = "artifacts/gdn_fill_probe.json"
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
