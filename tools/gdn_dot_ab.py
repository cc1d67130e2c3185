"""A/B the GDN_DOT_BF16 knob on the g_a stage1 fused kernel (TPU)."""

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
    ref = None
    for knob in (True, False):
        pk.GDN_DOT_BF16 = knob
        y = np.asarray(pk.gdn_conv_fused(x, gt, beta, k, bias), np.float32)
        if ref is None:
            ref = y
        else:
            scale = max(1.0, float(np.abs(ref).max()))
            print(f"rel err bf16-dot vs f32-dot: "
                  f"{float(np.abs(y - ref).max()) / scale:.5f}", flush=True)
        r = measure(f"stage1 gdn_dot_bf16={knob}",
                    lambda v: pk.gdn_conv_fused(v, gt, beta, k, bias), x, 8)
        rows[str(knob)] = round(r["ms"] / b, 3)
        print(f"stage1 gdn_dot_bf16={knob}: {rows[str(knob)]} ms/frame",
              flush=True)
    pk.GDN_DOT_BF16 = True
    with open("artifacts/gdn_dot_ab.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote artifacts/gdn_dot_ab.json", flush=True)


if __name__ == "__main__":
    main()
