"""A/B the first g_a conv (3→192 k5 s2 @1088×1920) native vs s2d lowering.

The round-3 conv probe (artifacts/conv_s2d.json) covered the wide interior
convs; conv0 was never probed. Its native XLA lowering runs at ~13 TF/s
(K = 3 input channels starves the MXU contraction). The s2d rearrangement
is a 3×3 stride-1 conv with 12 input channels (K = 108 after im2row) on a
4× smaller spatial grid — denser contraction for the same FLOPs
(layers/conv.py::_s2d_kernel; the lowering is pinned elementwise-equal by
TestS2dConv).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.roofline import measure  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    # the package re-exports the conv() helper FUNCTION as `layers.conv`,
    # shadowing the module even for `import ... as`; go via sys.modules
    import importlib

    cv = importlib.import_module("spatiotemporalentropymodel_tpu.layers.conv")

    b, H, W, C, O = 4, 1088, 1920, 3, 192
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (b, H, W, C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.1, (5, 5, C, O)), jnp.float32)

    def native(v):
        return jax.lax.conv_general_dilated(
            v, k.astype(v.dtype), (2, 2), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def s2d(v):
        sub, pl, ph = cv._s2d_kernel(k.astype(v.dtype), 5, 2)
        vs = cv.space_to_depth(v, 2)
        return jax.lax.conv_general_dilated(
            vs, sub, (1, 1), ((pl, ph), (pl, ph)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ya = np.asarray(native(x), np.float32)
    yb = np.asarray(s2d(x), np.float32)
    scale = max(1.0, float(np.abs(ya).max()))
    err = float(np.abs(ya - yb).max()) / scale
    assert err < 0.02, err

    flop = (H // 2) * (W // 2) * 25 * C * O * 2 * b
    rows = {"rel_err": round(err, 6)}
    for name, fn in (("native", native), ("s2d", s2d)):
        r = measure(f"conv0 {name}", fn, x, 8)
        rows[name] = {"per_frame_ms": round(r["ms"] / b, 3),
                      "tf_s": round(flop / (r["ms"] / 1e3) / 1e12, 1)}
        print(name, rows[name], flush=True)
    with open("artifacts/conv0_s2d_ab.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote artifacts/conv0_s2d_ab.json", flush=True)


if __name__ == "__main__":
    main()
