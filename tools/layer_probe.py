"""Per-layer timing of the 1080p g_a/g_s transform stacks (round-3 MFU work).

Times every conv/GDN of the pixel transforms standalone (scan-folded, one jit
per layer — see tools/roofline.py::measure) with ANALYTIC flop counts, to
locate where the 30 ms/frame device budget goes. Suspects: the cin=3 /
cout=3 edge convs (channel dim pads 3→128 on the MXU: 2.3% lane utilization)
and the GDN channel matmuls.

Usage: python tools/layer_probe.py [--batch 4] [--iters 8] [--out artifacts/layer_probe.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.roofline import measure, _conv_flops, _gdn_flops  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="artifacts/layer_probe.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from spatiotemporalentropymodel_tpu.layers.conv import Conv, Deconv
    from spatiotemporalentropymodel_tpu.layers.gdn import GDN

    b = args.batch
    N = 192
    rng = jax.random.PRNGKey(0)

    # (name, module, input shape HWC, analytic flops at b=1)
    specs = [
        ("ga.conv0 3->192 @1088x1920", Conv(N, 5, 2), (1088, 1920, 3),
         _conv_flops(544, 960, 3, N, 5)),
        ("ga.gdn0 @544x960", GDN(N), (544, 960, N), _gdn_flops(544, 960, N)),
        ("ga.conv1 192->192 @544x960", Conv(N, 5, 2), (544, 960, N),
         _conv_flops(272, 480, N, N, 5)),
        ("ga.gdn1 @272x480", GDN(N), (272, 480, N), _gdn_flops(272, 480, N)),
        ("ga.conv2 192->192 @272x480", Conv(N, 5, 2), (272, 480, N),
         _conv_flops(136, 240, N, N, 5)),
        ("ga.gdn2 @136x240", GDN(N), (136, 240, N), _gdn_flops(136, 240, N)),
        ("ga.conv3 192->192 @136x240", Conv(N, 5, 2), (136, 240, N),
         _conv_flops(68, 120, N, N, 5)),
        ("gs.deconv0 @68x120", Deconv(N, 5, 2), (68, 120, N),
         _conv_flops(68, 120, N, N, 5)),
        ("gs.deconv1 @136x240", Deconv(N, 5, 2), (136, 240, N),
         _conv_flops(136, 240, N, N, 5)),
        ("gs.deconv2 @272x480", Deconv(N, 5, 2), (272, 480, N),
         _conv_flops(272, 480, N, N, 5)),
        ("gs.deconv3 192->3 @544x960", Deconv(3, 5, 2), (544, 960, N),
         _conv_flops(544, 960, N, 3, 5)),
        ("gs.igdn @544x960", GDN(N, inverse=True), (544, 960, N),
         _gdn_flops(544, 960, N)),
    ]

    rows = []
    total_ms = 0.0
    for name, mod, shape, fl in specs:
        x0 = jax.random.normal(rng, (b, *shape), jnp.float32) * 0.1
        params = mod.init(jax.random.PRNGKey(1), x0)
        fn = lambda v: mod.apply(params, v)  # noqa: E731
        row = measure(name, fn, x0, args.iters)
        fl_b = fl * b
        tflops = fl_b / (row["ms"] * 1e-3) / 1e12
        row["gflop_analytic"] = round(fl_b / 1e9, 2)
        row["achieved_tflops_analytic"] = round(tflops, 2)
        row["per_frame_ms"] = round(row["ms"] / b, 3)
        print(f"  ^ analytic {row['gflop_analytic']} GF -> {tflops:.1f} TF/s "
              f"({row['per_frame_ms']} ms/frame)", flush=True)
        rows.append(row)
        total_ms += row["ms"]

    print(f"TOTAL (sum of layers): {total_ms:.1f} ms = "
          f"{total_ms / b:.2f} ms/frame", flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "batch": b,
                   "total_ms": round(total_ms, 1), "layers": rows}, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
