"""Batch image-codec evaluation over a directory of images.

Parity: compressai/utils/eval_model (__main__.py:256-302): per-image ×64
padding, real coding or --entropy-estimation, PSNR/MS-SSIM/bpp + timing,
JSON results consumed by the plot CLI.
"""

import argparse
import json
import os
import time
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..ops.padding import crop_centered, pad_centered
from .metrics import actual_bpp, estimate_bpp, ms_ssim_or_nan, psnr

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm")


def collect_images(rootpath: str) -> List[str]:
    return sorted(
        os.path.join(rootpath, f)
        for f in os.listdir(rootpath)
        if os.path.splitext(f)[1].lower() in IMG_EXTENSIONS
    )


def _load(path):
    from PIL import Image

    with Image.open(path) as im:
        return jnp.asarray(
            np.asarray(im.convert("RGB"), np.float32)[None] / 255.0
        )


def eval_image(model, x, entropy_estimation: bool = False) -> Dict[str, float]:
    h, w = x.shape[1], x.shape[2]
    num_pixels = h * w
    x_padded, pads = pad_centered(x, 64)

    if entropy_estimation:
        out = model.forward(x_padded)
        bpp = float(estimate_bpp(out["likelihoods"], num_pixels))
        x_hat = out["x_hat"]
        enc_t = dec_t = float("nan")
    else:
        t0 = time.time()
        enc = model.compress(x_padded)
        enc_t = time.time() - t0
        t0 = time.time()
        dec = model.decompress(enc["strings"], enc["shape"])
        dec_t = time.time() - t0
        x_hat = dec["x_hat"]
        bpp = actual_bpp(enc["strings"], num_pixels)

    x_hat = crop_centered(jnp.asarray(x_hat), pads)
    return {
        "psnr": float(psnr(x, x_hat)),
        "ms-ssim": ms_ssim_or_nan(x, x_hat),
        "bpp": bpp,
        "encoding_time": enc_t,
        "decoding_time": dec_t,
    }


def eval_model(model, filepaths: List[str],
               entropy_estimation: bool = False) -> Dict[str, float]:
    metrics: Dict[str, float] = {}
    for path in filepaths:
        rv = eval_image(model, _load(path), entropy_estimation)
        for k, v in rv.items():
            metrics[k] = metrics.get(k, 0.0) + v
    return {k: v / len(filepaths) for k, v in metrics.items()}


def main(argv=None):
    from ..zoo import cfgs, model_architectures

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset", help="image directory")
    parser.add_argument("-a", "--architecture", required=True,
                        choices=list(model_architectures))
    parser.add_argument("-q", "--qualities", type=int, nargs="+", default=[1])
    parser.add_argument("--checkpoint", help="framework checkpoint path")
    parser.add_argument("--entropy-estimation", action="store_true")
    parser.add_argument("-o", "--output")
    args = parser.parse_args(argv)

    filepaths = collect_images(args.dataset)
    if not filepaths:
        raise SystemExit("no images found")

    results = {"name": args.architecture, "results": {}}
    for q in args.qualities:
        model = model_architectures[args.architecture](
            *cfgs[args.architecture][q]
        )
        model.init(_load(filepaths[0]))
        if args.checkpoint:
            from ..training.checkpoints import load_checkpoint

            model.load_state_dict(load_checkpoint(args.checkpoint)["model"])
        model.update()
        metrics = eval_model(model, filepaths, args.entropy_estimation)
        for k, v in metrics.items():
            results["results"].setdefault(k, []).append(v)

    output = json.dumps(results, indent=2)
    print(output)
    if args.output:
        with open(args.output, "w") as f:
            f.write(output)


if __name__ == "__main__":
    main()
