"""End-to-end demo: compress and reconstruct a synthetic GOP video.

Runs on CPU or TPU with no external data: generates a moving-gradient clip,
codes the I-frame with MeanScaleHyperprior and the P-frames with the STEM
P-frame entropy model through the minimal-dispatch serving pipeline, and
reports per-frame PSNR / bpp.

    python examples/video_codec_demo.py [--frames 5] [--size 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_clip(n_frames: int, size: int) -> np.ndarray:
    """Moving diagonal gradient + drifting disc, (T, H, W, 3) in [0, 1]."""
    t = np.arange(n_frames)[:, None, None]
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    base = ((xx + yy)[None] / (2 * size) + 0.02 * t) % 1.0
    cx = size / 2 + size / 4 * np.sin(0.3 * t)
    cy = size / 2 + size / 4 * np.cos(0.3 * t)
    disc = ((xx[None] - cx) ** 2 + (yy[None] - cy) ** 2) < (size / 8) ** 2
    frames = np.stack(
        [base, 1 - base, 0.5 * np.ones_like(base)], axis=-1
    ).astype(np.float32)
    frames[disc] = [0.9, 0.2, 0.1]
    return frames


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--frames", type=int, default=5)
    parser.add_argument("--size", type=int, default=256)
    args = parser.parse_args(argv)

    from spatiotemporalentropymodel_tpu.eval.metrics import actual_bpp, psnr
    from spatiotemporalentropymodel_tpu.eval.pipeline import StemVideoPipeline
    from spatiotemporalentropymodel_tpu.models import (
        MeanScaleHyperprior,
        SpatioTemporalPriorModel,
    )

    clip = synthetic_clip(args.frames, args.size)
    x0 = jnp.asarray(clip[0:1])

    print("building models (random weights — rates are untrained-model rates)")
    imodel = MeanScaleHyperprior(64, 96)
    imodel.init(x0)
    imodel.update()
    stem = SpatioTemporalPriorModel(
        variant="without_spm", entropy_bottleneck_channels=96, in_channels=96
    )
    y0 = imodel.get_y(x0)[0]
    stem.init(y0, y0)
    stem.update()

    pipe = StemVideoPipeline(imodel, stem)
    num_pixels = args.size * args.size

    # I-frame through the image codec
    t0 = time.time()
    enc = imodel.compress(x0)
    dec = imodel.decompress(enc["strings"], enc["shape"])
    y_cond = dec["y_hat"]
    print(
        f"frame 0 (I): psnr={float(psnr(x0, dec['x_hat'])):6.2f} dB  "
        f"bpp={actual_bpp(enc['strings'], num_pixels):7.4f}  "
        f"({time.time() - t0:.2f}s)"
    )

    # P-frames through the pipeline
    for i in range(1, args.frames):
        x = jnp.asarray(clip[i : i + 1])
        t0 = time.time()
        enc, _ = pipe.encode_frame(x, y_cond)
        x_hat, y_cond = pipe.decode_frame(enc["strings"], enc["shape"], y_cond)
        print(
            f"frame {i} (P): psnr={float(psnr(x, x_hat)):6.2f} dB  "
            f"bpp={actual_bpp(enc['strings'], num_pixels):7.4f}  "
            f"({time.time() - t0:.2f}s)"
        )


if __name__ == "__main__":
    main()
