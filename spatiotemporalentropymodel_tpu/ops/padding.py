"""Spatial padding helpers for codec inputs.

The reference pads inputs to a multiple of 64 before coding and crops after
decoding (stem/evalSTEM.py:41-52, compressai_examples/codec.py:119-148,
compressai/utils/eval_model/__main__.py:74-113). NHWC layout here.
"""

import jax.numpy as jnp


def pad_to_multiple(x, multiple: int = 64, mode: str = "constant"):
    """Pad an NHWC batch so H and W are multiples of `multiple`.

    Returns (padded, (H, W)) where (H, W) is the original spatial size.
    Padding is appended bottom/right (matches F.pad(x, (0, pw, 0, ph))).
    """
    h, w = x.shape[1], x.shape[2]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph == 0 and pw == 0:
        return x, (h, w)
    padded = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)
    return padded, (h, w)


def crop_to(x, size):
    """Crop an NHWC batch back to (H, W)."""
    h, w = size
    return x[:, :h, :w, :]


def pad_centered(x, multiple: int = 64):
    """Centered ×multiple padding (stem_roi getY / evalSTEM pad semantics,
    compressai/models/stem_roi.py:144-160, stem/evalSTEM.py:41-52).

    Returns (padded, pads) with pads = (top, bottom, left, right).
    """
    h, w = x.shape[1], x.shape[2]
    new_h = (h + multiple - 1) // multiple * multiple
    new_w = (w + multiple - 1) // multiple * multiple
    top = (new_h - h) // 2
    bottom = new_h - h - top
    left = (new_w - w) // 2
    right = new_w - w - left
    padded = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)))
    return padded, (top, bottom, left, right)


def crop_centered(x, pads):
    """Inverse of :func:`pad_centered`."""
    top, bottom, left, right = pads
    h, w = x.shape[1], x.shape[2]
    return x[:, top : h - bottom or None, left : w - right or None, :]
