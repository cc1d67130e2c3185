"""Color-space transforms (BT.709 RGB↔YCbCr, YUV 444↔420), NHWC / jittable.

Parity: compressai/transforms/functional.py:26-135. Used by the standard-codec
bench wrappers; jnp-based so they also run on-device when fused into a
pipeline.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

# ITU-R BT.709: (K_r, K_g, K_b), K_g = 1 − K_r − K_b
YCBCR_WEIGHTS = {"ITU-R_BT.709": (0.2126, 0.7152, 0.0722)}


def _check(x):
    if x.ndim not in (3, 4) or x.shape[-1] != 3:
        raise ValueError(
            "Expected an NHWC or HWC tensor with 3 channels, got "
            f"shape {x.shape}"
        )


def rgb2ycbcr(rgb):
    _check(rgb)
    kr, kg, kb = YCBCR_WEIGHTS["ITU-R_BT.709"]
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = kr * r + kg * g + kb * b
    cb = 0.5 * (b - y) / (1 - kb) + 0.5
    cr = 0.5 * (r - y) / (1 - kr) + 0.5
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr2rgb(ycbcr):
    _check(ycbcr)
    kr, kg, kb = YCBCR_WEIGHTS["ITU-R_BT.709"]
    y, cb, cr = ycbcr[..., 0], ycbcr[..., 1], ycbcr[..., 2]
    r = y + (2 - 2 * kr) * (cr - 0.5)
    b = y + (2 - 2 * kb) * (cb - 0.5)
    g = (y - kr * r - kb * b) / kg
    return jnp.stack([r, g, b], axis=-1)


def _avg_pool2(x):
    """2x2 average pool on (..., H, W, 1)/(..., H, W) NHWC planes."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def yuv_444_to_420(yuv, mode: str = "avg_pool"):
    """(N, H, W, 3) → (y (N,H,W,1), u (N,H/2,W/2,1), v (N,H/2,W/2,1))."""
    if mode != "avg_pool":
        raise ValueError(f'Invalid downsampling mode "{mode}".')
    if isinstance(yuv, (tuple, list)):
        y, u, v = yuv
    else:
        y, u, v = jnp.split(yuv, 3, axis=-1)
    return y, _avg_pool2(u), _avg_pool2(v)


def yuv_420_to_444(yuv: Tuple, mode: str = "bilinear", return_tuple: bool = False):
    if mode not in ("bilinear", "nearest"):
        raise ValueError(f'Invalid upsampling mode "{mode}".')
    y, u, v = yuv

    def _up(t):
        b, h, w, c = t.shape
        if mode == "nearest":
            return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
        return jax.image.resize(t, (b, 2 * h, 2 * w, c), method="bilinear")

    u, v = _up(u), _up(v)
    if return_tuple:
        return y, u, v
    return jnp.concatenate([y, u, v], axis=-1)
