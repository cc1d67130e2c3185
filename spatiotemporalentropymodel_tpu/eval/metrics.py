"""Quality metrics: PSNR and MS-SSIM, jittable NHWC implementations.

Parity: the reference computes PSNR as −10·log10(mse) on [0,1] images and
MS-SSIM via the ``pytorch_msssim`` package (stem/evalSTEM.py:24-33,131-141).
Here MS-SSIM is implemented natively in JAX (gaussian window 11, σ=1.5, the
standard 5-scale weights) so the whole metric pipeline stays on-device.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def psnr(a, b, max_val: float = 1.0):
    """−10·log10(MSE / max²) (evalSTEM.py:24-27)."""
    m = mse(a, b)
    return -10.0 * jnp.log10(m / (max_val**2))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def _filter2d(x, kernel):
    """Depthwise 'valid' 2-D filter on NHWC."""
    c = x.shape[-1]
    k = kernel[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(a, b, max_val: float = 1.0, kernel_size: int = 11, sigma: float = 1.5,
         return_cs: bool = False):
    """Single-scale SSIM (mean over NHW C)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    kernel = _gaussian_kernel(kernel_size, sigma)

    mu_a = _filter2d(a, kernel)
    mu_b = _filter2d(b, kernel)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_aa = _filter2d(a * a, kernel) - mu_aa
    sigma_bb = _filter2d(b * b, kernel) - mu_bb
    sigma_ab = _filter2d(a * b, kernel) - mu_ab

    cs = (2 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    ssim_map = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs
    if return_cs:
        return jnp.mean(ssim_map), jnp.mean(cs)
    return jnp.mean(ssim_map)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _avg_pool2(x):
    b, h, w, c = x.shape
    h2, w2 = h - h % 2, w - w % 2
    x = x[:, :h2, :w2, :]
    return x.reshape(b, h2 // 2, 2, w2 // 2, 2, c).mean(axis=(2, 4))


def ms_ssim(a, b, max_val: float = 1.0, kernel_size: int = 11,
            sigma: float = 1.5):
    """Multi-scale SSIM, standard 5-scale weights (Wang et al. 2003)."""
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    levels = len(_MSSSIM_WEIGHTS)
    vals = []
    for i in range(levels):
        s, cs = ssim(a, b, max_val, kernel_size, sigma, return_cs=True)
        vals.append(s if i == levels - 1 else cs)
        if i < levels - 1:
            a, b = _avg_pool2(a), _avg_pool2(b)
    vals = jnp.stack(vals)
    # clamp for numerical safety before the weighted geometric mean
    vals = jnp.maximum(vals, 1e-6)
    return jnp.prod(vals**weights)


def estimate_bpp(likelihoods, num_pixels: int):
    """Estimated bits-per-pixel from model likelihoods (evalSTEM.py:133-136)."""
    total = 0.0
    for lk in jax.tree_util.tree_leaves(likelihoods):
        total += jnp.sum(jnp.log(lk))
    return total / (-math.log(2) * num_pixels)


def actual_bpp(strings, num_pixels: int) -> float:
    """Actual bits-per-pixel from bitstream lengths (evalSTEM.py:131-132)."""
    nbytes = 0
    for group in strings:
        if isinstance(group, (list, tuple)):
            nbytes += sum(len(s) for s in group)
        else:
            nbytes += len(group)
    return nbytes * 8.0 / num_pixels
