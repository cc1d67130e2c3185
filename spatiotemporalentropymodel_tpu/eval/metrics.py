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


def _ssim_per_channel(a, b, max_val, kernel_size, sigma):
    """SSIM / contrast-structure means over H, W → (B, C) pairs
    (the pytorch_msssim `_ssim` contract: per-channel means are kept
    separate until the final reduction)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    kernel = _gaussian_kernel(kernel_size, sigma)

    mu_a = _filter2d(a, kernel)
    mu_b = _filter2d(b, kernel)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_aa = _filter2d(a * a, kernel) - mu_aa
    sigma_bb = _filter2d(b * b, kernel) - mu_bb
    sigma_ab = _filter2d(a * b, kernel) - mu_ab

    cs_map = (2 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    ssim_map = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs_map
    return ssim_map.mean(axis=(1, 2)), cs_map.mean(axis=(1, 2))


def ssim(a, b, max_val: float = 1.0, kernel_size: int = 11, sigma: float = 1.5,
         return_cs: bool = False):
    """Single-scale SSIM (mean over NHW C)."""
    s, cs = _ssim_per_channel(a, b, max_val, kernel_size, sigma)
    if return_cs:
        return jnp.mean(s), jnp.mean(cs)
    return jnp.mean(s)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _avg_pool2(x):
    """2×2 average pool matching ``F.avg_pool2d(x, 2, padding=dim % 2)``:
    odd dims are zero-padded on both sides and the pad counts in the mean
    (count_include_pad), as pytorch_msssim downsamples between scales."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    oh = (x.shape[1] - 2) // 2 + 1
    ow = (x.shape[2] - 2) // 2 + 1
    x = (x[:, 0 : 2 * oh : 2] + x[:, 1 : 2 * oh : 2]) * 0.5
    return (x[:, :, 0 : 2 * ow : 2] + x[:, :, 1 : 2 * ow : 2]) * 0.5


def ms_ssim(a, b, max_val: float = 1.0, kernel_size: int = 11,
            sigma: float = 1.5):
    """Multi-scale SSIM, standard 5-scale weights (Wang et al. 2003).

    Follows pytorch_msssim's exact computation order — the package the
    reference evaluates with (stem/evalSTEM.py:16): per-(batch, channel) cs/
    ssim means, relu'd stack, weighted geometric product per (B, C), and a
    single arithmetic mean at the end. Pinned against a torch transcription
    of that algorithm in tests/test_metrics.py (≤1e-4).
    """
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    levels = len(_MSSSIM_WEIGHTS)
    # pytorch_msssim's input contract: after the 4 downsamplings the smallest
    # scale must still fit the filter window, else the conv output is empty
    # and the mean is NaN
    min_side = min(a.shape[1], a.shape[2])
    if min_side <= (kernel_size - 1) * 2 ** (levels - 1):
        raise ValueError(
            f"ms_ssim needs min(H, W) > {(kernel_size - 1) * 2 ** (levels - 1)}"
            f" for {levels} scales with kernel_size={kernel_size}; "
            f"got {min_side}"
        )
    vals = []
    for i in range(levels):
        s, cs = _ssim_per_channel(a, b, max_val, kernel_size, sigma)
        vals.append(s if i == levels - 1 else cs)  # each (B, C)
        if i < levels - 1:
            a, b = _avg_pool2(a), _avg_pool2(b)
    stack = jax.nn.relu(jnp.stack(vals))  # (levels, B, C)
    per_bc = jnp.prod(stack ** weights[:, None, None], axis=0)
    return jnp.mean(per_bc)


def ms_ssim_or_nan(a, b, **kw) -> float:
    """``ms_ssim`` when the input meets the 5-scale size contract, else NaN.

    The eval tools call this on whole frames: real eval content (≥256px)
    always satisfies the contract — pytorch_msssim, the reference's metric
    package (stem/evalSTEM.py:16), refuses smaller inputs outright — but
    tiny-frame test runs degrade to NaN instead of aborting the sweep."""
    try:
        return float(ms_ssim(a, b, **kw))
    except ValueError:
        return float("nan")


def estimate_bpp(likelihoods, num_pixels: int):
    """Estimated bits-per-pixel from model likelihoods (evalSTEM.py:133-136)."""
    total = 0.0
    for lk in jax.tree_util.tree_leaves(likelihoods):
        total += jnp.sum(jnp.log(lk))
    return total / (-math.log(2) * num_pixels)


def _stream_bytes(strings) -> int:
    if isinstance(strings, (list, tuple)):
        return sum(_stream_bytes(s) for s in strings)
    return len(strings)


def actual_bpp(strings, num_pixels: int, counts=None) -> float:
    """Actual bits-per-pixel from bitstream lengths (evalSTEM.py:131-132).

    Recurses through arbitrarily nested string lists (charm emits
    per-batch *per-group* streams, one level deeper than the reference's
    ``[y_strings, z_strings]``). ``counts`` — the per-group CDF-row counts
    some models ship as container side-info — is charged at its ``.stemv``
    v4 wire cost (varint-packed used rows, entropy/transport.pack_counts)
    so the reported rate is what the file format actually pays."""
    nbytes = _stream_bytes(strings)
    if counts is not None:
        import numpy as np

        from ..entropy.transport import pack_counts

        c = np.asarray(counts)
        nbytes += len(pack_counts(c.reshape(-1, c.shape[-1])))
    return nbytes * 8.0 / num_pixels
