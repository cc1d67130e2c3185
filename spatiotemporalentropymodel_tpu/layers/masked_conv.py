"""PixelCNN-style masked convolution — pure, no in-place weight mutation.

Parity: compressai/layers/layers.py:21-47. The reference mutates
``self.weight.data`` in place each forward; here the mask is a compile-time
constant multiplied into the kernel inside the (pure) forward, which XLA folds.
Mask type "A" zeroes the center pixel and everything after it in raster order;
"B" keeps the center.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .conv import kaiming_normal


def make_causal_mask(kh: int, kw: int, mask_type: str = "A") -> np.ndarray:
    """(kh, kw, 1, 1) raster-order causal mask."""
    if mask_type not in ("A", "B"):
        raise ValueError(f'Invalid "mask_type" value "{mask_type}"')
    mask = np.ones((kh, kw, 1, 1), dtype=np.float32)
    mask[kh // 2, kw // 2 + (mask_type == "B"):] = 0
    mask[kh // 2 + 1:] = 0
    return mask


class MaskedConv2d(nn.Module):
    features: int
    kernel_size: int = 5
    mask_type: str = "A"

    @nn.compact
    def __call__(self, x, mask_weight: bool = True):
        """Apply the masked conv.

        ``mask_weight=False`` reproduces the reference AR-decode path that uses
        the raw weight after in-place masking has already happened
        (priors.py:663-668) — with a pure kernel the masked and raw weights are
        the same tensor, so the flag only exists for API clarity.
        """
        k = self.kernel_size
        p = k // 2
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_normal, (k, k, in_ch, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mask = jnp.asarray(make_causal_mask(k, k, self.mask_type))
        out = jax.lax.conv_general_dilated(
            x,
            (kernel * mask).astype(x.dtype),
            window_strides=(1, 1),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(out.dtype)
