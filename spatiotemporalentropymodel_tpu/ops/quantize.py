"""Quantization primitives.

Reference behavior: compressai/entropy_models/entropy_models.py:122-163
(quantize modes "noise" / "dequantize" / "symbols", and static dequantize) and
compressai/ops/ops.py:18-32 (straight-through round). All pure functions; the
training-noise path takes an explicit PRNG key instead of hidden RNG state.
"""

import jax
import jax.numpy as jnp


def ste_round(x):
    """Straight-through rounding: forward=round, gradient=identity.

    Parity: compressai/ops/ops.py:18-32.
    """
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize_noise(x, rng):
    """Additive uniform U(-0.5, 0.5) noise (training-time quantization proxy)."""
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)


def quantize_dequantize(x, means=None):
    """round(x - means) + means (eval-time forward quantization)."""
    if means is not None:
        return jnp.round(x - means) + means
    return jnp.round(x)


def quantize_symbols(x, means=None):
    """round(x - means) as int32 symbols (coding path)."""
    if means is not None:
        x = x - means
    return jnp.round(x).astype(jnp.int32)


def dequantize(symbols, means=None, dtype=jnp.float32):
    """Inverse of :func:`quantize_symbols`."""
    if means is not None:
        return symbols.astype(means.dtype) + means
    return symbols.astype(dtype)


def quantize(x, mode: str, means=None, rng=None):
    """Dispatcher mirroring the reference's 3-mode quantize API."""
    if mode == "noise":
        if rng is None:
            raise ValueError("mode='noise' requires an explicit PRNG key")
        return quantize_noise(x, rng)
    if mode == "dequantize":
        return quantize_dequantize(x, means)
    if mode == "symbols":
        return quantize_symbols(x, means)
    raise ValueError(f'Invalid quantization mode: "{mode}"')
