"""Core-op tests (reference strategy: compressai_tests/test_ops.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatiotemporalentropymodel_tpu.ops import (
    NonNegativeParametrizer,
    crop_to,
    lower_bound,
    pad_to_multiple,
    quantize,
    quantize_dequantize,
    quantize_symbols,
    ste_round,
)


class TestLowerBound:
    def test_forward(self):
        x = jnp.array([-1.0, 0.0, 0.5, 2.0])
        np.testing.assert_allclose(lower_bound(x, 0.5), [0.5, 0.5, 0.5, 2.0])

    def test_gradient_mask(self):
        # grad passes iff x >= bound OR incoming grad is negative
        x = jnp.array([-1.0, 0.0, 0.5, 2.0])

        g_pos = jax.grad(lambda v: (lower_bound(v, 0.5) * 1.0).sum())(x)
        np.testing.assert_allclose(g_pos, [0.0, 0.0, 1.0, 1.0])

        g_neg = jax.grad(lambda v: (lower_bound(v, 0.5) * -1.0).sum())(x)
        np.testing.assert_allclose(g_neg, [-1.0, -1.0, -1.0, -1.0])

    def test_jit(self):
        f = jax.jit(lambda v: lower_bound(v, 0.1))
        np.testing.assert_allclose(f(jnp.array([0.05, 0.2])), [0.1, 0.2])


class TestSteRound:
    def test_values(self):
        x = jnp.array([-1.2, -0.5, 0.4, 1.6])
        np.testing.assert_allclose(ste_round(x), np.round(np.asarray(x)))

    def test_grad_identity(self):
        g = jax.grad(lambda v: ste_round(v).sum())(jnp.array([0.3, 1.7]))
        np.testing.assert_allclose(g, [1.0, 1.0])


class TestNonNegativeParametrizer:
    def test_roundtrip(self):
        p = NonNegativeParametrizer()
        x = jnp.array([0.0, 0.1, 1.0, 5.0])
        stored = p.init(x)
        np.testing.assert_allclose(p(stored), x, atol=1e-6)

    def test_minimum(self):
        p = NonNegativeParametrizer(minimum=1e-6)
        out = p(jnp.array([-10.0, 0.0, 10.0]))
        assert np.all(np.asarray(out) >= 1e-6 - 1e-12)


class TestQuantize:
    def test_noise_bounds(self):
        x = jnp.zeros((1000,))
        out = quantize(x, "noise", rng=jax.random.PRNGKey(0))
        assert np.all(np.abs(np.asarray(out)) <= 0.5)
        assert np.std(np.asarray(out)) > 0.1

    def test_dequantize_symbols_algebra(self):
        x = jnp.array([0.4, 1.6, -2.3])
        means = jnp.array([0.1, 0.1, 0.1])
        sym = quantize_symbols(x, means)
        deq = quantize_dequantize(x, means)
        np.testing.assert_allclose(np.asarray(sym) + np.asarray(means), deq)
        assert sym.dtype == jnp.int32

    def test_invalid_mode(self):
        with pytest.raises(ValueError):
            quantize(jnp.zeros(3), "bogus")

    def test_noise_requires_rng(self):
        with pytest.raises(ValueError):
            quantize(jnp.zeros(3), "noise")


class TestPadding:
    def test_pad_crop_roundtrip(self):
        x = jnp.ones((2, 100, 130, 3))
        padded, size = pad_to_multiple(x, 64)
        assert padded.shape == (2, 128, 192, 3)
        assert size == (100, 130)
        np.testing.assert_array_equal(crop_to(padded, size), x)

    def test_already_aligned(self):
        x = jnp.ones((1, 64, 128, 3))
        padded, size = pad_to_multiple(x, 64)
        assert padded.shape == x.shape
