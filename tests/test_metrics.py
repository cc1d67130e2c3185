"""Metric tests: PSNR identities, MS-SSIM sanity + parity vs pytorch_msssim."""

import jax.numpy as jnp
import numpy as np
import pytest

from spatiotemporalentropymodel_tpu.eval.metrics import (
    actual_bpp,
    estimate_bpp,
    ms_ssim,
    psnr,
    ssim,
)


class TestPSNR:
    def test_identical_is_inf(self):
        x = jnp.ones((1, 8, 8, 3)) * 0.5
        assert float(psnr(x, x)) == float("inf")

    def test_known_value(self):
        a = jnp.zeros((1, 8, 8, 3))
        b = jnp.full((1, 8, 8, 3), 0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)


class TestSSIM:
    def test_identical(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        assert float(ssim(x, x)) > 0.999

    def test_degrades_with_noise(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        y = x + jnp.asarray(rng.normal(0, 0.1, x.shape), jnp.float32)
        assert float(ssim(x, x)) > float(ssim(x, y))

    def test_msssim_parity_with_pytorch_msssim(self):
        try:
            from pytorch_msssim import ms_ssim as torch_msssim
        except ImportError:
            pytest.skip("pytorch_msssim not installed")
        import torch

        rng = np.random.default_rng(2)
        a = rng.random((1, 192, 192, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
        ours = float(ms_ssim(jnp.asarray(a), jnp.asarray(b)))
        theirs = float(
            torch_msssim(
                torch.from_numpy(a.transpose(0, 3, 1, 2)),
                torch.from_numpy(b.transpose(0, 3, 1, 2)),
                data_range=1.0,
            )
        )
        np.testing.assert_allclose(ours, theirs, atol=5e-3)

    def test_msssim_monotone(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((1, 192, 192, 3)), jnp.float32)
        y1 = x + jnp.asarray(rng.normal(0, 0.02, x.shape), jnp.float32)
        y2 = x + jnp.asarray(rng.normal(0, 0.2, x.shape), jnp.float32)
        assert float(ms_ssim(x, y1)) > float(ms_ssim(x, y2))


class TestBpp:
    def test_estimate(self):
        lk = {"y": jnp.full((1, 4, 4, 2), 0.5)}
        # 32 symbols at p=0.5 → 32 bits over 16 pixels = 2 bpp
        np.testing.assert_allclose(float(estimate_bpp(lk, 16)), 2.0, rtol=1e-6)

    def test_actual(self):
        strings = [[b"abcd"], [b"ef"]]
        assert actual_bpp(strings, 48) == 1.0
