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

    def test_msssim_parity_with_transcribed_oracle(self):
        """Parity vs a TRANSCRIBED oracle of pytorch_msssim's algorithm.

        Disclosure: the canonical package (the one the reference evaluates
        with, stem/evalSTEM.py:16) is not installed on this box and there is
        no network egress, so the oracle below is a transcription of its
        published computation — separable gaussian filter, per-channel
        cs/ssim means, relu'd stack, weighted product, final mean — NOT an
        import of the package itself. Golden values for the three pairs are
        additionally pinned (test_msssim_golden_values) so a future edit to
        either side trips loudly."""
        import torch
        import torch.nn.functional as F

        def torch_ms_ssim(x, y, data_range=1.0, win_size=11, win_sigma=1.5):
            weights = torch.tensor([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
            coords = torch.arange(win_size, dtype=torch.float32) - win_size // 2
            g = torch.exp(-(coords**2) / (2 * win_sigma**2))
            g /= g.sum()
            win = g.reshape(1, 1, 1, win_size)

            def gaussian_filter(inp):
                c = inp.shape[1]
                out = F.conv2d(inp, win.expand(c, 1, 1, win_size), groups=c)
                return F.conv2d(
                    out, win.transpose(2, 3).expand(c, 1, win_size, 1), groups=c
                )

            def _ssim(X, Y):
                K1, K2 = 0.01, 0.03
                C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
                mu1, mu2 = gaussian_filter(X), gaussian_filter(Y)
                mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
                sigma1_sq = gaussian_filter(X * X) - mu1_sq
                sigma2_sq = gaussian_filter(Y * Y) - mu2_sq
                sigma12 = gaussian_filter(X * Y) - mu1_mu2
                cs_map = (2 * sigma12 + C2) / (sigma1_sq + sigma2_sq + C2)
                ssim_map = (
                    (2 * mu1_mu2 + C1) / (mu1_sq + mu2_sq + C1)
                ) * cs_map
                return (
                    ssim_map.flatten(2).mean(-1),
                    cs_map.flatten(2).mean(-1),
                )

            mcs = []
            for i in range(len(weights)):
                ssim_pc, cs = _ssim(x, y)
                if i < len(weights) - 1:
                    mcs.append(F.relu(cs))
                    padding = [s % 2 for s in x.shape[2:]]
                    x = F.avg_pool2d(x, kernel_size=2, padding=padding)
                    y = F.avg_pool2d(y, kernel_size=2, padding=padding)
            mcs_and_ssim = torch.stack(mcs + [F.relu(ssim_pc)], dim=0)
            val = torch.prod(mcs_and_ssim ** weights.view(-1, 1, 1), dim=0)
            return val.mean()

        for (sigma_n, size), a, b in self._pairs():
            ours = float(ms_ssim(jnp.asarray(a), jnp.asarray(b)))
            theirs = float(
                torch_ms_ssim(
                    torch.from_numpy(a.transpose(0, 3, 1, 2)),
                    torch.from_numpy(b.transpose(0, 3, 1, 2)),
                )
            )
            np.testing.assert_allclose(ours, theirs, atol=1e-4)

    @staticmethod
    def _pairs():
        """Three structured 'real image'-like pairs (incl. odd dims)."""
        rng = np.random.default_rng(2)
        yy, xx = np.mgrid[0:192, 0:192].astype(np.float32) / 192.0
        base = np.stack([yy, xx, 0.5 * (xx + yy)], axis=-1)
        base[40:120, 60:150] += 0.3
        base = np.clip(base + 0.05 * rng.standard_normal(base.shape), 0, 1)
        out = []
        for sigma_n, size in ((0.03, 192), (0.08, 177), (0.15, 192)):
            a = base[None, :size, :size].astype(np.float32)
            b = np.clip(
                a + rng.normal(0, sigma_n, a.shape), 0, 1
            ).astype(np.float32)
            out.append(((sigma_n, size), a, b))
        return out

    def test_msssim_golden_values(self):
        """Golden values pinned for the three oracle pairs: a future edit to
        ms_ssim OR to the pair construction trips this regardless of whether
        the transcribed torch oracle moved in lockstep."""
        golden = [0.9690148830413818, 0.844976544380188, 0.6713430285453796]
        for ((_, _), a, b), want in zip(self._pairs(), golden):
            got = float(ms_ssim(jnp.asarray(a), jnp.asarray(b)))
            np.testing.assert_allclose(got, want, atol=2e-5)

    def test_msssim_rejects_too_small(self):
        """Inputs too small for 5 scales raise (pytorch_msssim asserts the
        same bound; silently they produce NaN from empty conv outputs)."""
        x = jnp.ones((1, 160, 160, 3)) * 0.5
        with pytest.raises(ValueError, match="min\\(H, W\\)"):
            ms_ssim(x, x)

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

    def test_actual_nested_groups(self):
        # charm layout: per-batch *per-group* y streams, one level deeper —
        # a shallow len() would count the group list length (regression for
        # the bake-off undercount)
        strings = [[[b"abc", b"d"]], [b"ef"]]
        assert actual_bpp(strings, 48) == 1.0

    def test_actual_counts_side_info(self):
        # counts ride the container varint-packed (transport.pack_counts):
        # 2-byte header + 1 byte n_used per all-zero vector = 3 bytes
        assert actual_bpp([[b""], [b""]], 8,
                          counts=np.zeros((1, 1, 3))) == 3.0

    def test_actual_counts_matches_container(self):
        from spatiotemporalentropymodel_tpu.entropy.transport import (
            pack_counts,
        )

        counts = np.zeros((2, 64), np.int64)
        counts[0, [3, 10, 63]] = [1, 300, 2**20]
        counts[1, 5] = 70000
        want = len(pack_counts(counts))
        assert actual_bpp([[b""], [b""]], 1, counts=counts) == want * 8
