"""Numerical parity against torch reimplementations of the reference formulas.

The RD-parity target (BASELINE.json: ≤0.01 dB / 0.1% bpp drift) hinges on the
entropy-model math matching the PyTorch reference exactly. These tests rebuild
the reference's computations in torch (CPU) from the same parameters and
require agreement to float32 precision.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from spatiotemporalentropymodel_tpu.entropy import (
    EntropyBottleneck,
    gaussian_likelihood,
    get_scale_table,
    update_bottleneck_tables,
)


class TestEntropyBottleneckParity:
    @pytest.fixture(scope="class")
    def setup(self):
        eb = EntropyBottleneck(channels=6)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 6)) * 3
        params = eb.init(
            {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x
        )
        return eb, params["params"], x

    def _torch_logits(self, params, inputs_t):
        """Reference chain (entropy_models.py:388-407) in torch."""
        logits = inputs_t
        n_stages = len([k for k in params if k.startswith("matrix")])
        for i in range(n_stages):
            m = torch.from_numpy(np.asarray(params[f"matrix{i}"]))
            b = torch.from_numpy(np.asarray(params[f"bias{i}"]))
            logits = torch.matmul(F.softplus(m), logits) + b
            if f"factor{i}" in params:
                f_ = torch.from_numpy(np.asarray(params[f"factor{i}"]))
                logits = logits + torch.tanh(f_) * torch.tanh(logits)
        return logits

    def test_likelihood_matches_torch(self, setup):
        eb, params, x = setup
        _, lik = eb.apply({"params": params}, x, train=False)

        # torch mirror: channel-major values, quantize around medians,
        # sigmoid difference with the sign trick
        x_np = np.asarray(x)
        c = x_np.shape[-1]
        values = np.transpose(x_np, (3, 0, 1, 2)).reshape(c, 1, -1)
        med = np.asarray(params["quantiles"])[:, :, 1:2]
        outputs = np.round(values - med) + med
        v_t = torch.from_numpy(outputs)

        lower = self._torch_logits(params, v_t - 0.5)
        upper = self._torch_logits(params, v_t + 0.5)
        sign = -torch.sign(lower + upper)
        lik_t = torch.abs(torch.sigmoid(sign * upper) - torch.sigmoid(sign * lower))
        lik_t = np.transpose(
            lik_t.numpy().reshape(c, *x_np.shape[:3]), (1, 2, 3, 0)
        )
        lik_t = np.maximum(lik_t, 1e-9)
        np.testing.assert_allclose(np.asarray(lik), lik_t, rtol=2e-5, atol=1e-9)

    def test_aux_loss_matches_torch(self, setup):
        eb, params, _ = setup
        aux = float(eb.apply({"params": params}, method="aux_loss"))

        q_t = torch.from_numpy(np.asarray(params["quantiles"]))
        logits = self._torch_logits(params, q_t)
        t = math.log(2 / 1e-9 - 1)
        target = torch.tensor([-t, 0.0, t])
        ref = float(torch.abs(logits - target).sum())
        np.testing.assert_allclose(aux, ref, rtol=1e-5)

    def test_update_pmf_matches_torch(self, setup):
        """The pmf sampled by update() must match a torch evaluation of the
        same quantile-derived support (the ±2-tolerance CDF test of the
        reference, test_entropy_models.py:305-321, is then automatic since
        the quantizer is shared/bit-identical)."""
        eb, params, _ = setup
        tables = update_bottleneck_tables(params)

        q = torch.from_numpy(np.asarray(params["quantiles"], np.float64))
        medians = q[:, 0, 1]
        minima = torch.clamp(torch.ceil(medians - q[:, 0, 0]).int(), min=0)
        maxima = torch.clamp(torch.ceil(q[:, 0, 2] - medians).int(), min=0)
        pmf_length = maxima + minima + 1
        np.testing.assert_array_equal(
            np.asarray(tables.cdf_length), (pmf_length + 2).numpy()
        )
        np.testing.assert_array_equal(
            np.asarray(tables.offset), (-minima).numpy()
        )


class TestGaussianParity:
    def test_likelihood_matches_torch_erfc(self):
        rng = np.random.default_rng(0)
        v = rng.normal(0, 2, (512,)).astype(np.float32)
        s = (np.abs(rng.normal(1, 1, (512,))) + 0.01).astype(np.float32)

        lik = np.asarray(gaussian_likelihood(jnp.asarray(v), jnp.asarray(s)))

        v_t = torch.from_numpy(v)
        s_t = torch.clamp(torch.from_numpy(s), min=0.11)
        const = float(-(2**-0.5))
        vals = torch.abs(v_t)
        upper = 0.5 * torch.erfc(const * ((0.5 - vals) / s_t))
        lower = 0.5 * torch.erfc(const * ((-0.5 - vals) / s_t))
        np.testing.assert_allclose(lik, (upper - lower).numpy(), rtol=2e-5,
                                   atol=1e-12)

    def test_scale_table_matches_torch(self):
        ours = get_scale_table()
        theirs = torch.exp(
            torch.linspace(math.log(0.11), math.log(256), 64)
        ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)
