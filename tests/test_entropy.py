"""Entropy-model tests (reference strategy: compressai_tests/test_entropy_models.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

from spatiotemporalentropymodel_tpu.entropy import (
    CodecTables,
    EntropyBottleneck,
    GaussianConditional,
    build_indexes,
    gaussian_likelihood,
    get_scale_table,
    update_bottleneck_tables,
    update_gaussian_tables,
)
from spatiotemporalentropymodel_tpu.entropy import base as entropy_base


@pytest.fixture(scope="module")
def eb_setup():
    eb = EntropyBottleneck(channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    params = eb.init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}, x)
    return eb, params, x


class TestEntropyBottleneck:
    def test_forward_eval(self, eb_setup):
        eb, params, x = eb_setup
        y_hat, lik = eb.apply(params, x, train=False)
        assert y_hat.shape == x.shape and lik.shape == x.shape
        assert np.all(np.asarray(lik) > 0) and np.all(np.asarray(lik) <= 1)
        # eval forward quantizes around the medians
        med = np.asarray(params["params"]["quantiles"])[:, 0, 1]
        expect = np.round(np.asarray(x) - med) + med
        np.testing.assert_allclose(np.asarray(y_hat), expect, atol=1e-5)

    def test_forward_train_noise(self, eb_setup):
        eb, params, x = eb_setup
        y_hat, lik = eb.apply(
            params, x, train=True, rngs={"noise": jax.random.PRNGKey(3)}
        )
        d = np.asarray(y_hat) - np.asarray(x)
        assert np.all(np.abs(d) <= 0.5) and d.std() > 0.1

    def test_aux_loss_scalar(self, eb_setup):
        eb, params, _ = eb_setup
        loss = eb.apply(params, method="aux_loss")
        assert loss.shape == () and float(loss) > 0

    def test_aux_loss_grad_only_quantiles_path(self, eb_setup):
        eb, params, _ = eb_setup

        def loss_fn(p):
            return eb.apply({"params": p}, method="aux_loss")

        g = jax.grad(loss_fn)(params["params"])
        # stop_gradient on the matrices: only quantiles receive gradient
        assert float(jnp.abs(g["quantiles"]).sum()) > 0
        assert float(jnp.abs(g["matrix0"]).sum()) == 0

    def test_update_and_roundtrip(self, eb_setup):
        eb, params, x = eb_setup
        tables = update_bottleneck_tables(params["params"])
        assert tables.cdf.shape[0] == 8
        assert np.all(tables.cdf_length >= 3)

        z = np.asarray(x)
        strings = entropy_base.bottleneck_compress(z, tables)
        assert len(strings) == 2
        z_hat = entropy_base.bottleneck_decompress(strings, (4, 4), tables)
        med = tables.medians[None, None, None, :]
        np.testing.assert_allclose(z_hat, np.round(z - med) + med, atol=1e-5)

    def test_update_idempotent(self, eb_setup):
        eb, params, _ = eb_setup
        t1 = update_bottleneck_tables(params["params"])
        t2 = update_bottleneck_tables(params["params"])
        np.testing.assert_array_equal(t1.cdf, t2.cdf)


class TestGaussianConditional:
    def test_likelihood_formula(self):
        """Likelihood must equal Φ((0.5−|v|)/σ) − Φ((−0.5−|v|)/σ) with
        erfc-based Φ (entropy_models.py:570-586)."""
        v = np.linspace(-3, 3, 31).astype(np.float32)
        s = np.full_like(v, 0.7)
        lk = np.asarray(gaussian_likelihood(jnp.array(v), jnp.array(s)))

        def phi(x):
            return 0.5 * scipy.special.erfc(-(2**-0.5) * x)

        ref = phi((0.5 - np.abs(v)) / 0.7) - phi((-0.5 - np.abs(v)) / 0.7)
        np.testing.assert_allclose(lk, ref, rtol=1e-5)

    def test_scale_lower_bound(self):
        lk_small = gaussian_likelihood(jnp.zeros(1), jnp.array([1e-6]))
        lk_bound = gaussian_likelihood(jnp.zeros(1), jnp.array([0.11]))
        np.testing.assert_allclose(np.asarray(lk_small), np.asarray(lk_bound))

    def test_module_forward(self):
        gc = GaussianConditional()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8))
        scales = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), x.shape)) + 0.2
        means = jax.random.normal(jax.random.PRNGKey(2), x.shape) * 0.1
        params = gc.init(jax.random.PRNGKey(3), x, scales, means)
        out, lik = gc.apply(params, x, scales, means, train=False)
        np.testing.assert_allclose(
            np.asarray(out),
            np.round(np.asarray(x) - np.asarray(means)) + np.asarray(means),
            atol=1e-5,
        )
        assert np.all(np.asarray(lik) > 0)

    def test_build_indexes_matches_reference_loop(self):
        table = get_scale_table()
        scales = np.abs(np.random.default_rng(0).normal(1, 2, (2, 5, 5, 3))) + 0.01
        idx = np.asarray(build_indexes(jnp.array(scales), table))

        # reference semantics (entropy_models.py:598-604)
        s = np.maximum(scales, 0.11)
        ref = np.full(s.shape, len(table) - 1, np.int32)
        for t in table[:-1]:
            ref -= (s <= t).astype(np.int32)
        np.testing.assert_array_equal(idx, ref)

    def test_update_tables(self):
        tables = update_gaussian_tables()
        assert tables.cdf.shape[0] == 64
        assert np.all(tables.offset <= 0)
        assert np.all(tables.cdf_length == -2 * tables.offset + 1 + 2)
        # each row must be a valid cdf
        for i in range(tables.rows):
            row = tables.cdf[i, : tables.cdf_length[i]]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert np.all(np.diff(row) >= 1)

    def test_gaussian_roundtrip_with_means(self):
        tables = update_gaussian_tables()
        rng = np.random.default_rng(1)
        scales = np.abs(rng.normal(1.0, 1.0, (2, 6, 6, 4))).astype(np.float32) + 0.05
        means = rng.normal(0, 1, scales.shape).astype(np.float32)
        y = rng.normal(0, 1.2, scales.shape).astype(np.float32) + means

        idx = np.asarray(build_indexes(jnp.array(scales), tables.scale_table))
        symbols = np.round(y - means).astype(np.int32)
        strings = entropy_base.compress(symbols, idx, tables)
        decoded = entropy_base.decompress(strings, idx, tables)
        np.testing.assert_array_equal(decoded, symbols)
        y_hat = decoded + means
        np.testing.assert_allclose(y_hat, np.round(y - means) + means, atol=1e-5)


class TestCodecTables:
    def test_dict_roundtrip(self):
        t = update_gaussian_tables()
        t2 = CodecTables.fromdict(t.asdict())
        np.testing.assert_array_equal(t.cdf, t2.cdf)
        np.testing.assert_array_equal(t.scale_table, t2.scale_table)

    def test_lut_cache_is_per_instance(self):
        """Regression: the decode LUT must be cached on the tables instance,
        never keyed by id() — id reuse after GC once caused decodes with a
        stale LUT after update(force=True) rebuilt the tables."""
        import gc

        from spatiotemporalentropymodel_tpu.coders import get_coder
        from spatiotemporalentropymodel_tpu.entropy.base import get_lut

        coder = get_coder("rans")
        t1 = update_gaussian_tables(tail_mass=1e-9)
        lut1 = get_lut(t1, coder)
        assert get_lut(t1, coder) is lut1  # cached on the instance
        del t1
        gc.collect()
        t2 = update_gaussian_tables(tail_mass=1e-6)  # different tables
        lut2 = get_lut(t2, coder)
        fresh = coder.build_lut(t2.cdf, t2.cdf_length)
        np.testing.assert_array_equal(lut2.lut, fresh.lut)
        np.testing.assert_array_equal(lut2.dom, fresh.dom)


class TestSolveQuantiles:
    def test_closed_form_aux_solution(self):
        """solve_quantiles drives |logits(q) − target| to ~0 — the optimum
        the reference's separate aux Adam descends toward
        (entropy_models.py:383-386)."""
        import jax
        import jax.numpy as jnp

        from spatiotemporalentropymodel_tpu.entropy import EntropyBottleneck
        from spatiotemporalentropymodel_tpu.entropy.bottleneck import (
            _np_logits_cumulative,
            solve_quantiles,
        )

        eb = EntropyBottleneck(8)
        params = eb.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 4, 4, 8)),
            train=False,
        )["params"]
        params = jax.tree_util.tree_map(np.asarray, params)
        # a well-conditioned logits chain (positive softplus weights)
        for k in list(params):
            if k.startswith("matrix"):
                params[k] = np.full_like(params[k], np.log(np.expm1(0.8)))

        tail_mass = 1e-9
        q = solve_quantiles(params, tail_mass)
        target = np.log(2.0 / tail_mass - 1.0)
        logits = _np_logits_cumulative(params, q)
        np.testing.assert_allclose(
            logits[:, 0, :],
            np.tile([-target, 0.0, target], (8, 1)),
            atol=1e-6,
        )
        # monotone: lower tail < median < upper tail
        assert (q[:, 0, 0] < q[:, 0, 1]).all()
        assert (q[:, 0, 1] < q[:, 0, 2]).all()
