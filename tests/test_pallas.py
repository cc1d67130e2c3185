"""Pallas kernel parity tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatiotemporalentropymodel_tpu.entropy import get_scale_table
from spatiotemporalentropymodel_tpu.ops import pallas_kernels as pk


class TestFusedGDN:
    @pytest.mark.parametrize("inverse", [False, True])
    def test_matches_reference(self, inverse):
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 4, 4, 128))
        gamma_t = 0.1 * jnp.eye(128) + 0.01
        beta = jnp.ones(128)

        ref = pk._gdn_ref(
            x.reshape(-1, 128).astype(jnp.float32), gamma_t, beta, inverse
        ).reshape(x.shape)
        out = pk.gdn_fused(x, gamma_t, beta, inverse, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_gradients_match_reference(self):
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (1, 2, 2, 128))
        gamma_t = 0.1 * jnp.eye(128) + 0.01
        beta = jnp.ones(128)

        def loss_fused(x_, g_, b_):
            return pk.gdn_fused(x_, g_, b_, False, True).sum()

        def loss_ref(x_, g_, b_):
            return pk._gdn_ref(
                x_.reshape(-1, 128).astype(jnp.float32), g_, b_, False
            ).sum()

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma_t, beta)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma_t, beta)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)

    def test_nonaligned_rows(self):
        # row count not a multiple of the tile — edge blocks must be masked
        rng = jax.random.PRNGKey(2)
        x = jax.random.normal(rng, (1, 3, 7, 128))  # 21 rows
        gamma_t = 0.1 * jnp.eye(128)
        beta = jnp.ones(128)
        ref = pk._gdn_ref(
            x.reshape(-1, 128).astype(jnp.float32), gamma_t, beta, False
        ).reshape(x.shape)
        out = pk.gdn_fused(x, gamma_t, beta, False, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    @pytest.mark.parametrize(
        "shape,inverse,fold",
        [
            ((2, 4, 6, 192), False, 2),  # 384 lanes = 3 native tiles
            ((2, 4, 6, 192), True, 2),
            ((1, 4, 4, 64), False, 2),   # exactly 128 lanes
            ((1, 2, 4, 48), False, 8),   # 384 lanes from a narrow channel
        ],
    )
    def test_lane_fold_matches_reference(self, shape, inverse, fold):
        # the lane-aligned fold (gdn_tune3/4) must be a pure layout change
        # (production uses fold=1 — the in-chain relayout eats the win —
        # but the folded math stays available for lane-aligned callers)
        c = shape[-1]
        rng = jax.random.PRNGKey(3)
        x = jax.random.normal(rng, shape)
        gamma_t = jnp.abs(jax.random.normal(jax.random.PRNGKey(4),
                                            (c, c))) * 0.01
        beta = jnp.ones(c)
        ref = pk._gdn_ref(
            x.reshape(-1, c).astype(jnp.float32), gamma_t, beta, inverse
        ).reshape(shape)
        out = pk._gdn_pallas(
            x.reshape(-1, c), gamma_t, beta, inverse, interpret=True,
            fold=fold,
        ).reshape(shape)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_lane_fold_bf16_io(self):
        # bf16 activations keep bf16 I/O through the folded kernel
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 6, 192),
                              jnp.bfloat16)
        gamma_t = 0.1 * jnp.eye(192) + 0.01
        beta = jnp.ones(192)
        out = pk._gdn_pallas(x.reshape(-1, 192), gamma_t, beta, False,
                             interpret=True, fold=2).reshape(x.shape)
        assert out.dtype == jnp.bfloat16
        ref = pk._gdn_ref(
            x.reshape(-1, 192).astype(jnp.float32), gamma_t, beta, False
        ).reshape(x.shape)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=5e-2,
            rtol=2e-2)


class TestQuantizeAndIndex:
    def test_matches_reference(self):
        rng = np.random.default_rng(0)
        shape = (1, 4, 4, 128)
        y = jnp.asarray(rng.normal(0, 3, shape), jnp.float32)
        means = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
        scales = jnp.asarray(np.abs(rng.normal(1, 2, shape)) + 0.01,
                             jnp.float32)
        table = get_scale_table()

        sym_ref, idx_ref = pk._qidx_ref(y, means, scales, jnp.asarray(table),
                                        0.11)
        sym, idx = pk.quantize_and_index(y, means, scales, table,
                                         interpret=True)
        np.testing.assert_array_equal(np.asarray(sym), np.asarray(sym_ref))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))

    def test_index_range(self):
        table = get_scale_table()
        scales = jnp.asarray([[0.01, 0.11, 1.0, 300.0]], jnp.float32)
        y = jnp.zeros_like(scales)
        _, idx = pk.quantize_and_index(y, y, scales, table, interpret=True)
        idx = np.asarray(idx)
        assert idx[0, 0] == 0  # below bound → first row
        assert idx[0, -1] == len(table) - 1  # above max → last row
