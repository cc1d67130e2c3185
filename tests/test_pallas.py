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


class TestFusedIGDNDeconv:
    """igdn_deconv_fused — the g_s-tail fusion (IGDN → narrow deconv)."""

    def _weights(self, c, f=3, k=5, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        gamma_t = jnp.abs(jax.random.normal(ks[0], (c, c))) * 0.01
        beta = jnp.ones(c)
        kernel = jax.random.normal(ks[1], (k, k, c, f)) * 0.05
        bias = jax.random.normal(ks[2], (f,)) * 0.1
        return gamma_t, beta, kernel, bias

    @pytest.mark.parametrize("shape", [(1, 8, 12, 192), (2, 6, 10, 64),
                                       (1, 7, 5, 32)])
    def test_matches_composition(self, shape):
        c = shape[-1]
        x = jax.random.normal(jax.random.PRNGKey(1), shape) * 0.5
        gamma_t, beta, kernel, bias = self._weights(c)
        ref = pk._igdn_deconv_ref(x, gamma_t, beta, kernel, bias, 2)
        got = pk.igdn_deconv_fused(x, gamma_t, beta, kernel, bias, 2, True)
        assert got.shape == (shape[0], 2 * shape[1], 2 * shape[2], 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    def test_gradients_match_composition(self):
        c = 32
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 6, c)) * 0.5
        gamma_t, beta, kernel, bias = self._weights(c)

        gf = jax.grad(
            lambda *a: pk.igdn_deconv_fused(*a, 2, True).sum(),
            argnums=(0, 1, 2, 3, 4))(x, gamma_t, beta, kernel, bias)
        gr = jax.grad(
            lambda *a: pk._igdn_deconv_ref(*a, 2).sum(),
            argnums=(0, 1, 2, 3, 4))(x, gamma_t, beta, kernel, bias)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)

    def test_sequential_peephole_matches_and_keeps_params(self, monkeypatch):
        # force the TPU-only peephole on (interpret-mode kernel) and check
        # the fused Sequential matches the plain chain with IDENTICAL params
        from spatiotemporalentropymodel_tpu.layers import (
            GDN, Deconv, Sequential)

        seq = Sequential([GDN(48, inverse=True), Deconv(3, 5, 2)])
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 8, 48)) * 0.5
        params = seq.init(jax.random.PRNGKey(4), x)
        y_plain = seq.apply(params, x)

        orig = pk.igdn_deconv_fused
        monkeypatch.setattr(pk, "igdn_deconv_applicable",
                            lambda *a, **k: True)
        monkeypatch.setattr(
            pk, "igdn_deconv_fused",
            lambda x_, gt, b, k_, bs, s=2: orig(x_, gt, b, k_, bs, s, True))
        params_fused = seq.init(jax.random.PRNGKey(4), x)
        y_fused = seq.apply(params_fused, x)

        assert jax.tree_util.tree_structure(
            params) == jax.tree_util.tree_structure(params_fused)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params_fused)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                                   atol=2e-4)

    def test_bf16_io(self):
        c = 64
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, c),
                              jnp.bfloat16)
        gamma_t, beta, kernel, bias = self._weights(c)
        got = pk.igdn_deconv_fused(x, gamma_t, beta, kernel, bias, 2, True)
        assert got.dtype == jnp.bfloat16
        ref = pk._igdn_deconv_ref(x.astype(jnp.float32), gamma_t, beta,
                                  kernel, bias, 2)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref), atol=6e-2, rtol=3e-2)


class TestFusedGDNConv:
    """gdn_conv_fused — the g_a-trunk fusion (GDN → k5 s2 conv)."""

    def _weights(self, c, o, k=5, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        gamma_t = jnp.abs(jax.random.normal(ks[0], (c, c))) * 0.01
        beta = jnp.ones(c)
        kernel = jax.random.normal(ks[1], (k, k, c, o)) * 0.05
        bias = jax.random.normal(ks[2], (o,)) * 0.1
        return gamma_t, beta, kernel, bias

    @pytest.mark.parametrize("shape,o", [((1, 8, 16, 64), 48),
                                         ((2, 12, 20, 32), 40),
                                         ((1, 6, 10, 16), 16)])
    def test_matches_composition(self, shape, o):
        c = shape[-1]
        x = jax.random.normal(jax.random.PRNGKey(1), shape) * 0.5
        gamma_t, beta, kernel, bias = self._weights(c, o)
        ref = pk._gdn_conv_ref(x, gamma_t, beta, kernel, bias)
        got = pk.gdn_conv_fused(x, gamma_t, beta, kernel, bias, True)
        assert got.shape == (shape[0], shape[1] // 2, shape[2] // 2, o)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    @pytest.mark.parametrize("shape,o", [((1, 8, 16, 64), 48),
                                         ((2, 12, 20, 32), 40)])
    def test_halo_variant_matches_composition(self, shape, o, monkeypatch):
        """The non-default `_GDN_CONV_HALO=True` input path (three standard
        block-indexed operands) must stay exact — it is kept as a measured
        A/B variant (artifacts/gdn_halo_ab.json)."""
        monkeypatch.setattr(pk, "_GDN_CONV_HALO", True)
        c = shape[-1]
        x = jax.random.normal(jax.random.PRNGKey(7), shape) * 0.5
        gamma_t, beta, kernel, bias = self._weights(c, o)
        ref = pk._gdn_conv_ref(x, gamma_t, beta, kernel, bias)
        got = pk.gdn_conv_fused(x, gamma_t, beta, kernel, bias, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    @pytest.mark.parametrize("shape,o,th", [((1, 8, 16, 64), 48, 2),
                                            ((2, 12, 20, 32), 40, 2),
                                            ((1, 16, 16, 64), 48, 4),
                                            ((2, 32, 16, 32), 24, 8)])
    def test_dma_variant_matches_composition(self, shape, o, th,
                                             monkeypatch):
        """The rolling-window DMA input path (`_GDN_CONV_DMA="1"`, round
        5): x fed from HBM by per-stripe async copies of only the NEW
        rows, halo pairs reused via the persistent-window shift, next
        stripe prefetched under the dots. Must stay exact at every stripe
        height and across frame boundaries (the boot/steady/shift logic —
        see artifacts/gdn_dma_ab.json)."""
        monkeypatch.setattr(pk, "_GDN_CONV_DMA", "1")
        monkeypatch.setattr(pk, "_GDN_CONV_TH", th)
        c = shape[-1]
        x = jax.random.normal(jax.random.PRNGKey(11), shape) * 0.5
        gamma_t, beta, kernel, bias = self._weights(c, o)
        ref = pk._gdn_conv_ref(x, gamma_t, beta, kernel, bias)
        got = pk.gdn_conv_fused(x, gamma_t, beta, kernel, bias, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    def test_conv_only_mode(self):
        c, o = 32, 24
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 12, c)) * 0.5
        _, _, kernel, bias = self._weights(c, o)
        ref = jax.lax.conv_general_dilated(
            x, kernel, (2, 2), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        got = pk.gdn_conv_fused(x, None, None, kernel, bias, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    def test_gradients_match_composition(self):
        c, o = 32, 24
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 12, c)) * 0.5
        gamma_t, beta, kernel, bias = self._weights(c, o)

        gf = jax.grad(
            lambda *a: pk.gdn_conv_fused(*a, True).sum(),
            argnums=(0, 1, 2, 3, 4))(x, gamma_t, beta, kernel, bias)
        gr = jax.grad(
            lambda *a: pk._gdn_conv_ref(*a).sum(),
            argnums=(0, 1, 2, 3, 4))(x, gamma_t, beta, kernel, bias)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    def test_bf16_io(self):
        c, o = 64, 64
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 16, c),
                              jnp.bfloat16)
        gamma_t, beta, kernel, bias = self._weights(c, o)
        got = pk.gdn_conv_fused(x, gamma_t, beta, kernel, bias, True)
        assert got.dtype == jnp.bfloat16
        ref = pk._gdn_conv_ref(x.astype(jnp.float32), gamma_t, beta,
                               kernel, bias)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref), atol=6e-2, rtol=3e-2)

    def test_sequential_peephole_params_identical(self):
        """The GDN→Conv peephole must not change param trees or outputs
        (it only fires on TPU; on CPU this pins the non-fused equality and
        the return_weights plumbing)."""
        from spatiotemporalentropymodel_tpu.layers.conv import (
            Conv,
            Sequential,
        )
        from spatiotemporalentropymodel_tpu.layers.gdn import GDN

        seq = Sequential([Conv(32, 5, 2), GDN(32), Conv(32, 5, 2)],
                         name="seq")
        x = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 16, 3)) * 0.5
        params = seq.init(jax.random.PRNGKey(0), x)
        y = seq.apply(params, x)
        assert y.shape == (1, 4, 4, 32)


class TestFusedIGDNDeconvWide:
    """igdn_deconv_wide — the g_s interior fusion (IGDN → wide deconv)."""

    def _weights(self, c, o, k=5, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        gamma_t = jnp.abs(jax.random.normal(ks[0], (c, c))) * 0.01
        beta = jnp.ones(c)
        kernel = jax.random.normal(ks[1], (k, k, c, o)) * 0.05
        bias = jax.random.normal(ks[2], (o,)) * 0.1
        return gamma_t, beta, kernel, bias

    @pytest.mark.parametrize("shape,o", [((1, 4, 8, 64), 48),
                                         ((2, 6, 10, 32), 40)])
    def test_matches_composition(self, shape, o):
        c = shape[-1]
        x = jax.random.normal(jax.random.PRNGKey(1), shape) * 0.5
        gamma_t, beta, kernel, bias = self._weights(c, o)
        ref = pk._igdn_deconv_ref(x, gamma_t, beta, kernel, bias, 2)
        got = pk.igdn_deconv_wide(x, gamma_t, beta, kernel, bias, True)
        assert got.shape == (shape[0], 2 * shape[1], 2 * shape[2], o)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    def test_gradients_match_composition(self):
        c, o = 32, 24
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 6, c)) * 0.5
        gamma_t, beta, kernel, bias = self._weights(c, o)
        gf = jax.grad(
            lambda *a: pk.igdn_deconv_wide(*a, True).sum(),
            argnums=(0, 1, 2, 3, 4))(x, gamma_t, beta, kernel, bias)
        gr = jax.grad(
            lambda *a: pk._igdn_deconv_ref(*a, 2).sum(),
            argnums=(0, 1, 2, 3, 4))(x, gamma_t, beta, kernel, bias)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    def test_bf16_io(self):
        c, o = 64, 64
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8, c),
                              jnp.bfloat16)
        gamma_t, beta, kernel, bias = self._weights(c, o)
        got = pk.igdn_deconv_wide(x, gamma_t, beta, kernel, bias, True)
        assert got.dtype == jnp.bfloat16
        ref = pk._igdn_deconv_ref(x.astype(jnp.float32), gamma_t, beta,
                                  kernel, bias, 2)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref), atol=6e-2, rtol=3e-2)


class TestPackedGsChain:
    """Packed g_s chain (VERDICT r3 #4): igdn_deconv_wide_packed emits the
    phase-major pre-shuffle layout, igdn_deconv_tail_packed consumes it —
    the shuffled intermediate never materializes. Both must equal the XLA
    composition, individually and chained."""

    def _weights(self, c, o, k=5, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        gamma_t = jnp.abs(jax.random.normal(ks[0], (c, c))) * 0.01
        beta = jnp.ones(c)
        kernel = jax.random.normal(ks[1], (k, k, c, o)) * 0.05
        bias = jax.random.normal(ks[2], (o,)) * 0.1
        return gamma_t, beta, kernel, bias

    def test_wide_packed_matches_shuffled(self):
        c, o = 32, 40
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, c)) * 0.5
        gamma_t, beta, kernel, bias = self._weights(c, o)
        packed = pk.igdn_deconv_wide_packed(x, gamma_t, beta, kernel, bias,
                                            True)
        assert packed.shape == (1, 4, 8, 4 * o)
        unpacked = pk._unpack_phase_major(packed, o)
        ref = pk._igdn_deconv_ref(x, gamma_t, beta, kernel, bias, 2)
        np.testing.assert_allclose(np.asarray(unpacked), np.asarray(ref),
                                   atol=2e-4)

    @pytest.mark.parametrize("shape,f", [((1, 4, 8, 4 * 32), 3),
                                         ((2, 3, 9, 4 * 16), 4)])
    def test_tail_packed_matches_composition(self, shape, f):
        c = shape[-1] // 4
        xp = jax.random.normal(jax.random.PRNGKey(2), shape) * 0.5
        gamma_t, beta, kernel, bias = self._weights(c, f)
        got = pk.igdn_deconv_tail_packed(xp, gamma_t, beta, kernel, bias,
                                         True)
        ref = pk._igdn_deconv_tail_packed_ref(xp, gamma_t, beta, kernel,
                                              bias)
        assert got.shape == (shape[0], 4 * shape[1], 4 * shape[2], f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    def test_full_packed_chain_matches_unfused(self):
        """wide_packed → tail_packed == IGDN→deconv→IGDN→deconv (XLA)."""
        c, o, f = 24, 32, 3
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 6, c)) * 0.5
        g1, b1, k1, s1 = self._weights(c, o, seed=4)
        g2, b2, k2, s2 = self._weights(o, f, seed=5)
        mid_ref = pk._igdn_deconv_ref(x, g1, b1, k1, s1, 2)
        ref = pk._igdn_deconv_ref(mid_ref, g2, b2, k2, s2, 2)
        packed = pk.igdn_deconv_wide_packed(x, g1, b1, k1, s1, True)
        got = pk.igdn_deconv_tail_packed(packed, g2, b2, k2, s2, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-4)

    def test_tail_packed_gradients_match(self):
        c, f = 16, 3
        xp = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 5, 4 * c)) * 0.5
        gamma_t, beta, kernel, bias = self._weights(c, f)
        gf = jax.grad(
            lambda *a: pk.igdn_deconv_tail_packed(*a, True).sum(),
            argnums=(0, 1, 2, 3, 4))(xp, gamma_t, beta, kernel, bias)
        gr = jax.grad(
            lambda *a: pk._igdn_deconv_tail_packed_ref(*a).sum(),
            argnums=(0, 1, 2, 3, 4))(xp, gamma_t, beta, kernel, bias)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    def test_bf16_io(self):
        c, o, f = 64, 32, 3
        x = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 8, c),
                              jnp.bfloat16)
        g1, b1, k1, s1 = self._weights(c, o, seed=8)
        g2, b2, k2, s2 = self._weights(o, f, seed=9)
        packed = pk.igdn_deconv_wide_packed(x, g1, b1, k1, s1, True)
        got = pk.igdn_deconv_tail_packed(packed, g2, b2, k2, s2, True)
        assert got.dtype == jnp.bfloat16
        mid = pk._igdn_deconv_ref(x.astype(jnp.float32), g1, b1, k1, s1, 2)
        ref = pk._igdn_deconv_ref(mid, g2, b2, k2, s2, 2)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref), atol=6e-2, rtol=3e-2)

    def test_sequential_quadruple_peephole(self, monkeypatch):
        """The packed g_s quadruple peephole (GDN⁻¹→Deconv→GDN⁻¹→Deconv)
        must match the plain chain with identical params."""
        from spatiotemporalentropymodel_tpu.layers import (
            GDN, Deconv, Sequential)

        seq = Sequential([GDN(24, inverse=True), Deconv(32, 5, 2),
                          GDN(32, inverse=True), Deconv(3, 5, 2)])
        x = jax.random.normal(jax.random.PRNGKey(10), (1, 4, 6, 24)) * 0.5
        params = seq.init(jax.random.PRNGKey(11), x)
        y_plain = seq.apply(params, x)

        ow = pk.igdn_deconv_wide_packed
        ot = pk.igdn_deconv_tail_packed
        monkeypatch.setattr(pk, "igdn_deconv_wide_packed_applicable",
                            lambda *a, **k: True)
        monkeypatch.setattr(pk, "igdn_deconv_tail_packed_applicable",
                            lambda *a, **k: True)
        monkeypatch.setattr(pk, "igdn_deconv_wide_packed",
                            lambda *a: ow(*a, True))
        monkeypatch.setattr(pk, "igdn_deconv_tail_packed",
                            lambda *a: ot(*a, True))
        params_fused = seq.init(jax.random.PRNGKey(11), x)
        y_fused = seq.apply(params_fused, x)

        assert jax.tree_util.tree_structure(
            params) == jax.tree_util.tree_structure(params_fused)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params_fused)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                                   atol=5e-4)
