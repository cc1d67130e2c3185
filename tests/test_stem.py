"""STEM P-frame model tests — the reference has NO tests for
spatiotemporalpriors.py (SURVEY.md §4 gap); these close it with forward
contracts and real bitstream round-trips for all five variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatiotemporalentropymodel_tpu.models import (
    STEM_VARIANTS,
    SpatioTemporalPriorModel,
)

M = 24  # latent channels (192 in the paper; small here for test speed)
EBC = 32


def _latents(b=1, hw=8, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    y_cur = jax.random.normal(k1, (b, hw, hw, M))
    y_cond = y_cur + 0.3 * jax.random.normal(k2, (b, hw, hw, M))
    return y_cur, y_cond


def _make(variant):
    m = SpatioTemporalPriorModel(
        variant=variant, entropy_bottleneck_channels=EBC, in_channels=M
    )
    y_cur, y_cond = _latents()
    m.init(y_cur, y_cond)
    return m


class TestForward:
    @pytest.mark.parametrize("variant", STEM_VARIANTS)
    def test_contract(self, variant):
        m = _make(variant)
        y_cur, y_cond = _latents()
        out = m.forward(y_cur, y_cond)
        assert set(out) == {"y_hat", "likelihoods"}
        assert out["y_hat"].shape == y_cur.shape
        assert out["likelihoods"]["y"].shape == y_cur.shape
        assert out["likelihoods"]["z"].shape == (1, 2, 2, EBC)
        lk = np.asarray(out["likelihoods"]["y"])
        assert np.all(lk > 0) and np.all(lk <= 1)

    @pytest.mark.parametrize("variant", ["res", "without_spm"])
    def test_train_noise(self, variant):
        m = _make(variant)
        y_cur, y_cond = _latents()
        out = m.forward(y_cur, y_cond, train=True)
        assert out["y_hat"].shape == y_cur.shape

    def test_res_reconstruction_identity(self):
        """Res variant: y_hat = round(y_cur − y_cond) + y_cond in eval."""
        m = _make("res")
        y_cur, y_cond = _latents()
        out = m.forward(y_cur, y_cond)
        expect = np.round(np.asarray(y_cur) - np.asarray(y_cond)) + np.asarray(y_cond)
        np.testing.assert_allclose(np.asarray(out["y_hat"]), expect, atol=1e-5)

    def test_aux_loss(self):
        m = _make("res")
        assert float(m.aux_loss()) > 0


class TestCodec:
    @pytest.mark.parametrize("variant", ["without_spm_tpm", "without_spm"])
    def test_parallel_roundtrip(self, variant):
        m = _make(variant)
        y_cur, y_cond = _latents(b=2)
        m.update()
        enc = m.compress(y_cur, y_cond)
        assert len(enc["strings"]) == 2 and enc["shape"] == (2, 2)
        dec = m.decompress(enc["strings"], enc["shape"], y_cond)
        # decoded y_hat must equal eval-forward quantization exactly
        # (parallel variants: round(target - mu) + mu [+ y_cond])
        fwd = m.forward(y_cur, y_cond)
        np.testing.assert_allclose(
            np.asarray(dec["y_hat"]), np.asarray(fwd["y_hat"]), atol=1e-4
        )

    @pytest.mark.slow
    @pytest.mark.parametrize("variant", ["without_tpm", "full", "res"])
    def test_ar_roundtrip(self, variant):
        m = _make(variant)
        y_cur, y_cond = _latents(hw=8)
        m.update()
        enc = m.compress(y_cur, y_cond)
        dec = m.decompress(enc["strings"], enc["shape"], y_cond)
        assert dec["y_hat"].shape == y_cur.shape
        # the decoded latent differs from y_cur by at most the quantization
        # error of the residual/latent (bounded by prior means shift)
        assert np.isfinite(np.asarray(dec["y_hat"])).all()

    @pytest.mark.slow
    @pytest.mark.parametrize("variant", ["res", "full"])
    def test_wavefront_matches_serial(self, variant):
        """The wavefront scheduler must reproduce the serial AR decisions:
        decoded latents identical, self-roundtrip exact."""
        m_wf = SpatioTemporalPriorModel(
            variant=variant, entropy_bottleneck_channels=EBC, in_channels=M,
            ar_mode="wavefront",
        )
        y_cur, y_cond = _latents(hw=8)
        m_wf.init(y_cur, y_cond)
        m_wf.update()

        m_serial = SpatioTemporalPriorModel(
            variant=variant, entropy_bottleneck_channels=EBC, in_channels=M,
            ar_mode="serial",
        )
        m_serial.params = m_wf.params
        m_serial.tables = m_wf.tables

        enc_wf = m_wf.compress(y_cur, y_cond)
        dec_wf = m_wf.decompress(enc_wf["strings"], enc_wf["shape"], y_cond)

        enc_s = m_serial.compress(y_cur, y_cond)
        dec_s = m_serial.decompress(enc_s["strings"], enc_s["shape"], y_cond)

        np.testing.assert_allclose(
            np.asarray(dec_wf["y_hat"]), np.asarray(dec_s["y_hat"]), atol=1e-4
        )
        # compressed sizes should be near-identical (same symbols, new order)
        len_wf = len(enc_wf["strings"][0][0])
        len_s = len(enc_s["strings"][0][0])
        assert abs(len_wf - len_s) <= max(16, 0.02 * len_s)

    @pytest.mark.slow
    def test_wavefront_tiled_roundtrip(self):
        """Tiled wavefront (video-codec slices idea): decode through the real
        bitstream must reproduce the encoder's own tile-batch scan exactly,
        with 3(th−1)+tw rounds instead of 3(H−1)+W."""
        m = SpatioTemporalPriorModel(
            variant="res", entropy_bottleneck_channels=EBC, in_channels=M,
            ar_mode="wavefront", wavefront_tile=(4, 4),
        )
        y_cur, y_cond = _latents(hw=8)
        m.init(y_cur, y_cond)
        m.update()

        enc = m.compress(y_cur, y_cond)
        assert m.compress(y_cur, y_cond)["strings"][0] == enc["strings"][0]
        dec = m.decompress(enc["strings"], enc["shape"], y_cond)

        # oracle: the encoder's own scan over the decoder's ẑ-derived priors
        from spatiotemporalentropymodel_tpu.entropy import base as eb
        from spatiotemporalentropymodel_tpu.models import ar_wavefront as wf

        zt = m.tables["entropy_bottleneck"]
        z_idx = eb.bottleneck_indexes(
            (1, *enc["shape"], zt.rows), zt.rows
        )
        z_sym = eb.decompress(enc["strings"][1], z_idx, zt, m.coder)
        z_hat = jnp.asarray(z_sym, jnp.float32) + jnp.asarray(
            zt.medians, jnp.float32
        )
        priors = m._prior_feats_fn()(z_hat, y_cond)
        coords, valid, encoder, *_ = m._wavefront_setup(4, 4)
        target = jnp.asarray(y_cur) - jnp.asarray(y_cond)
        _, _, tpad = encoder(
            wf.tile_plane(target, 4, 4), wf.tile_plane(priors, 4, 4),
            coords, valid,
        )
        expected = wf.untile_plane(tpad, 1, 8, 8) + jnp.asarray(y_cond)
        np.testing.assert_allclose(
            np.asarray(dec["y_hat"]), np.asarray(expected), atol=1e-5
        )

    def test_wavefront_cross_stream_batching_exact(self):
        """bench.py's full-stack serving projection batches INDEPENDENT
        streams along the wavefront tile axis (rounds carry no cross-stream
        dependency, exactly like batching the transforms). Stacking two
        streams must reproduce each stream's solo encode bit-exactly —
        symbols and CDF indexes are integer planes, so equality is exact."""
        from spatiotemporalentropymodel_tpu.models import ar_wavefront as wf

        m = SpatioTemporalPriorModel(
            variant="res", entropy_bottleneck_channels=EBC, in_channels=M,
            ar_mode="wavefront", wavefront_tile=(4, 4),
        )
        y_cur, y_cond = _latents(hw=8)
        m.init(y_cur, y_cond)
        m.update()

        coords, valid, encoder, *_ = m._wavefront_setup(4, 4)
        pr_ch = m._prior_feats_fn()(
            jnp.zeros((1, 2, 2, EBC)), y_cond
        ).shape[-1]
        k = jax.random.split(jax.random.PRNGKey(7), 4)
        tgts = [jax.random.normal(k[i], (1, 8, 8, M)) for i in range(2)]
        prs = [jax.random.normal(k[2 + i], (1, 8, 8, pr_ch))
               for i in range(2)]

        solo = [
            encoder(wf.tile_plane(t, 4, 4), wf.tile_plane(p, 4, 4),
                    coords, valid)
            for t, p in zip(tgts, prs)
        ]
        batched = encoder(
            wf.tile_plane(jnp.concatenate(tgts), 4, 4),
            wf.tile_plane(jnp.concatenate(prs), 4, 4),
            coords, valid,
        )
        nt = solo[0][0].shape[0]
        for s in range(2):
            sym_s, idx_s, tpad_s = solo[s]
            np.testing.assert_array_equal(
                np.asarray(batched[0][s * nt:(s + 1) * nt]),
                np.asarray(sym_s),
            )
            np.testing.assert_array_equal(
                np.asarray(batched[1][s * nt:(s + 1) * nt]),
                np.asarray(idx_s),
            )
            np.testing.assert_allclose(
                np.asarray(batched[2][s * nt:(s + 1) * nt]),
                np.asarray(tpad_s), atol=1e-6,
            )

    @pytest.mark.slow
    def test_wavefront_format_v2_equivalence(self):
        """The grouped (v2) wavefront wire format must decode to the exact
        same latents as the v1 lane order, at the same rate (rANS rate is
        order-invariant), from genuinely different bytes."""
        m = SpatioTemporalPriorModel(
            variant="res", entropy_bottleneck_channels=EBC, in_channels=M,
            ar_mode="wavefront", wavefront_tile=(4, 4),
        )
        y_cur, y_cond = _latents(hw=8)
        m.init(y_cur, y_cond)
        m.update()

        outs = {}
        for fmt in ("lane", "grouped"):
            m.wavefront_format = fmt
            enc = m.compress(y_cur, y_cond)
            dec = m.decompress(enc["strings"], enc["shape"], y_cond)
            outs[fmt] = (enc["strings"][0][0], np.asarray(dec["y_hat"]))
        np.testing.assert_allclose(
            outs["lane"][1], outs["grouped"][1], atol=1e-5
        )
        len_l, len_g = len(outs["lane"][0]), len(outs["grouped"][0])
        assert abs(len_l - len_g) <= max(16, 0.02 * len_l)
        assert outs["lane"][0] != outs["grouped"][0]

    @pytest.mark.slow
    def test_wavefront_roundtrip_interleaved_coder(self):
        """AR paths must emit the plain stream format under EVERY coder:
        rans_interleaved's encode_with_indexes writes a multi-lane container
        that a StreamDecoder would silently mis-parse as symbols (the bench
        pins that coder), so compress must route through encode_stream."""
        m = SpatioTemporalPriorModel(
            variant="res", entropy_bottleneck_channels=EBC, in_channels=M,
            ar_mode="wavefront", wavefront_tile=(4, 4),
            entropy_coder="rans_interleaved",
        )
        y_cur, y_cond = _latents(hw=8)
        m.init(y_cur, y_cond)
        m.update()
        enc = m.compress(y_cur, y_cond)
        dec = m.decompress(enc["strings"], enc["shape"], y_cond)

        m2 = SpatioTemporalPriorModel(
            variant="res", entropy_bottleneck_channels=EBC, in_channels=M,
            ar_mode="wavefront", wavefront_tile=(4, 4), entropy_coder="rans",
        )
        m2.params, m2.tables = m.params, m.tables
        enc2 = m2.compress(y_cur, y_cond)
        dec2 = m2.decompress(enc2["strings"], enc2["shape"], y_cond)
        # identical latents; the y stream itself is the same plain format
        np.testing.assert_allclose(
            np.asarray(dec["y_hat"]), np.asarray(dec2["y_hat"]), atol=1e-5
        )
        assert enc["strings"][0][0] == enc2["strings"][0][0]

    def test_wavefront_grouped_needs_capable_coder(self):
        from spatiotemporalentropymodel_tpu.models import ar_wavefront as wf

        stub = type("C", (), {"name": "stub"})()
        with pytest.raises(ValueError, match="stream-run"):
            wf.wire_format("grouped", stub)
        assert wf.wire_format("auto", stub) == "lane"

    @pytest.mark.slow
    def test_wavefront_single_row_tile_roundtrip(self):
        """(1, 2) is the 2-round latency-lever tile: with th == 1 every
        round t = c is non-empty, so tw < 3 is legal (stem.py::_tile_dims).
        The bitstream must round-trip through the real coder."""
        m = SpatioTemporalPriorModel(
            variant="res", entropy_bottleneck_channels=EBC, in_channels=M,
            ar_mode="wavefront", wavefront_tile=(1, 2),
        )
        y_cur, y_cond = _latents(hw=8)
        m.init(y_cur, y_cond)
        m.update()

        enc = m.compress(y_cur, y_cond)
        dec = m.decompress(enc["strings"], enc["shape"], y_cond)

        from spatiotemporalentropymodel_tpu.entropy import base as eb
        from spatiotemporalentropymodel_tpu.models import ar_wavefront as wf

        zt = m.tables["entropy_bottleneck"]
        z_idx = eb.bottleneck_indexes((1, *enc["shape"], zt.rows), zt.rows)
        z_sym = eb.decompress(enc["strings"][1], z_idx, zt, m.coder)
        z_hat = jnp.asarray(z_sym, jnp.float32) + jnp.asarray(
            zt.medians, jnp.float32
        )
        priors = m._prior_feats_fn()(z_hat, y_cond)
        coords, valid, encoder, *_ = m._wavefront_setup(1, 2)
        target = jnp.asarray(y_cur) - jnp.asarray(y_cond)
        _, _, tpad = encoder(
            wf.tile_plane(target, 1, 2), wf.tile_plane(priors, 1, 2),
            coords, valid,
        )
        expected = wf.untile_plane(tpad, 1, 8, 8) + jnp.asarray(y_cond)
        np.testing.assert_allclose(
            np.asarray(dec["y_hat"]), np.asarray(expected), atol=1e-5
        )

    def test_wavefront_multirow_narrow_tile_rejected(self):
        """th > 1 with tw < 3 leaves empty rounds (e.g. (2,2) skips t=2) —
        must be rejected up front."""
        m = SpatioTemporalPriorModel(
            variant="res", entropy_bottleneck_channels=EBC, in_channels=M,
            wavefront_tile=(2, 2),
        )
        y_cur, y_cond = _latents(hw=8)
        m.init(y_cur, y_cond)
        m.update()
        with pytest.raises(ValueError, match="tw >= 3 or th == 1"):
            m.compress(y_cur, y_cond)

    def test_wavefront_tile_must_divide(self):
        m = SpatioTemporalPriorModel(
            variant="res", entropy_bottleneck_channels=EBC, in_channels=M,
            wavefront_tile=(3, 3),
        )
        y_cur, y_cond = _latents(hw=8)
        m.init(y_cur, y_cond)
        m.update()
        with pytest.raises(ValueError, match="divisible"):
            m.compress(y_cur, y_cond)

    def test_wavefront_tables_dependencies(self):
        """No pixel may share a wavefront with one of its mask-A deps."""
        from spatiotemporalentropymodel_tpu.models.ar_wavefront import (
            wavefront_tables,
        )

        coords, valid = wavefront_tables(6, 10)
        coords, valid = np.asarray(coords), np.asarray(valid)
        for t in range(coords.shape[0]):
            pix = [tuple(c) for c, v in zip(coords[t], valid[t]) if v]
            for (h1, w1) in pix:
                for (h2, w2) in pix:
                    if (h1, w1) == (h2, w2):
                        continue
                    # (h2,w2) must NOT be in the causal 5x5 window of (h1,w1)
                    in_window = abs(h2 - h1) <= 2 and abs(w2 - w1) <= 2
                    causal = (h2 < h1) or (h2 == h1 and w2 < w1)
                    assert not (in_window and causal), ((h1, w1), (h2, w2))

    def test_bitstream_deterministic(self):
        m = _make("without_spm")
        y_cur, y_cond = _latents()
        m.update()
        e1 = m.compress(y_cur, y_cond)
        e2 = m.compress(y_cur, y_cond)
        assert e1["strings"][0] == e2["strings"][0]
        assert e1["strings"][1] == e2["strings"][1]
