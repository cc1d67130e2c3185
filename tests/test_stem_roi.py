"""ROI / variable-rate family tests — the reference has NO tests for
stem_roi.py (SURVEY.md §4 gap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatiotemporalentropymodel_tpu.models import (
    StemBaseline,
    StemBaselineV2,
    StemROI,
    StemROIWoGsc,
    StemROI_I,
)

EBC, M = 16, 12
HW = 64


def _imgs(seed=0, b=1):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x_cur = jax.random.uniform(k1, (b, HW, HW, 3))
    x_cond = jnp.clip(
        x_cur + 0.05 * jax.random.normal(k2, x_cur.shape), 0, 1
    )
    qmap = jax.random.uniform(k3, (b, HW, HW, 1))
    return x_cur, x_cond, qmap


class TestStemBaseline:
    @pytest.mark.parametrize("v2", [False, True])
    def test_forward(self, v2):
        m = StemBaseline(EBC, M, v2=v2)
        x_cur, x_cond, _ = _imgs()
        m.init(x_cur, x_cond)
        out = m.forward(x_cur, x_cond)
        assert out["x_hat"].shape == x_cur.shape
        assert out["y_hat"].shape == (1, HW // 16, HW // 16, M)
        assert out["likelihoods"]["z"].shape == (1, HW // 64, HW // 64, EBC)

    def test_codec_roundtrip(self):
        m = StemBaseline(EBC, M)
        x_cur, x_cond, _ = _imgs()
        m.init(x_cur, x_cond)
        m.update()
        enc = m.compress(x_cur, x_cond)
        dec = m.decompress(enc["strings"], enc["shape"], x_cond)
        assert dec["x_hat"].shape == x_cur.shape
        assert "entropy_params" in dec
        # decoded y_hat must match eval-forward quantization exactly
        fwd = m.forward(x_cur, x_cond)
        np.testing.assert_allclose(
            np.asarray(dec["y_hat"]), np.asarray(fwd["y_hat"]), atol=1e-4
        )

    def test_get_y_padding(self):
        m = StemBaseline(EBC, M)
        x_cur, x_cond, _ = _imgs()
        m.init(x_cur, x_cond)
        x_odd = jnp.ones((1, 50, 70, 3))
        y = m.get_y(x_odd, is_eval=True)
        assert y.shape == (1, 4, 8, M)  # padded to 64x128 → /16

    def test_v2_uses_separate_condition_encoder(self):
        m = StemBaselineV2(entropy_bottleneck_channels=EBC, in_channels=M)
        x_cur, x_cond, _ = _imgs()
        m.init(x_cur, x_cond)
        assert "ConditionEncoder" in m.params


class TestStemROI:
    def test_forward_and_qmap_sensitivity(self):
        m = StemROI(EBC, M)
        x_cur, x_cond, qmap = _imgs()
        m.init(x_cur, x_cond, qmap)
        out_lo = m.forward(x_cur, x_cond, jnp.zeros_like(qmap))
        out_hi = m.forward(x_cur, x_cond, jnp.ones_like(qmap))
        assert out_lo["x_hat"].shape == x_cur.shape
        # the qmap must actually influence the latent representation
        assert not np.allclose(
            np.asarray(out_lo["y_hat"]), np.asarray(out_hi["y_hat"])
        )

    def test_codec_roundtrip_no_qmap_at_decode(self):
        """Symbol-level losslessness: decoded y_hat must equal the encoder's
        own quantization (untrained ROI nets produce huge activations, so the
        float-level forward comparison is meaningless here — the coder-level
        equality is the property that matters)."""
        m = StemROI(EBC, M)
        x_cur, x_cond, qmap = _imgs()
        m.init(x_cur, x_cond, qmap)
        m.update()
        enc = m.compress(x_cur, x_cond, qmap)
        # decode takes NO qmap — decoder conditioning comes from ẑ (wmap)
        dec = m.decompress(enc["strings"], enc["shape"], x_cond)
        assert dec["x_hat"].shape == x_cur.shape

        # reproduce the encoder-side symbols and compare exactly (the fused
        # fast path saturates both y and z symbols to int16)
        y_cur, y_cond, z = m._apply(x_cur, x_cond, qmap, method="encode_latents")
        med = m.tables["entropy_bottleneck"].medians[None, None, None, :]
        z_sym = np.clip(
            np.round(np.asarray(z, np.float32) - med.astype(np.float32)),
            -32767, 32767,
        ).astype(np.int16)
        means, _ = m._fused_params_fn()(jnp.asarray(z_sym), y_cond)
        sym = np.clip(
            np.round(np.asarray(y_cur, np.float32) - np.asarray(means, np.float32)),
            -32767, 32767,
        ).astype(np.int16)
        expected = (sym.astype(np.float32) + np.asarray(means)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(dec["y_hat"]), expected)

    def test_wo_gsc_has_no_wmap_params(self):
        m = StemROIWoGsc(entropy_bottleneck_channels=EBC, in_channels=M)
        x_cur, x_cond, qmap = _imgs()
        m.init(x_cur, x_cond, qmap)
        assert "wmap_generator" not in m.params
        out = m.forward(x_cur, x_cond, qmap)
        assert out["x_hat"].shape == x_cur.shape

    def test_roi_i_frame_model(self):
        m = StemROI_I(entropy_bottleneck_channels=EBC, in_channels=M)
        x_cur, _, qmap = _imgs()
        m.init(x_cur, qmap)
        out = m.forward(x_cur, qmap)
        assert out["x_hat"].shape == x_cur.shape
        m.update()
        enc = m.compress(x_cur, qmap)
        dec = m.decompress(enc["strings"], enc["shape"])
        assert dec["x_hat"].shape == x_cur.shape
