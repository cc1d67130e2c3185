"""Image-codec model tests (reference strategy: compressai_tests/test_models.py
+ test_codec.py round-trips, but with random weights and exact-symbol checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatiotemporalentropymodel_tpu.models import (
    Cheng2020Anchor,
    FactorizedPrior,
    JointAutoregressiveHierarchicalPriors,
    MeanScaleHyperprior,
    ScaleHyperprior,
)


def _image(b=1, hw=64, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (b, hw, hw, 3))


class TestForwardContracts:
    def test_factorized(self):
        m = FactorizedPrior(8, 12)
        x = _image()
        m.init(x)
        out = m.forward(x)
        assert out["x_hat"].shape == x.shape
        assert out["likelihoods"]["y"].shape == (1, 4, 4, 12)

    def test_scale_hyperprior(self):
        m = ScaleHyperprior(8, 12)
        x = _image()
        m.init(x)
        out = m.forward(x)
        assert out["x_hat"].shape == x.shape
        assert out["likelihoods"]["y"].shape == (1, 4, 4, 12)
        assert out["likelihoods"]["z"].shape == (1, 1, 1, 8)

    def test_mean_scale_hyperprior(self):
        m = MeanScaleHyperprior(8, 12)
        x = _image()
        m.init(x)
        out = m.forward(x)
        assert set(out) >= {"y", "y_hat", "x_hat", "likelihoods"}
        assert out["y_hat"].shape == (1, 4, 4, 12)

    def test_joint_ar(self):
        m = JointAutoregressiveHierarchicalPriors(8, 12)
        x = _image()
        m.init(x)
        out = m.forward(x)
        assert set(out) >= {"y", "y_hat", "x_hat", "likelihoods", "entropy_params"}
        assert out["entropy_params"]["scales_hat"].shape == (1, 4, 4, 12)

    def test_train_mode_noise(self):
        m = MeanScaleHyperprior(8, 12)
        x = _image()
        m.init(x)
        out = m.forward(x, train=True)
        d = np.asarray(out["y_hat"]) - np.asarray(out["y"])
        assert np.all(np.abs(d) <= 0.5) and d.std() > 0.05

    def test_aux_loss(self):
        m = MeanScaleHyperprior(8, 12)
        m.init(_image())
        assert float(m.aux_loss()) > 0


class TestCodecRoundTrip:
    def test_uninitialized_tables_raise(self):
        m = FactorizedPrior(8, 12)
        m.init(_image())
        with pytest.raises(RuntimeError):
            m.compress(_image())

    def test_factorized_roundtrip(self):
        m = FactorizedPrior(8, 12)
        x = _image()
        m.init(x)
        m.update()
        enc = m.compress(x)
        assert len(enc["strings"]) == 1 and enc["shape"] == (4, 4)
        dec = m.decompress(enc["strings"], enc["shape"])
        assert dec["x_hat"].shape == x.shape
        assert np.all(np.asarray(dec["x_hat"]) >= 0)
        assert np.all(np.asarray(dec["x_hat"]) <= 1)

    @pytest.mark.parametrize("cls", [ScaleHyperprior, MeanScaleHyperprior])
    def test_hyperprior_roundtrip_lossless_latents(self, cls):
        m = cls(8, 12)
        x = _image(b=2)
        m.init(x)
        m.update()
        enc = m.compress(x)
        assert len(enc["strings"]) == 2
        assert all(len(s) > 0 for s in enc["strings"][0])
        dec = m.decompress(enc["strings"], enc["shape"])
        assert dec["x_hat"].shape == x.shape
        if cls is MeanScaleHyperprior:
            # decoded y_hat must exactly equal the encoder-side quantization
            # (the fused fast path saturates z and y symbols to int16)
            y, z = m._apply(x, method="analysis")
            med = m.tables["entropy_bottleneck"].medians[None, None, None, :]
            z_sym = np.clip(
                np.round(np.asarray(z, np.float32) - med.astype(np.float32)),
                -32767, 32767,
            ).astype(np.int16)
            means, _ = m._fused_params_fn()(jnp.asarray(z_sym))
            sym = np.clip(
                np.round(np.asarray(y, np.float32) - np.asarray(means)),
                -32767, 32767,
            ).astype(np.int16)
            expect = (sym.astype(np.float32) + np.asarray(means)).astype(
                np.float32
            )
            np.testing.assert_array_equal(np.asarray(dec["y_hat"]), expect)

    def test_update_idempotent_unless_forced(self):
        m = MeanScaleHyperprior(8, 12)
        m.init(_image())
        assert m.update() is True
        assert m.update() is False
        assert m.update(force=True) is True

    def test_params_reassignment_invalidates_jit_cache(self):
        """Jitted codec fns capture params at trace time; assigning new
        params must retrace (else compress runs with stale weights)."""
        m = MeanScaleHyperprior(8, 12)
        x = _image()
        m.init(x)
        m.update()
        enc1 = m.compress(x)
        assert m._jit_cache  # populated by the compress

        scaled = jax.tree_util.tree_map(lambda p: p * 1.5, m.params)
        m.params = scaled
        assert not m._jit_cache  # invalidated
        m.update(force=True)
        enc2 = m.compress(x)
        assert enc1["strings"][0] != enc2["strings"][0]

    def test_state_dict_roundtrip(self):
        m = MeanScaleHyperprior(8, 12)
        x = _image()
        m.init(x)
        m.update()
        enc = m.compress(x)

        m2 = MeanScaleHyperprior(8, 12)
        m2.load_state_dict(m.state_dict())
        enc2 = m2.compress(x)
        assert enc["strings"][0] == enc2["strings"][0]
        assert enc["strings"][1] == enc2["strings"][1]


@pytest.mark.slow
class TestAutoregressiveCodec:
    def test_joint_ar_roundtrip(self):
        m = JointAutoregressiveHierarchicalPriors(8, 12, ar_mode="serial")
        x = _image(hw=64)
        m.init(x)
        m.update()
        enc = m.compress(x)
        dec = m.decompress(enc["strings"], enc["shape"])
        assert dec["x_hat"].shape == x.shape
        assert dec["y_hat"].shape == (1, 4, 4, 12)

    def test_joint_ar_wavefront_matches_serial(self):
        m = JointAutoregressiveHierarchicalPriors(8, 12, ar_mode="wavefront")
        x = _image(hw=64)
        m.init(x)
        m.update()

        m_serial = JointAutoregressiveHierarchicalPriors(8, 12,
                                                         ar_mode="serial")
        m_serial.params = m.params
        m_serial.tables = m.tables

        enc_wf = m.compress(x)
        dec_wf = m.decompress(enc_wf["strings"], enc_wf["shape"])
        enc_s = m_serial.compress(x)
        dec_s = m_serial.decompress(enc_s["strings"], enc_s["shape"])
        np.testing.assert_allclose(
            np.asarray(dec_wf["y_hat"]), np.asarray(dec_s["y_hat"]), atol=1e-4
        )

    def test_joint_ar_wavefront_format_v2(self):
        """mbt2018's grouped (v2) wavefront order decodes to the same latents
        as the default lane order from different bytes."""
        m = JointAutoregressiveHierarchicalPriors(8, 12, ar_mode="wavefront")
        x = _image(hw=64)
        m.init(x)
        m.update()
        outs = {}
        for fmt in ("lane", "grouped"):
            m.wavefront_format = fmt
            enc = m.compress(x)
            dec = m.decompress(enc["strings"], enc["shape"])
            outs[fmt] = (enc["strings"][0][0], np.asarray(dec["y_hat"]))
        np.testing.assert_allclose(
            outs["lane"][1], outs["grouped"][1], atol=1e-5
        )
        assert outs["lane"][0] != outs["grouped"][0]

    def test_cheng2020_forward(self):
        m = Cheng2020Anchor(16)
        x = _image(hw=64)
        m.init(x)
        out = m.forward(x)
        assert out["x_hat"].shape == x.shape

    def test_cheng2020_attention_forward(self):
        from spatiotemporalentropymodel_tpu.models import Cheng2020Attention

        m = Cheng2020Attention(16)
        x = _image(hw=64)
        m.init(x)
        out = m.forward(x)
        assert out["x_hat"].shape == x.shape
        assert out["likelihoods"]["y"].shape == (1, 4, 4, 16)

    def test_cheng2020_codec_roundtrip(self):
        m = Cheng2020Anchor(16)
        x = _image(hw=64)
        m.init(x)
        m.update()
        enc = m.compress(x)
        dec = m.decompress(enc["strings"], enc["shape"])
        assert dec["x_hat"].shape == x.shape
