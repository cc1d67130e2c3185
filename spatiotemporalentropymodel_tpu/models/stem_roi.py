"""ROI / variable-rate STEM family (pixel-domain video codecs).

Parity target: compressai/models/stem_roi.py (1324 LoC, five classes). Here:

  stem_baseline    — single-rate pixel-domain P-codec: own PEncoder/PDecoder
                     (128-ch trunk), TPM + hyper EPM, no SPM (:21-178)
  stem_baselinev2  — + separate ConditionEncoder for the conditioning frame
                     (:182-348)
  stem_roi         — variable-rate P-model: encoder/hyper-encoder interleaved
                     with SFT layers conditioned on a quality map via
                     qmap_feature_* pyramids; decoder conditioned on a wmap
                     generated from ẑ so decode needs no Qmap side-channel
                     (:353-698)
  stem_roi_wo_gsc  — ablation with the decoder-side SFT removed (:702-1013)
  stem_roi_i       — matching I-frame variable-rate model (no TPM/condition,
                     hyper-only EPM) (:1017-1325)

One parameterized module pair (`StemBaselineModule`, `StemROIModule`) covers
all five. All codec paths are parallel (no SPM anywhere in this family).
NHWC; Qmap is (B, H, W, 1).
"""

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyBottleneck, GaussianConditional, build_indexes
from ..entropy import base as entropy_base
from ..layers import (
    GDN,
    SFT,
    Conv,
    Deconv,
    SFTResblk,
    Sequential,
    adaptive_avg_pool,
    leaky_relu,
)
from ..ops.padding import crop_centered, pad_centered
from .base import CompressionModel
from .priors import _LeakyReLU


class _LeakyReLU01(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jax.nn.leaky_relu(x, 0.1)


def _pixel_encoder(out_ch: int, name: str) -> Sequential:
    """4× k5s2 conv+GDN 128-trunk image encoder (stem_roi.py:28-36)."""
    return Sequential(
        [Conv(128, 5, 2), GDN(128), Conv(128, 5, 2), GDN(128), Conv(128, 5, 2),
         GDN(128), Conv(out_ch, 5, 2)],
        name=name,
    )


def _pixel_decoder(name: str) -> Sequential:
    """Mirror decoder (stem_roi.py:37-45)."""
    return Sequential(
        [Deconv(128, 5, 2), GDN(128, inverse=True), Deconv(128, 5, 2),
         GDN(128, inverse=True), Deconv(128, 5, 2), GDN(128, inverse=True),
         Deconv(3, 5, 2)],
        name=name,
    )


def _tpm(m: int, name: str = "TPM") -> Sequential:
    return Sequential(
        [Conv(256, 5, 1), _LeakyReLU(), Conv(320, 5, 1), _LeakyReLU(),
         Conv(m * 2, 5, 1)],
        name=name,
    )


def _he(ebc: int, name: str = "HE") -> Sequential:
    return Sequential(
        [Conv(256, 3, 1), _LeakyReLU(), Conv(256, 5, 2), _LeakyReLU(),
         Conv(ebc, 5, 2)],
        name=name,
    )


def _hd(m: int, name: str = "HD") -> Sequential:
    return Sequential(
        [Deconv(256, 5, 2), _LeakyReLU(), Deconv(256, 5, 2), _LeakyReLU(),
         Conv(m * 2, 3, 1)],
        name=name,
    )


def _epm(m: int, name: str = "EPM") -> Sequential:
    return Sequential(
        [Conv(768, 1, 1), _LeakyReLU(), Conv(576, 1, 1), _LeakyReLU(),
         Conv(m * 2, 1, 1)],
        name=name,
    )


# ---------------------------------------------------------------------------
# stem_baseline / stem_baselinev2
# ---------------------------------------------------------------------------


class StemBaselineModule(nn.Module):
    """Pixel-domain single-rate P-codec (stem_roi.py:21-348)."""

    entropy_bottleneck_channels: int = 256
    in_channels: int = 192
    separate_condition_encoder: bool = False  # v2

    def setup(self):
        m, ebc = self.in_channels, self.entropy_bottleneck_channels
        self.PEncoder = _pixel_encoder(m, "PEncoder")
        self.PDecoder = _pixel_decoder("PDecoder")
        if self.separate_condition_encoder:
            self.ConditionEncoder = _pixel_encoder(m, "ConditionEncoder")
        self.TPM = _tpm(m)
        self.HE = _he(ebc)
        self.HD = _hd(m)
        self.EPM = _epm(m)
        self.entropy_bottleneck = EntropyBottleneck(ebc)
        self.gaussian_conditional = GaussianConditional()

    def _cond_encode(self, x):
        if self.separate_condition_encoder:
            return self.ConditionEncoder(x)
        return self.PEncoder(x)

    def __call__(self, x_cur, x_conditioned, train: bool = False):
        y_cur = self.PEncoder(x_cur)
        y_cond = self._cond_encode(x_conditioned)
        z = self.HE(jnp.concatenate([y_cur, y_cond], axis=-1))
        z_hat, z_lik = self.entropy_bottleneck(z, train=train)
        gp = self.EPM(
            jnp.concatenate([self.TPM(y_cond), self.HD(z_hat)], axis=-1)
        )
        scales, means = jnp.split(gp, 2, axis=-1)
        y_hat, y_lik = self.gaussian_conditional(y_cur, scales, means, train=train)
        x_hat = self.PDecoder(y_hat)
        return {
            "x_hat": x_hat,
            "y_hat": y_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
        }

    # codec-path methods (jitted by the wrapper)
    def encode_latents(self, x_cur, x_conditioned, train: bool = False):
        del train
        y_cur = self.PEncoder(x_cur)
        y_cond = self._cond_encode(x_conditioned)
        z = self.HE(jnp.concatenate([y_cur, y_cond], axis=-1))
        return y_cur, y_cond, z

    def cond_latent(self, x_conditioned, train: bool = False):
        del train
        return self._cond_encode(x_conditioned)

    def entropy_params(self, z_hat, y_cond, train: bool = False):
        del train
        gp = self.EPM(
            jnp.concatenate([self.TPM(y_cond), self.HD(z_hat)], axis=-1)
        )
        return jnp.split(gp, 2, axis=-1)

    def synthesis(self, y_hat, train: bool = False):
        del train
        return jnp.clip(self.PDecoder(y_hat), 0.0, 1.0)

    def get_y(self, x, train: bool = False):
        del train
        return self.PEncoder(x)

    def aux_loss(self, train: bool = False):
        del train
        return self.entropy_bottleneck.aux_loss()


# ---------------------------------------------------------------------------
# stem_roi / stem_roi_wo_gsc / stem_roi_i
# ---------------------------------------------------------------------------


class StemROIModule(nn.Module):
    """Qmap-conditioned variable-rate codec (stem_roi.py:353-1325)."""

    entropy_bottleneck_channels: int = 256
    in_channels: int = 192
    conditional: bool = True  # False → stem_roi_i (I-frame model)
    decoder_sft: bool = True  # False → stem_roi_wo_gsc

    def setup(self):
        m, ebc = self.in_channels, self.entropy_bottleneck_channels

        # g_a pyramid with SFT conditioning (stem_roi.py:359-400)
        self.ga1 = Sequential([Conv(128, 5, 2), GDN(128)], name="ga1")
        self.ga1_SFT = SFT(128, 128, ks=3)
        self.ga2 = Sequential([Conv(128, 5, 2), GDN(128)], name="ga2")
        self.ga2_SFT = SFT(128, 128, ks=3)
        self.ga3 = Sequential([Conv(128, 5, 2), GDN(128)], name="ga3")
        self.ga3_SFT = SFT(128, 128, ks=3)
        self.ga4 = Conv(m, 5, 2, name="ga4")
        self.ga4_SFTResB1 = SFTResblk(m, m, ks=3)
        self.ga4_SFTResB2 = SFTResblk(m, m, ks=3)

        self.qmap_feature_ga1 = Sequential(
            [Conv(192, 3, 1), _LeakyReLU01(), Conv(160, 3, 1), _LeakyReLU01(),
             Conv(128, 3, 1)],
            name="qmap_feature_ga1",
        )
        self.qmap_feature_ga2 = Sequential(
            [Conv(128, 3, 2), _LeakyReLU01(), Conv(128, 1, 1)],
            name="qmap_feature_ga2",
        )
        self.qmap_feature_ga3 = Sequential(
            [Conv(128, 3, 2), _LeakyReLU01(), Conv(128, 1, 1)],
            name="qmap_feature_ga3",
        )
        self.qmap_feature_ga4 = Sequential(
            [Conv(128, 3, 2), _LeakyReLU01(), Conv(m, 1, 1)],
            name="qmap_feature_ga4",
        )

        # hyper-encoder with SFT conditioning (stem_roi.py:403-429)
        self.ha1 = Conv(256, 3, 1, name="ha1")
        self.ha1_SFT = SFT(256, 256, ks=3)
        self.ha2 = Conv(256, 5, 2, name="ha2")
        self.ha2_SFT = SFT(256, 256, ks=3)
        # the reference hard-codes 256 here (stem_roi.py:409-411) — only
        # consistent with the EntropyBottleneck at the default ebc=256;
        # parameterized on ebc (identical at the default config)
        self.ha3 = Conv(ebc, 5, 2, name="ha3")
        self.ha3_ResB1 = SFTResblk(ebc, 256, ks=3)
        self.ha3_ResB2 = SFTResblk(ebc, 256, ks=3)

        self.qmap_feature_ha1 = Sequential(
            [Conv(128, 3, 1), _LeakyReLU01(), Conv(192, 3, 1), _LeakyReLU01(),
             Conv(256, 3, 1)],
            name="qmap_feature_ha1",
        )
        self.qmap_feature_ha2 = Sequential(
            [Conv(256, 3, 2), _LeakyReLU01(), Conv(256, 1, 1)],
            name="qmap_feature_ha2",
        )
        self.qmap_feature_ha3 = Sequential(
            [Conv(256, 3, 2), _LeakyReLU01(), Conv(256, 1, 1)],
            name="qmap_feature_ha3",
        )

        self.hs = _hd(m, name="hs")

        # decoder side (stem_roi.py:442-491); wmap from ẑ → no Qmap at decode
        if self.decoder_sft:
            self.wmap_generator = Sequential(
                [Deconv(192, 5, 2), _LeakyReLU(), Deconv(128, 5, 2),
                 _LeakyReLU(), Conv(64, 3, 1)],
                name="wmap_generator",
            )
            self.gs0_SFTResB1 = SFTResblk(m, m, ks=3)
            self.gs0_SFTResB2 = SFTResblk(m, m, ks=3)
            self.qmap_feature_gs0 = Sequential(
                [Conv(192, 3, 1), _LeakyReLU01(), Conv(192, 3, 1),
                 _LeakyReLU01(), Conv(192, 3, 1)],
                name="qmap_feature_gs0",
            )
            self.qmap_feature_gs1 = Sequential(
                [Deconv(128, 3, 2), _LeakyReLU01(), Conv(128, 1, 1)],
                name="qmap_feature_gs1",
            )
            self.qmap_feature_gs2 = Sequential(
                [Deconv(128, 3, 2), _LeakyReLU01(), Conv(128, 1, 1)],
                name="qmap_feature_gs2",
            )
            self.qmap_feature_gs3 = Sequential(
                [Deconv(128, 3, 2), _LeakyReLU01(), Conv(128, 1, 1)],
                name="qmap_feature_gs3",
            )
            self.gs1_SFT = SFT(128, 128, ks=3)
            self.gs2_SFT = SFT(128, 128, ks=3)
            self.gs3_SFT = SFT(128, 128, ks=3)
        self.gs1 = Sequential([Deconv(128, 5, 2), GDN(128, inverse=True)],
                              name="gs1")
        self.gs2 = Sequential([Deconv(128, 5, 2), GDN(128, inverse=True)],
                              name="gs2")
        self.gs3 = Sequential([Deconv(128, 5, 2), GDN(128, inverse=True)],
                              name="gs3")
        self.gs4 = Deconv(3, 5, 2, name="gs4")

        if self.conditional:
            self.ConditionEncoder = _pixel_encoder(m, "ConditionEncoder")
            self.TPM = _tpm(m)
        self.EPM = _epm(m)
        self.entropy_bottleneck = EntropyBottleneck(ebc)
        self.gaussian_conditional = GaussianConditional()

    # ---- sub-networks ------------------------------------------------------

    def p_encoder(self, x, qmap, train: bool = False):
        del train
        q = self.qmap_feature_ga1(jnp.concatenate([x, qmap], axis=-1))
        x = self.ga1_SFT(self.ga1(x), q)
        q = self.qmap_feature_ga2(q)
        x = self.ga2_SFT(self.ga2(x), q)
        q = self.qmap_feature_ga3(q)
        x = self.ga3_SFT(self.ga3(x), q)
        q = self.qmap_feature_ga4(q)
        x = self.ga4(x)
        x = self.ga4_SFTResB1(x, q)
        return self.ga4_SFTResB2(x, q)

    def hyper_encoder(self, y, qmap):
        q = adaptive_avg_pool(qmap, y.shape[1:3])
        q = self.qmap_feature_ha1(jnp.concatenate([q, y], axis=-1))
        x = leaky_relu(self.ha1_SFT(self.ha1(y), q))
        q = self.qmap_feature_ha2(q)
        x = leaky_relu(self.ha2_SFT(self.ha2(x), q))
        q = self.qmap_feature_ha3(q)
        x = self.ha3(x)
        x = self.ha3_ResB1(x, q)
        return self.ha3_ResB2(x, q)

    def p_decoder(self, y_hat, z_hat, train: bool = False):
        del train
        x = y_hat
        if self.decoder_sft:
            w = self.wmap_generator(z_hat)
            w = self.qmap_feature_gs0(jnp.concatenate([w, x], axis=-1))
            x = self.gs0_SFTResB1(x, w)
            x = self.gs0_SFTResB2(x, w)
            w = self.qmap_feature_gs1(w)
            x = self.gs1_SFT(self.gs1(x), w)
            w = self.qmap_feature_gs2(w)
            x = self.gs2_SFT(self.gs2(x), w)
            w = self.qmap_feature_gs3(w)
            x = self.gs3_SFT(self.gs3(x), w)
        else:
            x = self.gs1(x)
            x = self.gs2(x)
            x = self.gs3(x)
        return self.gs4(x)

    # ---- forward -----------------------------------------------------------

    def __call__(self, x_cur, *args, train: bool = False):
        """stem_roi / wo_gsc: (x_cur, x_conditioned, qmap);
        stem_roi_i: (x_cur, qmap)."""
        if self.conditional:
            x_conditioned, qmap = args
        else:
            (qmap,) = args

        y_cur = self.p_encoder(x_cur, qmap)
        if self.conditional:
            y_cond = self.ConditionEncoder(x_conditioned)
            z = self.hyper_encoder(
                jnp.concatenate([y_cur, y_cond], axis=-1), qmap
            )
        else:
            z = self.hyper_encoder(y_cur, qmap)
        z_hat, z_lik = self.entropy_bottleneck(z, train=train)
        hyper = self.hs(z_hat)
        if self.conditional:
            gp = self.EPM(jnp.concatenate([self.TPM(y_cond), hyper], axis=-1))
        else:
            gp = self.EPM(hyper)
        scales, means = jnp.split(gp, 2, axis=-1)
        y_hat, y_lik = self.gaussian_conditional(y_cur, scales, means, train=train)
        x_hat = self.p_decoder(y_hat, z_hat)
        return {
            "x_hat": x_hat,
            "y_hat": y_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
        }

    # ---- codec-path methods ------------------------------------------------

    def encode_latents(self, x_cur, *args, train: bool = False):
        del train
        if self.conditional:
            x_conditioned, qmap = args
            y_cur = self.p_encoder(x_cur, qmap)
            y_cond = self.ConditionEncoder(x_conditioned)
            z = self.hyper_encoder(
                jnp.concatenate([y_cur, y_cond], axis=-1), qmap
            )
            return y_cur, y_cond, z
        (qmap,) = args
        y_cur = self.p_encoder(x_cur, qmap)
        z = self.hyper_encoder(y_cur, qmap)
        return y_cur, jnp.zeros_like(y_cur), z

    def cond_latent(self, x_conditioned, train: bool = False):
        del train
        return self.ConditionEncoder(x_conditioned)

    def entropy_params(self, z_hat, y_cond, train: bool = False):
        del train
        hyper = self.hs(z_hat)
        if self.conditional:
            gp = self.EPM(jnp.concatenate([self.TPM(y_cond), hyper], axis=-1))
        else:
            gp = self.EPM(hyper)
        return jnp.split(gp, 2, axis=-1)

    def synthesis(self, y_hat, z_hat, train: bool = False):
        del train
        return jnp.clip(self.p_decoder(y_hat, z_hat), 0.0, 1.0)

    def aux_loss(self, train: bool = False):
        del train
        return self.entropy_bottleneck.aux_loss()


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------


class _PixelCodecBase(CompressionModel):
    """Shared parallel codec path over (y_cur, y_cond, z) encoders.

    Same fused single-dispatch design as the latent-domain STEM codec
    (models/stem.py): one jit emits the packed [y int16][z int16][idx u8]
    byte buffer per compress; decode runs two dispatches (params;
    reconstruct + synthesis). Symbols saturate to int16 on this fast path.
    """

    has_gaussian = True
    _I16_LIM = 32767.0
    _synthesis_needs_z = False

    def _params_indexes_fn(self):
        table = self.tables["gaussian_conditional"].scale_table

        def fn(z_hat, y_cond):
            scales, means = self._apply(z_hat, y_cond, method="entropy_params")
            return scales, means, build_indexes(scales, table)

        return self._jitted("entropy_params", fn)

    def _fused_encode_fn(self):
        table = self.tables["gaussian_conditional"].scale_table
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)
        from ..ops import pallas_kernels as pk

        lim = self._I16_LIM

        def fn(*model_args):
            y_cur, y_cond_lat, z = self._apply(
                *model_args, method="encode_latents"
            )
            z_sym = jnp.clip(
                jnp.round(z.astype(jnp.float32) - medians), -lim, lim
            ).astype(jnp.int16)
            z_hat = z_sym.astype(jnp.float32) + medians
            scales, means = self._apply(
                z_hat, y_cond_lat, method="entropy_params"
            )
            y_sym, idx = pk.quantize_and_index(
                y_cur.astype(jnp.float32), means.astype(jnp.float32),
                scales.astype(jnp.float32), table,
            )
            y_sym = jnp.clip(y_sym, -lim, lim).astype(jnp.int16)
            return jnp.concatenate([
                jax.lax.bitcast_convert_type(y_sym, jnp.uint8).reshape(-1),
                jax.lax.bitcast_convert_type(z_sym, jnp.uint8).reshape(-1),
                idx.reshape(-1),
            ])

        return self._jitted("fused_encode", fn)

    def _fused_params_fn(self):
        table = self.tables["gaussian_conditional"].scale_table
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)

        def fn(z_sym, y_cond_lat):
            z_hat = z_sym.astype(jnp.float32) + medians
            scales, means = self._apply(
                z_hat, y_cond_lat, method="entropy_params"
            )
            idx = build_indexes(
                scales.astype(jnp.float32), table
            ).astype(jnp.uint8)
            return means.astype(jnp.float32), idx

        return self._jitted("fused_params", fn)

    def _fused_finish_fn(self):
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)
        needs_z = self._synthesis_needs_z

        def fn(y_sym, means, z_sym):
            y_hat = y_sym.astype(jnp.float32) + means
            if needs_z:
                z_hat = z_sym.astype(jnp.float32) + medians
                x_hat = self._apply(y_hat, z_hat, method="synthesis")
            else:
                x_hat = self._apply(y_hat, method="synthesis")
            return y_hat, x_hat

        return self._jitted("fused_finish", fn)

    def _latent_shapes(self, x_shape):
        b, h, w = x_shape[0], x_shape[1], x_shape[2]
        yh, yw = h // 16, w // 16
        return (b, yh, yw, self.in_channels), (
            b, yh // 4, yw // 4, self.tables["entropy_bottleneck"].rows
        )

    def _codec_encode(self, x_cur, *rest):
        self._require_tables()
        y_shape, z_shape = self._latent_shapes(jnp.shape(x_cur))
        packed = self._fused_encode_fn()(x_cur, *rest)
        y_sym, z_sym, idx = entropy_base.unpack_symbol_buffer(
            packed, y_shape, z_shape
        )
        zt = self.tables["entropy_bottleneck"]
        z_idx = entropy_base.bottleneck_indexes(z_shape, zt.rows)
        z_strings = entropy_base.compress(
            z_sym.astype(np.int32), z_idx, zt, self.coder
        )
        y_strings = entropy_base.compress(
            y_sym.astype(np.int32), idx,
            self.tables["gaussian_conditional"], self.coder,
        )
        return {
            "strings": [y_strings, z_strings],
            "shape": tuple(z_shape[1:3]),
        }

    def _codec_decode(self, strings, shape, y_cond_lat):
        zt = self.tables["entropy_bottleneck"]
        z_idx = entropy_base.bottleneck_indexes(
            (len(strings[1]), *shape, zt.rows), zt.rows
        )
        z_sym = entropy_base.decompress(strings[1], z_idx, zt, self.coder)
        z_sym_dev = jnp.asarray(z_sym.astype(np.int16))
        means, idx = self._fused_params_fn()(z_sym_dev, y_cond_lat)
        y_sym = entropy_base.decompress(
            strings[0], np.asarray(idx, np.int32),
            self.tables["gaussian_conditional"], self.coder,
        )
        y_hat, x_hat = self._fused_finish_fn()(
            jnp.asarray(y_sym.astype(np.int16)), means, z_sym_dev
        )
        return y_hat, x_hat, means


class StemBaseline(_PixelCodecBase):
    """stem_baseline (stem_roi.py:21-178); v2 via separate_condition_encoder."""

    def __init__(self, entropy_bottleneck_channels: int = 256,
                 in_channels: int = 192, v2: bool = False, **kw):
        super().__init__(
            StemBaselineModule(
                entropy_bottleneck_channels, in_channels,
                separate_condition_encoder=v2,
            ),
            **kw,
        )
        self.in_channels = in_channels

    def compress(self, x_cur, x_conditioned) -> Dict[str, Any]:
        return self._codec_encode(x_cur, x_conditioned)

    def decompress(self, strings, shape, x_conditioned) -> Dict[str, Any]:
        assert isinstance(strings, list) and len(strings) == 2
        self._require_tables()
        y_cond = self._jitted(
            "cond_latent", lambda a: self._apply(a, method="cond_latent")
        )(x_conditioned)
        y_hat, x_hat, means = self._codec_decode(strings, shape, y_cond)
        return {
            "x_hat": x_hat,
            "y_hat": y_hat,
            "entropy_params": {"means_hat": means},
        }

    def get_y(self, x, is_eval: bool = False):
        """getY with eval-time centered ×64 padding (stem_roi.py:144-160)."""
        if is_eval:
            x, _ = pad_centered(jnp.asarray(x), 64)
        return self._jitted(
            "get_y", lambda a: self._apply(a, method="get_y")
        )(x)

    getY = get_y


def StemBaselineV2(**kw):
    return StemBaseline(v2=True, **kw)


class StemROI(_PixelCodecBase):
    """stem_roi (stem_roi.py:353-698); ablations via flags."""

    def __init__(self, entropy_bottleneck_channels: int = 256,
                 in_channels: int = 192, conditional: bool = True,
                 decoder_sft: bool = True, **kw):
        super().__init__(
            StemROIModule(
                entropy_bottleneck_channels, in_channels,
                conditional=conditional, decoder_sft=decoder_sft,
            ),
            **kw,
        )
        self.conditional = conditional
        self.in_channels = in_channels

    _synthesis_needs_z = True  # decoder-side wmap conditioning comes from ẑ

    def compress(self, x_cur, *args) -> Dict[str, Any]:
        return self._codec_encode(x_cur, *args)

    def decompress(self, strings, shape, x_conditioned=None) -> Dict[str, Any]:
        assert isinstance(strings, list) and len(strings) == 2
        self._require_tables()
        if self.conditional:
            y_cond = self._jitted(
                "cond_latent", lambda a: self._apply(a, method="cond_latent")
            )(x_conditioned)
        else:
            b = len(strings[1])
            h, w = shape[0] * 4, shape[1] * 4
            y_cond = jnp.zeros((b, h, w, self.in_channels), jnp.float32)
        y_hat, x_hat, means = self._codec_decode(strings, shape, y_cond)
        return {
            "x_hat": x_hat,
            "y_hat": y_hat,
            "entropy_params": {"means_hat": means},
        }


def StemROIWoGsc(**kw):
    return StemROI(decoder_sft=False, **kw)


def StemROI_I(**kw):
    return StemROI(conditional=False, **kw)
