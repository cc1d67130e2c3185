"""Image codecs: FactorizedPrior, ScaleHyperprior, MeanScaleHyperprior,
JointAutoregressiveHierarchicalPriors.

Architecture parity: compressai/models/priors.py:109-694 (g_a/g_s 4× k5s2
conv+GDN stacks, hyper pair h_a/h_s, optional masked-conv context model +
1×1 entropy-parameters stack). NHWC, pure flax modules; codec paths are host
orchestration in the wrapper classes with jitted device transforms.
"""

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import (
    EntropyBottleneck,
    GaussianConditional,
    build_indexes,
)
from ..entropy import base as entropy_base
from ..layers import GDN, Conv, Deconv, MaskedConv2d, Sequential, leaky_relu
from ..ops.quantize import quantize_dequantize, quantize_noise
from .base import CompressionModel


class _LeakyReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return leaky_relu(x)


class _ReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jax.nn.relu(x)


# ---------------------------------------------------------------------------
# flax modules
# ---------------------------------------------------------------------------


class FactorizedPriorModule(nn.Module):
    """priors.py:109-181 — g_a/g_s only; y coded by the EntropyBottleneck."""

    N: int
    M: int

    def setup(self):
        n, m = self.N, self.M
        self.g_a = Sequential(
            [Conv(n, 5, 2), GDN(n), Conv(n, 5, 2), GDN(n), Conv(n, 5, 2), GDN(n),
             Conv(m, 5, 2)],
            name="g_a",
        )
        self.g_s = Sequential(
            [Deconv(n, 5, 2), GDN(n, inverse=True), Deconv(n, 5, 2),
             GDN(n, inverse=True), Deconv(n, 5, 2), GDN(n, inverse=True),
             Deconv(3, 5, 2)],
            name="g_s",
        )
        self.entropy_bottleneck = EntropyBottleneck(self.M)

    def __call__(self, x, train: bool = False):
        y = self.g_a(x)
        y_hat, y_likelihoods = self.entropy_bottleneck(y, train=train)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods}}

    def analysis(self, x, train: bool = False):
        del train
        return self.g_a(x)

    def synthesis(self, y_hat, train: bool = False):
        del train
        return self.g_s(y_hat)

    def aux_loss(self, train: bool = False):
        del train
        return self.entropy_bottleneck.aux_loss()


class ScaleHyperpriorModule(nn.Module):
    """priors.py:196-313 — hyper pair on |y| → σ only."""

    N: int
    M: int

    def setup(self):
        n, m = self.N, self.M
        self.g_a = Sequential(
            [Conv(n, 5, 2), GDN(n), Conv(n, 5, 2), GDN(n), Conv(n, 5, 2), GDN(n),
             Conv(m, 5, 2)],
            name="g_a",
        )
        self.g_s = Sequential(
            [Deconv(n, 5, 2), GDN(n, inverse=True), Deconv(n, 5, 2),
             GDN(n, inverse=True), Deconv(n, 5, 2), GDN(n, inverse=True),
             Deconv(3, 5, 2)],
            name="g_s",
        )
        self.h_a = Sequential(
            [Conv(n, 3, 1), _ReLU(), Conv(n, 5, 2), _ReLU(), Conv(n, 5, 2)],
            name="h_a",
        )
        self.h_s = Sequential(
            [Deconv(n, 5, 2), _ReLU(), Deconv(n, 5, 2), _ReLU(), Conv(m, 3, 1),
             _ReLU()],
            name="h_s",
        )
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        self.gaussian_conditional = GaussianConditional()

    def __call__(self, x, train: bool = False):
        y = self.g_a(x)
        z = self.h_a(jnp.abs(y))
        z_hat, z_likelihoods = self.entropy_bottleneck(z, train=train)
        scales_hat = self.h_s(z_hat)
        y_hat, y_likelihoods = self.gaussian_conditional(y, scales_hat, train=train)
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    def analysis(self, x, train: bool = False):
        del train
        y = self.g_a(x)
        z = self.h_a(jnp.abs(y))
        return y, z

    def hyper_synthesis(self, z_hat, train: bool = False):
        del train
        return self.h_s(z_hat)

    def synthesis(self, y_hat, train: bool = False):
        del train
        return self.g_s(y_hat)

    def aux_loss(self, train: bool = False):
        del train
        return self.entropy_bottleneck.aux_loss()


class MeanScaleHyperpriorModule(ScaleHyperpriorModule):
    """priors.py:316-402 — h_s outputs (σ, μ); adds getY/getX STEM hooks."""

    def setup(self):
        n, m = self.N, self.M
        self.g_a = Sequential(
            [Conv(n, 5, 2), GDN(n), Conv(n, 5, 2), GDN(n), Conv(n, 5, 2), GDN(n),
             Conv(m, 5, 2)],
            name="g_a",
        )
        self.g_s = Sequential(
            [Deconv(n, 5, 2), GDN(n, inverse=True), Deconv(n, 5, 2),
             GDN(n, inverse=True), Deconv(n, 5, 2), GDN(n, inverse=True),
             Deconv(3, 5, 2)],
            name="g_s",
        )
        self.h_a = Sequential(
            [Conv(n, 3, 1), _LeakyReLU(), Conv(n, 5, 2), _LeakyReLU(), Conv(n, 5, 2)],
            name="h_a",
        )
        self.h_s = Sequential(
            [Deconv(m, 5, 2), _LeakyReLU(), Deconv(m * 3 // 2, 5, 2), _LeakyReLU(),
             Conv(m * 2, 3, 1)],
            name="h_s",
        )
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        self.gaussian_conditional = GaussianConditional()

    def __call__(self, x, train: bool = False):
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, train=train)
        gaussian_params = self.h_s(z_hat)
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        y_hat, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, means_hat, train=train
        )
        x_hat = self.g_s(y_hat)
        return {
            "y": y,
            "y_hat": y_hat,
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    def analysis(self, x, train: bool = False):
        del train
        y = self.g_a(x)
        z = self.h_a(y)
        return y, z

    def hyper_synthesis(self, z_hat, train: bool = False):
        del train
        gaussian_params = self.h_s(z_hat)
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        return scales_hat, means_hat

    def get_y(self, x, train: bool = False):
        """getY hook (priors.py:390-395): latent + quantized latent for STEM."""
        y = self.g_a(x)
        if train:
            y_quantized = quantize_noise(y, self.make_rng("noise"))
        else:
            y_quantized = quantize_dequantize(y)
        return y, y_quantized

    def get_x(self, y_hat, train: bool = False):
        """getX hook (priors.py:397-402): synthesize and clamp to [0, 1]."""
        del train
        return jnp.clip(self.g_s(y_hat), 0.0, 1.0)


class JointAutoregressiveModule(MeanScaleHyperpriorModule):
    """priors.py:406-694 (mbt2018) — + masked-conv context model and 1×1
    entropy-parameters stack; h_a/h_s with k5s2 inner layers. Subclasses
    (Cheng2020) override the ``_build_*`` factories instead of ``setup`` —
    flax forbids rebinding a submodule name."""

    def _build_g_a(self):
        n, m = self.N, self.M
        return Sequential(
            [Conv(n, 5, 2), GDN(n), Conv(n, 5, 2), GDN(n), Conv(n, 5, 2), GDN(n),
             Conv(m, 5, 2)],
            name="g_a",
        )

    def _build_g_s(self):
        n = self.N
        return Sequential(
            [Deconv(n, 5, 2), GDN(n, inverse=True), Deconv(n, 5, 2),
             GDN(n, inverse=True), Deconv(n, 5, 2), GDN(n, inverse=True),
             Deconv(3, 5, 2)],
            name="g_s",
        )

    def _build_h_a(self):
        n = self.N
        return Sequential(
            [Conv(n, 3, 1), _LeakyReLU(), Conv(n, 5, 2), _LeakyReLU(), Conv(n, 5, 2)],
            name="h_a",
        )

    def _build_h_s(self):
        m = self.M
        return Sequential(
            [Deconv(m, 5, 2), _LeakyReLU(), Deconv(m * 3 // 2, 5, 2), _LeakyReLU(),
             Conv(m * 2, 3, 1)],
            name="h_s",
        )

    def setup(self):
        m = self.M
        self.g_a = self._build_g_a()
        self.g_s = self._build_g_s()
        self.h_a = self._build_h_a()
        self.h_s = self._build_h_s()
        self.entropy_parameters = Sequential(
            [Conv(m * 10 // 3, 1, 1), _LeakyReLU(), Conv(m * 8 // 3, 1, 1),
             _LeakyReLU(), Conv(m * 6 // 3, 1, 1)],
            name="entropy_parameters",
        )
        self.context_prediction = MaskedConv2d(2 * m, kernel_size=5, mask_type="A")
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        self.gaussian_conditional = GaussianConditional()

    def __call__(self, x, train: bool = False):
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, train=train)
        params = self.h_s(z_hat)

        # ctx model sees *quantized* latents; the y_hat used for synthesis and
        # the one inside gaussian_conditional are distinct draws — preserved
        # from the reference's double-quantization (priors.py:483-495).
        if train:
            y_hat = quantize_noise(y, self.make_rng("noise"))
        else:
            y_hat = quantize_dequantize(y)
        ctx_params = self.context_prediction(y_hat)
        gaussian_params = self.entropy_parameters(
            jnp.concatenate([params, ctx_params], axis=-1)
        )
        scales_hat, means_hat = jnp.split(gaussian_params, 2, axis=-1)
        _, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, means_hat, train=train
        )
        x_hat = self.g_s(y_hat)
        return {
            "y": y,
            "y_hat": y_hat,
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
            "entropy_params": {"scales_hat": scales_hat, "means_hat": means_hat},
        }

    def hyper_synthesis(self, z_hat, train: bool = False):
        del train
        return self.h_s(z_hat)  # (B, H, W, 2M) params, pre-EPM

    def ar_step(self, y_crop, p_vec, train: bool = False):
        """One AR pixel: 5×5 masked ctx on the crop + 1×1 EPM at the center.

        y_crop: (B, 5, 5, M) window; p_vec: (B, 1, 1, 2M) hyper params at the
        pixel. Returns (scales, means), each (B, M).
        """
        del train
        ctx = self.context_prediction(y_crop)[:, 2:3, 2:3, :]
        gp = self.entropy_parameters(jnp.concatenate([p_vec, ctx], axis=-1))
        scales, means = jnp.split(gp[:, 0, 0, :], 2, axis=-1)
        return scales, means

    def get_y(self, x, train: bool = False):
        """getY (priors.py:686-694): always noise-quantized in the reference."""
        y = self.g_a(x)
        y_quantized = quantize_noise(y, self.make_rng("noise"))
        return y, y_quantized


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------


class FactorizedPrior(CompressionModel):
    downsampling_factor = 2**4

    def __init__(self, N: int, M: int, **kw):
        super().__init__(FactorizedPriorModule(N, M), **kw)
        self.N, self.M = N, M

    def compress(self, x) -> Dict[str, Any]:
        self._require_tables()
        y = self._jitted("analysis", lambda v: self._apply(v, method="analysis"))(x)
        y_strings = self._eb_compress(y)
        return {"strings": [y_strings], "shape": tuple(y.shape[1:3])}

    def decompress(self, strings, shape) -> Dict[str, Any]:
        assert isinstance(strings, list) and len(strings) == 1
        self._require_tables()
        y_hat = self._eb_decompress(strings[0], shape)
        x_hat = self._jitted(
            "synthesis",
            lambda v: jnp.clip(self._apply(v, method="synthesis"), 0.0, 1.0),
        )(y_hat)
        return {"x_hat": x_hat}


class _HyperpriorCodecBase(CompressionModel):
    """Fused single-dispatch codec path shared by the hyperprior image codecs
    (same design as the STEM/ROI fast paths: one jit per compress emitting a
    packed [y int16][z int16][idx u8] byte buffer; two-dispatch decode).

    ``_with_means`` distinguishes the σ-only ScaleHyperprior from the (σ, μ)
    MeanScaleHyperprior."""

    has_gaussian = True
    downsampling_factor = 2**6
    _with_means = False
    _I16_LIM = 32767.0

    def _split_params(self, hyper_out):
        if self._with_means:
            return hyper_out  # (scales, means)
        return hyper_out, None

    def _fused_encode_fn(self):
        table = self.tables["gaussian_conditional"].scale_table
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)
        from ..ops import pallas_kernels as pk

        lim = self._I16_LIM

        def fn(x):
            y, z = self._apply(x, method="analysis")
            z_sym = jnp.clip(jnp.round(z - medians), -lim, lim).astype(
                jnp.int16
            )
            z_hat = z_sym.astype(jnp.float32) + medians
            scales, means = self._split_params(
                self._apply(z_hat, method="hyper_synthesis")
            )
            if means is None:
                means = jnp.zeros_like(scales)
            # f32 island: quantization/CDF-row selection must not depend on
            # the serving compute_dtype (bf16 transforms; exact symbols)
            y_sym, idx = pk.quantize_and_index(
                y.astype(jnp.float32), means.astype(jnp.float32),
                scales.astype(jnp.float32), table)
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

        def fn(z_sym):
            z_hat = z_sym.astype(jnp.float32) + medians
            scales, means = self._split_params(
                self._apply(z_hat, method="hyper_synthesis")
            )
            if means is None:
                means = jnp.zeros_like(scales)
            means = means.astype(jnp.float32)
            idx = build_indexes(scales.astype(jnp.float32),
                                table).astype(jnp.uint8)
            return means, idx

        return self._jitted("fused_params", fn)

    def _fused_finish_fn(self):
        def fn(y_sym, means):
            y_hat = y_sym.astype(jnp.float32) + means
            x_hat = jnp.clip(self._apply(y_hat, method="synthesis"), 0.0, 1.0)
            return y_hat, x_hat

        return self._jitted("fused_finish", fn)

    def compress(self, x) -> Dict[str, Any]:
        self._require_tables()
        b, h, w = jnp.shape(x)[0], jnp.shape(x)[1], jnp.shape(x)[2]
        zt = self.tables["entropy_bottleneck"]
        # k5s2 convs produce ceil-divided sizes (the reference reads tensor
        # shapes instead, priors.py:300-306); ceil-divide so non-×64 inputs
        # unpack correctly.
        y_shape = (b, -(-h // 16), -(-w // 16), self.M)
        z_shape = (b, -(-h // 64), -(-w // 64), zt.rows)
        packed = self._fused_encode_fn()(x)
        y_sym, z_sym, idx = entropy_base.unpack_symbol_buffer(
            packed, y_shape, z_shape
        )
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

    def decompress(self, strings, shape) -> Dict[str, Any]:
        assert isinstance(strings, list) and len(strings) == 2
        self._require_tables()
        zt = self.tables["entropy_bottleneck"]
        z_idx = entropy_base.bottleneck_indexes(
            (len(strings[1]), *shape, zt.rows), zt.rows
        )
        z_sym = entropy_base.decompress(strings[1], z_idx, zt, self.coder)
        means, idx = self._fused_params_fn()(
            jnp.asarray(z_sym.astype(np.int16))
        )
        y_sym = entropy_base.decompress(
            strings[0], np.asarray(idx, np.int32),
            self.tables["gaussian_conditional"], self.coder,
        )
        y_hat, x_hat = self._fused_finish_fn()(
            jnp.asarray(y_sym.astype(np.int16)), means
        )
        if self._with_means:
            return {"x_hat": x_hat, "y_hat": y_hat}
        return {"x_hat": x_hat}


class ScaleHyperprior(_HyperpriorCodecBase):
    _with_means = False

    def __init__(self, N: int, M: int, **kw):
        super().__init__(ScaleHyperpriorModule(N, M), **kw)
        self.N, self.M = N, M


class MeanScaleHyperprior(_HyperpriorCodecBase):
    """priors.py:316-402; adds getY/getX used by the STEM training scripts."""

    _with_means = True

    def __init__(self, N: int, M: int, **kw):
        CompressionModel.__init__(self, MeanScaleHyperpriorModule(N, M), **kw)
        self.N, self.M = N, M

    def get_y(self, x, train: bool = False):
        return self._apply(x, method="get_y", train=train)

    getY = get_y

    def get_x(self, y_hat):
        return self._jitted(
            "get_x", lambda v: self._apply(v, method="get_x")
        )(y_hat)

    getX = get_x


class JointAutoregressiveHierarchicalPriors(MeanScaleHyperprior):
    """mbt2018 (priors.py:406-694). ``ar_mode="wavefront"`` (default) codes
    anti-diagonals in parallel (models/ar_wavefront.py): jitted encode scan
    with zero host syncs, one host rANS call per wavefront on decode.
    ``ar_mode="serial"`` is the reference's per-pixel raster order."""

    # "auto"/"grouped"/"lane" — see models/stem.py for the v2 grouped
    # wavefront wire format; resolved by ar_wavefront.wire_format. A class
    # attribute because Cheng2020Anchor/Attention bypass this __init__.
    wavefront_format = "auto"

    def __init__(self, N: int = 192, M: int = 192, ar_mode: str = "wavefront",
                 **kw):
        CompressionModel.__init__(self, JointAutoregressiveModule(N, M), **kw)
        self.N, self.M = N, M
        self.ar_mode = ar_mode
        self._wavefront_cache: Dict[Any, Any] = {}

    # -- wavefront AR codec ---------------------------------------------------

    def _wavefront_setup(self, h: int, w: int):
        from . import ar_wavefront as wf

        key = (h, w)
        if key not in self._wavefront_cache:
            coords, valid = wf.wavefront_tables(h, w)
            table = self.tables["gaussian_conditional"].scale_table

            def apply_ar_step(crops, pvec):
                return self._apply(crops, pvec, method="ar_step")

            encoder = wf.make_wavefront_encoder(apply_ar_step, table, self.M)
            params_step, write_step, fused_step = (
                wf.make_wavefront_decode_step(apply_ar_step, table)
            )
            self._wavefront_cache[key] = (
                coords, valid, encoder, params_step, write_step, fused_step,
            )
        return self._wavefront_cache[key]

    def _compress_wavefront(self, y, params, z, z_strings):
        from . import ar_wavefront as wf

        b, hgt, wid, _ = y.shape
        coords, valid, encoder, *_ = self._wavefront_setup(hgt, wid)
        syms, idxs, _ = encoder(jnp.asarray(y), params, coords, valid)
        sym_flat = wf.flatten_wavefront(syms, coords, valid)
        idx_flat = wf.flatten_wavefront(idxs, coords, valid)
        t = self.tables["gaussian_conditional"]
        if wf.wire_format(self.wavefront_format, self.coder) == "grouped":
            sizes = wf.round_sizes(valid, 1, self.M)
            levels = t.cdf.shape[0]
            y_strings = []
            for i in range(b):
                sym_g, seg_counts = wf.group_round_symbols(
                    sym_flat[i], idx_flat[i], sizes, levels
                )
                y_strings.append(self.coder.encode_runs_segmented(
                    sym_g, seg_counts, t.cdf, t.cdf_length, t.offset
                ))
        else:
            y_strings = [
                self.coder.encode_stream(
                    sym_flat[i], idx_flat[i], t.cdf, t.cdf_length, t.offset
                )
                for i in range(b)
            ]
        return {"strings": [y_strings, z_strings], "shape": tuple(z.shape[1:3])}

    def _decompress_wavefront(self, strings, params, hgt, wid):
        from . import ar_wavefront as wf

        b = params.shape[0]
        m = self.M
        t = self.tables["gaussian_conditional"]
        coords, valid, _, params_step, write_step, fused_step = (
            self._wavefront_setup(hgt, wid)
        )
        valid_np = np.asarray(valid)
        decoders = [self.coder.make_stream_decoder(s) for s in strings[0]]
        grouped = wf.wire_format(self.wavefront_format, self.coder) == "grouped"
        y_hat_pad = jnp.zeros((b, hgt + 4, wid + 4, m), jnp.float32)
        L = coords.shape[1]
        T = coords.shape[0]
        means, idx = params_step(y_hat_pad, params, coords[0])
        for ti in range(T):
            v = valid_np[ti]
            n_valid = int(v.sum())
            idx_np = np.asarray(idx, np.int32)
            sym = np.zeros((b, L, m), np.int32)
            for i in range(b):
                idx_r = idx_np[i, v].reshape(-1)
                if grouped:
                    decoded = wf.decode_round_grouped(decoders[i], idx_r, t)
                else:
                    decoded = decoders[i].decode(
                        idx_r, t.cdf, t.cdf_length, t.offset
                    )
                sym[i, v] = decoded.reshape(n_valid, m)
            if ti + 1 < T:
                y_hat_pad, means, idx = fused_step(
                    y_hat_pad, params, coords[ti], valid[ti],
                    jnp.asarray(sym), means, coords[ti + 1],
                )
            else:
                y_hat_pad = write_step(
                    y_hat_pad, coords[ti], valid[ti], jnp.asarray(sym), means
                )
        return y_hat_pad[:, 2:-2, 2:-2, :]

    # -- AR helpers ---------------------------------------------------------

    def _ar_step_fn(self):
        table = self.tables["gaussian_conditional"].scale_table

        def fn(y_hat_pad, params, h, w):
            # y_hat_pad: (B, H+4, W+4, M); params: (B, H, W, 2M)
            crop = jax.lax.dynamic_slice(
                y_hat_pad,
                (0, h, w, 0),
                (y_hat_pad.shape[0], 5, 5, y_hat_pad.shape[3]),
            )
            p_vec = jax.lax.dynamic_slice(
                params, (0, h, w, 0), (params.shape[0], 1, 1, params.shape[3])
            )
            scales, means = self._apply(crop, p_vec, method="ar_step")
            indexes = build_indexes(scales, table)
            return crop[:, 2, 2, :], means, indexes

        return self._jitted("ar_step", fn)

    def _ar_write_fn(self):
        def fn(y_hat_pad, value, h, w):
            return jax.lax.dynamic_update_slice(
                y_hat_pad, value[:, None, None, :], (0, h + 2, w + 2, 0)
            )

        return self._jitted("ar_write", fn)

    def compress(self, x) -> Dict[str, Any]:
        self._require_tables()
        y, z = self._jitted("analysis", lambda v: self._apply(v, method="analysis"))(x)
        z_strings = self._eb_compress(z)
        z_hat = self._eb_quantize(z)
        params = self._jitted(
            "hyper_synthesis", lambda v: self._apply(v, method="hyper_synthesis")
        )(z_hat)

        if self.ar_mode == "wavefront":
            return self._compress_wavefront(y, params, z, z_strings)

        b, hgt, wid, m = y.shape
        y_hat_pad = jnp.pad(y, ((0, 0), (2, 2), (2, 2), (0, 0)))
        step = self._ar_step_fn()
        write = self._ar_write_fn()

        symbols_all, indexes_all = [], []
        for h in range(hgt):
            for w in range(wid):
                y_center, means, indexes = step(y_hat_pad, params, h, w)
                sym = np.round(np.asarray(y_center) - np.asarray(means)).astype(
                    np.int32
                )
                y_hat_pad = write(y_hat_pad, jnp.asarray(sym) + means, h, w)
                symbols_all.append(sym)
                indexes_all.append(np.asarray(indexes))

        t = self.tables["gaussian_conditional"]
        y_strings = []
        for i in range(b):
            syms = np.stack([s[i] for s in symbols_all]).reshape(-1)
            idxs = np.stack([ix[i] for ix in indexes_all]).reshape(-1)
            y_strings.append(
                self.coder.encode_stream(
                    syms, idxs, t.cdf, t.cdf_length, t.offset
                )
            )
        return {"strings": [y_strings, z_strings], "shape": tuple(z.shape[1:3])}

    def decompress(self, strings, shape) -> Dict[str, Any]:
        assert isinstance(strings, list) and len(strings) == 2
        self._require_tables()
        z_hat = self._eb_decompress(strings[1], shape)
        params = self._jitted(
            "hyper_synthesis", lambda v: self._apply(v, method="hyper_synthesis")
        )(z_hat)

        if self.ar_mode == "wavefront":
            y_hat = self._decompress_wavefront(
                strings, jnp.asarray(params), shape[0] * 4, shape[1] * 4
            )
            x_hat = self._jitted(
                "synthesis",
                lambda v: jnp.clip(self._apply(v, method="synthesis"), 0.0, 1.0),
            )(y_hat)
            return {"x_hat": x_hat, "y_hat": y_hat}

        b = z_hat.shape[0]
        hgt, wid = shape[0] * 4, shape[1] * 4
        m = self.M
        t = self.tables["gaussian_conditional"]
        step = self._ar_step_fn()
        write = self._ar_write_fn()

        decoders = [self.coder.make_stream_decoder(s) for s in strings[0]]
        y_hat_pad = jnp.zeros((b, hgt + 4, wid + 4, m), jnp.float32)
        for h in range(hgt):
            for w in range(wid):
                _, means, indexes = step(y_hat_pad, params, h, w)
                idx_np = np.asarray(indexes)
                sym = np.stack(
                    [
                        decoders[i].decode(idx_np[i], t.cdf, t.cdf_length, t.offset)
                        for i in range(b)
                    ]
                )
                y_hat_pad = write(y_hat_pad, jnp.asarray(sym) + means, h, w)

        y_hat = y_hat_pad[:, 2:-2, 2:-2, :]
        x_hat = self._jitted(
            "synthesis",
            lambda v: jnp.clip(self._apply(v, method="synthesis"), 0.0, 1.0),
        )(y_hat)
        return {"x_hat": x_hat, "y_hat": y_hat}
