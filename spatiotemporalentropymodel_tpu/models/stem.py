"""STEM — Spatio-Temporal Entropy Model P-frame family.

Parity target: compressai/models/spatiotemporalpriors.py (1072 LoC, five
near-identical classes). Here one parameterized implementation covers all five
variants (the reference's acknowledged TODO, spatiotemporalpriors.py:32):

  variant                    priors fused in EPM        EPM input  codec path
  ---------------------------------------------------------------------------
  without_spm_tpm            hyper                      2M         parallel
  without_spm                TPM + hyper                4M         parallel
  without_tpm                SPM + hyper                4M         serial AR
  full                       TPM + hyper + SPM          6M         serial AR
  res (flagship)             TPM + hyper + SPM on the   6M         serial AR
                             residual y_cur − y_cond

Common blocks (spatiotemporalpriors.py:43-65, 142-171, 523-556):
  HE : k3s1(→256) + 2 × k5s2(→256/EB-ch) hyper-encoder over cat(y_cur, y_cond)
  HD : mirror transposed stack → 2M channels
  TPM: 3 × k5s1 (256→320→2M) temporal prior on y_cond
  SPM: MaskedConv2d(M→2M, k5) spatial context
  EPM: 1×1 stack (in→768→576→2M) fusing the priors → (σ, μ)

All NHWC; inputs are latents (B, H, W, M) with M=192, EB channels 256 by
default. Training noise via the "noise" RNG stream.
"""

import time
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyBottleneck, GaussianConditional, build_indexes
from ..entropy import base as entropy_base
from ..layers import Conv, Deconv, MaskedConv2d, Sequential, leaky_relu
from ..ops.quantize import quantize_dequantize, quantize_noise
from .base import CompressionModel

STEM_VARIANTS = ("without_spm_tpm", "without_spm", "without_tpm", "full", "res")


class _LeakyReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return leaky_relu(x)


class STEMModule(nn.Module):
    """One parameterized module covering the five reference variants."""

    variant: str = "res"
    entropy_bottleneck_channels: int = 256
    in_channels: int = 192

    @property
    def use_tpm(self) -> bool:
        return self.variant in ("without_spm", "full", "res")

    @property
    def use_spm(self) -> bool:
        return self.variant in ("without_tpm", "full", "res")

    @property
    def residual(self) -> bool:
        return self.variant == "res"

    def setup(self):
        if self.variant not in STEM_VARIANTS:
            raise ValueError(f"unknown STEM variant: {self.variant!r}")
        m = self.in_channels
        ebc = self.entropy_bottleneck_channels

        # The reference hard-codes a 256-wide HE tail in the two non-SPM
        # variants (spatiotemporalpriors.py:44-49) — only consistent with the
        # EntropyBottleneck when ebc == 256 (the default). We use ebc uniformly
        # (:261-265, :531-535 do the same), identical at the default config.
        self.HE = Sequential(
            [Conv(256, 3, 1), _LeakyReLU(), Conv(256, 5, 2), _LeakyReLU(),
             Conv(ebc, 5, 2)],
            name="HE",
        )
        self.HD = Sequential(
            [Deconv(256, 5, 2), _LeakyReLU(), Deconv(256, 5, 2), _LeakyReLU(),
             Conv(m * 2, 3, 1)],
            name="HD",
        )
        if self.use_tpm:
            self.TPM = Sequential(
                [Conv(256, 5, 1), _LeakyReLU(), Conv(320, 5, 1), _LeakyReLU(),
                 Conv(m * 2, 5, 1)],
                name="TPM",
            )
        if self.use_spm:
            self.context_prediction = MaskedConv2d(2 * m, kernel_size=5,
                                                   mask_type="A")
        n_priors = 1 + int(self.use_tpm) + int(self.use_spm)
        del n_priors  # EPM input channels are implied by concatenation
        self.EPM = Sequential(
            [Conv(768, 1, 1), _LeakyReLU(), Conv(576, 1, 1), _LeakyReLU(),
             Conv(m * 2, 1, 1)],
            name="EPM",
        )
        self.entropy_bottleneck = EntropyBottleneck(ebc)
        self.gaussian_conditional = GaussianConditional()

    # ---- shared sub-computations ------------------------------------------

    def _priors_no_spm(self, z_hat, y_conditioned):
        feats = [self.HD(z_hat)]
        if self.use_tpm:
            feats.insert(0, self.TPM(y_conditioned))
        return feats

    def _epm(self, feats):
        gp = self.EPM(jnp.concatenate(feats, axis=-1))
        return jnp.split(gp, 2, axis=-1)  # scales, means

    # ---- training / estimation forward ------------------------------------

    def __call__(self, y_cur, y_conditioned, train: bool = False):
        """Forward with rate estimation (dict contract of the reference:
        {"y_hat", "likelihoods": {"y", "z"}})."""
        z = self.HE(jnp.concatenate([y_cur, y_conditioned], axis=-1))
        z_hat, z_likelihoods = self.entropy_bottleneck(z, train=train)
        feats = self._priors_no_spm(z_hat, y_conditioned)

        target = y_cur - y_conditioned if self.residual else y_cur

        if self.use_spm:
            # ctx model sees the quantized target (double quantization kept
            # from the reference, spatiotemporalpriors.py:570-579, 852-862)
            if train:
                target_hat = quantize_noise(target, self.make_rng("noise"))
            else:
                target_hat = quantize_dequantize(target)
            feats = feats + [self.context_prediction(target_hat)]
            scales_hat, means_hat = self._epm(feats)
            _, y_likelihoods = self.gaussian_conditional(
                target, scales_hat, means_hat, train=train
            )
            y_hat = target_hat + y_conditioned if self.residual else target_hat
        else:
            scales_hat, means_hat = self._epm(feats)
            q_hat, y_likelihoods = self.gaussian_conditional(
                target, scales_hat, means_hat, train=train
            )
            y_hat = q_hat + y_conditioned if self.residual else q_hat

        return {
            "y_hat": y_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    # ---- codec-path sub-functions (jitted by the wrapper) ------------------

    def hyper_encode(self, y_cur, y_conditioned, train: bool = False):
        del train
        return self.HE(jnp.concatenate([y_cur, y_conditioned], axis=-1))

    def entropy_params(self, z_hat, y_conditioned, train: bool = False):
        """Parallel-variant (σ, μ) from hyper (+ TPM) priors."""
        del train
        return self._epm(self._priors_no_spm(z_hat, y_conditioned))

    def prior_feats(self, z_hat, y_conditioned, train: bool = False):
        """AR-variant prior features before SPM fusion: (B, H, W, 2M·k)."""
        del train
        return jnp.concatenate(self._priors_no_spm(z_hat, y_conditioned), axis=-1)

    def ar_step(self, target_crop, prior_vec, train: bool = False):
        """One AR pixel: masked 5×5 ctx at the crop center + 1×1 EPM."""
        del train
        ctx = self.context_prediction(target_crop)[:, 2:3, 2:3, :]
        gp = self.EPM(jnp.concatenate([prior_vec, ctx], axis=-1))
        scales, means = jnp.split(gp[:, 0, 0, :], 2, axis=-1)
        return scales, means

    def aux_loss(self, train: bool = False):
        del train
        return self.entropy_bottleneck.aux_loss()


class SpatioTemporalPriorModel(CompressionModel):
    """Host wrapper with the reference's compress/decompress API:

      compress(y_cur, y_conditioned) -> {"strings": [y, z], "shape"}
      decompress(strings, shape, y_conditioned) -> {"y_hat": ...}

    Note the reference returns a bare tensor from most variants and a dict
    from the Res variant (spatiotemporalpriors.py:1012 — API inconsistency);
    here every variant returns the dict form.
    """

    has_gaussian = True

    def __init__(
        self,
        variant: str = "res",
        entropy_bottleneck_channels: int = 256,
        in_channels: int = 192,
        ar_mode: str = "wavefront",
        compute_dtype=None,
        wavefront_tile=None,
        **kw,
    ):
        """ar_mode (SPM variants only): "wavefront" — parallel anti-diagonal
        scheduling, one jitted encode scan + one host rANS call per wavefront
        (the fast TPU format); "serial" — per-pixel raster loop matching the
        reference's coding order (spatiotemporalpriors.py:633-768).

        wavefront_tile: optional (th, tw). Tiles the latent into th×tw
        blocks whose SPM context resets at tile borders (the video-codec
        slices/tiles idea); every tile advances in the same wavefront round,
        so decode needs 3(th−1)+tw host rounds instead of 3(H−1)+W — ~4×
        fewer at 1080p with (17, 30) — at a marginal rate cost near borders.
        Hyper/temporal priors stay global; only the masked-conv context is
        tiled. Latent dims must be divisible by the tile.

        compute_dtype: e.g. jnp.bfloat16 runs the codec-path transform convs
        on the MXU at 2× throughput. Encoder and decoder evaluate the SAME
        jitted entropy-parameter network, so the bitstream stays
        self-consistent; only the RD point shifts marginally.
        """
        super().__init__(
            STEMModule(variant, entropy_bottleneck_channels, in_channels), **kw
        )
        self.variant = variant
        self.in_channels = in_channels
        self.ar_mode = ar_mode
        self.compute_dtype = compute_dtype
        self.wavefront_tile = (
            tuple(int(v) for v in wavefront_tile) if wavefront_tile else None
        )
        self._wavefront_cache = {}
        # wavefront stream symbol order: "lane" (v1 default — wavefront lane
        # order, per-symbol indexed coding) or "grouped" (v2 — per-round
        # grouped-by-CDF-row run coding; measured SLOWER on the host at 1080p
        # because the per-frame stable permutation costs ~4× the coding
        # itself, see ar_wavefront.wire_format). NOT bitstream compatible
        # with each other; .stemv records which one a file carries.
        self.wavefront_format = "auto"
        # optional observability hook (training/logging.py StageTimer's codec
        # cousin): set to a dict and the wavefront codec paths accumulate
        # {"host_rans_s", "device_s", "rounds"} — bench.py's PCIe projection
        # splits host-coder from device+fetch cost with it
        self._codec_stats = None

    def _wf_format(self) -> str:
        from . import ar_wavefront as wf

        return wf.wire_format(self.wavefront_format, self.coder)

    def _cast(self, x):
        if self.compute_dtype is not None:
            return jnp.asarray(x, self.compute_dtype)
        return jnp.asarray(x)

    @property
    def use_spm(self):
        return self.module.use_spm

    @property
    def residual(self):
        return self.module.residual

    # ---- parallel codec path ----------------------------------------------
    #
    # TPU-first design: ONE fused jit produces all integer planes the host
    # coder needs — z symbols, y symbols, and uint8 CDF-row indexes — so a
    # compress() costs a single device dispatch plus compact int transfers
    # (the reference crosses the device boundary per tensor and converts to
    # Python lists, entropy_models.py:222-231).

    def _params_indexes_fn(self):
        table = self.tables["gaussian_conditional"].scale_table

        def fn(z_hat, y_cond):
            scales, means = self._apply(z_hat, y_cond, method="entropy_params")
            return scales, means, build_indexes(scales, table)

        return self._jitted("entropy_params", fn)

    # Fused fast path saturates symbols to int16 so a whole frame's coder
    # input crosses the host boundary as ONE packed byte buffer
    # ([y int16][z int16][idx u8]) — transfer latency dominates on remote
    # hosts, and per-call overhead is ~tens of ms through a tunnel.
    _I16_LIM = 32767.0

    def fused_encode_expr(self, y_cur, y_cond):
        """Traceable whole-encode expression: (y_cur, y_cond) → packed byte
        buffer [y int16][z int16][idx u8]. Composable into larger jits (see
        eval/pipeline.py); ``compress`` jits it standalone."""
        table = self.tables["gaussian_conditional"].scale_table
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)
        from ..ops import pallas_kernels as pk

        lim = self._I16_LIM
        y_cur_c, y_cond_c = self._cast(y_cur), self._cast(y_cond)
        z = self._apply(y_cur_c, y_cond_c, method="hyper_encode")
        z32 = z.astype(jnp.float32)
        z_sym = jnp.clip(jnp.round(z32 - medians), -lim, lim).astype(jnp.int16)
        z_hat = self._cast(z_sym.astype(jnp.float32) + medians)
        scales, means = self._apply(z_hat, y_cond_c, method="entropy_params")
        scales = scales.astype(jnp.float32)
        means = means.astype(jnp.float32)
        target = (
            jnp.asarray(y_cur, jnp.float32) - jnp.asarray(y_cond, jnp.float32)
            if self.residual
            else jnp.asarray(y_cur, jnp.float32)
        )
        # fused round/clip/searchsorted (Pallas on TPU)
        y_sym, idx = pk.quantize_and_index(target, means, scales, table)
        y_sym = jnp.clip(y_sym, -lim, lim).astype(jnp.int16)
        return jnp.concatenate([
            jax.lax.bitcast_convert_type(y_sym, jnp.uint8).reshape(-1),
            jax.lax.bitcast_convert_type(z_sym, jnp.uint8).reshape(-1),
            idx.reshape(-1),
        ])

    def fused_params_expr(self, z_sym, y_cond):
        """Traceable decoder-side (z_sym, y_cond) → (means f32, idx u8)."""
        table = self.tables["gaussian_conditional"].scale_table
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)
        z_hat = self._cast(z_sym.astype(jnp.float32) + medians)
        scales, means = self._apply(
            z_hat, self._cast(y_cond), method="entropy_params"
        )
        scales = scales.astype(jnp.float32)
        means = means.astype(jnp.float32)
        idx = build_indexes(scales, table).astype(jnp.uint8)
        return means, idx

    def fused_reconstruct_expr(self, y_sym, means, y_cond):
        target_hat = y_sym.astype(jnp.float32) + means
        return target_hat + y_cond if self.residual else target_hat

    # ---- sparse-grouped transport -------------------------------------------
    #
    # At production operating points (0.08-0.16 bpp, README.md:115-119) the
    # vast majority of y symbols are 0 and the host coder is bandwidth-bound
    # through remote/PCIe links. This transport sorts symbols by CDF row on
    # device and ships (bitmask + compacted nonzero int8 values + 64 row
    # counts) instead of dense int16 planes — ~8× fewer bytes — and the
    # decoder needs only the 256-byte counts vector D2H instead of the full
    # index plane (it recomputes indexes from ẑ on device). Wire format:
    # grouped-by-row symbol order (a pipeline fast format; the model APIs
    # keep the reference's CHW order).

    _I8_LIM = 127

    @staticmethod
    def _sparse_capacity(n: int) -> int:
        from ..entropy.transport import sparse_capacity

        return sparse_capacity(n)

    def fused_encode_sparse_expr(self, y_cur, y_cond):
        """(y_cur, y_cond) → ONE packed u8 transport buffer.

        Layout per whole batch (b elements, n = h·w·M symbols and
        zn = zh·zw·zc each, L scale levels,
        C = entropy/transport.py::sparse_capacity(n)):
          [y bitmask  b·n/8  u8, little-endian bits over the SORTED plane]
          [y values   b·C    i8, compacted nonzeros of the sorted plane]
          [counts     b·L    i32, symbols per CDF row]
          [z_sym      b·zn   i8]
          [meta       b·2    i32: (nonzero count, overflow flag)]
        overflow = any |symbol| > 127 or nonzeros > C → the host must fall
        back to the dense int16 path (entropy/transport.py::unpack_encode).
        """
        table = self.tables["gaussian_conditional"].scale_table
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)
        from ..ops import pallas_kernels as pk

        y_cur_c, y_cond_c = self._cast(y_cur), self._cast(y_cond)
        z = self._apply(y_cur_c, y_cond_c, method="hyper_encode")
        z32 = z.astype(jnp.float32)
        lim = float(self._I8_LIM)
        z_sym_raw = jnp.round(z32 - medians)
        z_over = jnp.any(jnp.abs(z_sym_raw) > lim)
        z_sym = jnp.clip(z_sym_raw, -lim, lim).astype(jnp.int8)
        z_hat = self._cast(z_sym.astype(jnp.float32) + medians)
        scales, means = self._apply(z_hat, y_cond_c, method="entropy_params")
        target = (
            jnp.asarray(y_cur, jnp.float32) - jnp.asarray(y_cond, jnp.float32)
            if self.residual
            else jnp.asarray(y_cur, jnp.float32)
        )
        y_sym, idx = pk.quantize_and_index(
            target, means.astype(jnp.float32), scales.astype(jnp.float32),
            table,
        )

        b = y_sym.shape[0]
        n = y_sym.size // b
        levels = int(table.shape[0])
        cap = self._sparse_capacity(n)

        y_flat = y_sym.reshape(b, n)
        idx_flat = idx.reshape(b, n).astype(jnp.int32)
        y_over = jnp.any(jnp.abs(y_flat) > self._I8_LIM, axis=-1)

        order = jnp.argsort(idx_flat, axis=-1)  # stable in JAX
        y_sorted = jnp.take_along_axis(y_flat, order, axis=-1)
        y_sorted = jnp.clip(y_sorted, -self._I8_LIM, self._I8_LIM).astype(
            jnp.int8
        )
        mask = y_sorted != 0
        nz = mask.sum(axis=-1, dtype=jnp.int32)
        pos = jnp.cumsum(mask, axis=-1, dtype=jnp.int32) - 1
        pos = jnp.where(mask & (pos < cap), pos, cap)  # overflow → dump slot
        values = (
            jnp.zeros((b, cap + 1), jnp.int8)
            .at[jnp.arange(b)[:, None], pos]
            .set(y_sorted)[:, :cap]
        )
        counts = jax.vmap(lambda r: jnp.bincount(r, length=levels))(idx_flat)

        bits = mask.reshape(b, n // 8, 8).astype(jnp.uint32)
        maskbits = jnp.sum(
            bits << jnp.arange(8, dtype=jnp.uint32), axis=-1
        ).astype(jnp.uint8)

        overflow = (y_over | (nz > cap) | z_over).astype(jnp.int32)
        meta = jnp.stack([nz, overflow], axis=-1)  # (b, 2) i32

        as_u8 = lambda v: jax.lax.bitcast_convert_type(v, jnp.uint8).reshape(-1)  # noqa: E731
        return jnp.concatenate([
            maskbits.reshape(-1),
            as_u8(values),
            as_u8(counts.astype(jnp.int32)),
            as_u8(z_sym),
            as_u8(meta),
        ])

    def fused_encode_sparse_carry_expr(self, y_cur, y_cond):
        """Sparse encode + the decoder-consistent ŷ for the GOP carry.

        The encoder-side recurrence must condition the next P-frame on the
        SAME ŷ the decoder reconstructs (evalSTEM.py:144-153 carries
        out_dec['y_hat']) — carrying the raw latent drifts. The carry clips
        at the DENSE transport's int16 band: identical to the int8-clipped
        sparse reconstruction whenever the frame ships sparse, and identical
        to the dense fallback's reconstruction when int8 overflows — so a
        mid-GOP fallback (eval/pipeline.py::encode_frames) never drifts."""
        packed = self.fused_encode_sparse_expr(y_cur, y_cond)
        # recompute ŷ cheaply from the same subexpressions (XLA CSEs the
        # shared networks inside the single jit)
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)
        lim = self._I16_LIM
        y_cur_c, y_cond_c = self._cast(y_cur), self._cast(y_cond)
        z = self._apply(y_cur_c, y_cond_c, method="hyper_encode")
        z_sym = jnp.clip(jnp.round(z.astype(jnp.float32) - medians),
                         -lim, lim)
        z_hat = self._cast(z_sym + medians)
        _, means = self._apply(z_hat, y_cond_c, method="entropy_params")
        means = means.astype(jnp.float32)
        target = (
            jnp.asarray(y_cur, jnp.float32) - jnp.asarray(y_cond, jnp.float32)
            if self.residual
            else jnp.asarray(y_cur, jnp.float32)
        )
        sym = jnp.clip(jnp.round(target - means), -lim, lim)
        target_hat = sym + means
        y_hat = (
            target_hat + jnp.asarray(y_cond, jnp.float32)
            if self.residual
            else target_hat
        )
        return packed, y_hat

    def fused_params_sparse_expr(self, z_sym, y_cond):
        """Decoder-side (z_sym i8, y_cond) → (counts i32, order i32, means).

        Only `counts` (b·L·4 bytes) needs to cross to the host; `order` and
        `means` stay device-resident for fused_reconstruct_sparse_expr.
        """
        table = self.tables["gaussian_conditional"].scale_table
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)
        z_hat = self._cast(z_sym.astype(jnp.float32) + medians)
        scales, means = self._apply(
            z_hat, self._cast(y_cond), method="entropy_params"
        )
        means = means.astype(jnp.float32)
        idx = build_indexes(scales.astype(jnp.float32), table)
        b = idx.shape[0]
        n = idx.size // b
        idx_flat = idx.reshape(b, n).astype(jnp.int32)
        levels = int(table.shape[0])
        counts = jax.vmap(lambda r: jnp.bincount(r, length=levels))(idx_flat)
        order = jnp.argsort(idx_flat, axis=-1)
        return counts.astype(jnp.int32), order, means

    def fused_reconstruct_sparse_expr(self, maskbits, values, order, means,
                                      y_cond):
        """(bitmask u8, compacted values i8, order, means) → ŷ.

        Inverts the sparse transport on device: unpack bits → gather the
        compacted values via the mask's prefix sum → scatter back to spatial
        order through `order`.
        """
        b = means.shape[0]
        n = means.size // b
        cap = values.shape[1]
        bits = (
            (maskbits.reshape(b, n // 8, 1) >> jnp.arange(8, dtype=jnp.uint8))
            & 1
        )
        mask = bits.reshape(b, n).astype(bool)
        cums = jnp.cumsum(mask, axis=-1, dtype=jnp.int32)
        gathered = jnp.take_along_axis(
            values, jnp.clip(cums - 1, 0, cap - 1), axis=-1
        )
        y_sorted = jnp.where(mask, gathered, jnp.int8(0))
        y_flat = (
            jnp.zeros((b, n), jnp.int32)
            .at[jnp.arange(b)[:, None], order]
            .set(y_sorted.astype(jnp.int32))
        )
        y_sym = y_flat.reshape(means.shape)
        target_hat = y_sym.astype(jnp.float32) + means
        return target_hat + y_cond if self.residual else target_hat

    def _fused_encode_fn(self):
        return self._jitted("fused_encode", self.fused_encode_expr)

    def _fused_params_fn(self):
        return self._jitted("fused_params", self.fused_params_expr)

    def _fused_reconstruct_fn(self):
        return self._jitted("fused_reconstruct", self.fused_reconstruct_expr)

    def compress(self, y_cur, y_conditioned) -> Dict[str, Any]:
        self._require_tables()
        if self.use_spm:
            z = self._jitted(
                "hyper_encode",
                lambda a, b: self._apply(a, b, method="hyper_encode"),
            )(y_cur, y_conditioned)
            z_strings = self._eb_compress(z)
            z_hat = jnp.asarray(self._eb_quantize(z))
            if self.ar_mode == "wavefront":
                return self._compress_wavefront(
                    y_cur, y_conditioned, z, z_hat, z_strings
                )
            return self._compress_ar(y_cur, y_conditioned, z, z_hat, z_strings)

        b, hgt, wid, m = jnp.shape(y_cur)
        zh, zw = -(-hgt // 4), -(-wid // 4)  # k5s2 convs ceil-divide
        zt = self.tables["entropy_bottleneck"]
        zc = zt.rows
        packed = np.asarray(self._fused_encode_fn()(y_cur, y_conditioned))

        ny = b * hgt * wid * m
        nz = b * zh * zw * zc
        y_sym = packed[: 2 * ny].view(np.int16).reshape(b, hgt, wid, m)
        z_sym = packed[2 * ny : 2 * (ny + nz)].view(np.int16).reshape(
            b, zh, zw, zc
        )
        idx = packed[2 * (ny + nz) :].reshape(b, hgt, wid, m).astype(np.int32)

        z_idx = entropy_base.bottleneck_indexes(z_sym.shape, zc)
        z_strings = entropy_base.compress(
            z_sym.astype(np.int32), z_idx, zt, self.coder
        )
        y_strings = entropy_base.compress(
            y_sym.astype(np.int32), idx,
            self.tables["gaussian_conditional"], self.coder,
        )
        return {"strings": [y_strings, z_strings], "shape": (zh, zw)}

    def decompress(self, strings, shape, y_conditioned) -> Dict[str, Any]:
        assert isinstance(strings, list) and len(strings) == 2
        self._require_tables()
        if self.use_spm:
            z_hat = jnp.asarray(self._eb_decompress(strings[1], shape))
            if self.ar_mode == "wavefront":
                return self._decompress_wavefront(strings, z_hat, y_conditioned)
            return self._decompress_ar(strings, z_hat, y_conditioned)

        zt = self.tables["entropy_bottleneck"]
        z_idx = entropy_base.bottleneck_indexes(
            (len(strings[1]), *shape, zt.rows), zt.rows
        )
        z_sym = entropy_base.decompress(strings[1], z_idx, zt, self.coder)
        means, idx = self._fused_params_fn()(
            jnp.asarray(z_sym.astype(np.int16)), y_conditioned
        )
        y_sym = entropy_base.decompress(
            strings[0], np.asarray(idx, np.int32),
            self.tables["gaussian_conditional"], self.coder,
        )
        # int16 upload: the fused encoder saturated symbols to int16
        y_hat = self._fused_reconstruct_fn()(
            jnp.asarray(y_sym.astype(np.int16)), means, y_conditioned
        )
        return {"y_hat": y_hat}

    # ---- wavefront AR codec path (SPM variants, fast format) ---------------

    def _wavefront_setup(self, h: int, w: int):
        from . import ar_wavefront as wf

        key = (h, w)
        if key not in self._wavefront_cache:
            coords, valid = wf.wavefront_tables(h, w)
            table = self.tables["gaussian_conditional"].scale_table

            def apply_ar_step(crops, pvec):
                return self._apply(crops, pvec, method="ar_step")

            encoder = wf.make_wavefront_encoder(
                apply_ar_step, table, self.in_channels
            )
            params_step, write_step, fused_step = wf.make_wavefront_decode_step(
                apply_ar_step, table
            )
            self._wavefront_cache[key] = (
                coords, valid, encoder, params_step, write_step, fused_step,
            )
        return self._wavefront_cache[key]

    def _tile_dims(self, hgt: int, wid: int):
        """(th, tw, nt) for the configured wavefront tiling (nt=1 untiled)."""
        if not self.wavefront_tile:
            return hgt, wid, 1
        th, tw = self.wavefront_tile
        # Non-empty-round invariant (the decode loop skips the n_valid == 0
        # guard): round t covers coords with 3r + c == t, c < tw. For th > 1
        # that needs tw >= 3 (else e.g. (2,2) leaves t=2 empty); single-row
        # tiles have t = c, so every tw >= 1 works — (1,2) is the 2-round
        # latency-lever config.
        if th < 1 or tw < 1 or (th > 1 and tw < 3):
            raise ValueError(
                f"wavefront_tile needs th >= 1 and (tw >= 3 or th == 1), "
                f"got ({th}, {tw})"
            )
        if hgt % th or wid % tw:
            raise ValueError(
                f"latent {hgt}x{wid} not divisible by wavefront_tile "
                f"({th}, {tw})"
            )
        return th, tw, (hgt // th) * (wid // tw)

    def _compress_wavefront(self, y_cur, y_conditioned, z, z_hat, z_strings):
        from . import ar_wavefront as wf

        priors = self._prior_feats_fn()(z_hat, y_conditioned)
        target = (
            jnp.asarray(y_cur) - jnp.asarray(y_conditioned)
            if self.residual
            else jnp.asarray(y_cur)
        )
        b, hgt, wid, m = target.shape
        th, tw, nt = self._tile_dims(hgt, wid)
        if nt > 1:
            target = wf.tile_plane(target, th, tw)
            priors = wf.tile_plane(priors, th, tw)
        coords, valid, encoder, *_ = self._wavefront_setup(th, tw)
        st = self._codec_stats
        t0 = time.perf_counter() if st is not None else 0.0
        syms, idxs, _ = encoder(target, priors, coords, valid)

        if nt > 1:
            sym_flat = wf.flatten_wavefront_grouped(syms, coords, valid, b)
            idx_flat = wf.flatten_wavefront_grouped(idxs, coords, valid, b)
        else:  # identical order, one vectorized gather instead of T loops
            sym_flat = wf.flatten_wavefront(syms, coords, valid)
            idx_flat = wf.flatten_wavefront(idxs, coords, valid)
        if st is not None:  # flatten fetches → blocks on the encoder scan
            t1 = time.perf_counter()
            st["enc_device_s"] = st.get("enc_device_s", 0.0) + (t1 - t0)
            st["enc_fetch_bytes"] = (st.get("enc_fetch_bytes", 0)
                                     + sym_flat.nbytes + idx_flat.nbytes)
        t = self.tables["gaussian_conditional"]
        esym = entropy_base.get_enc_table(t, self.coder)
        if self._wf_format() == "grouped":
            sizes = wf.round_sizes(valid, nt, m)
            levels = t.cdf.shape[0]
            y_strings = []
            for i in range(b):
                sym_g, seg_counts = wf.group_round_symbols(
                    sym_flat[i], idx_flat[i], sizes, levels
                )
                y_strings.append(self.coder.encode_runs_segmented(
                    sym_g, seg_counts, t.cdf, t.cdf_length, t.offset,
                    esym=esym,
                ))
        else:
            y_strings = [
                self.coder.encode_stream(
                    sym_flat[i], idx_flat[i], t.cdf, t.cdf_length, t.offset,
                    esym=esym,
                )
                for i in range(b)
            ]
        if st is not None:
            st["enc_host_s"] = (st.get("enc_host_s", 0.0)
                                + time.perf_counter() - t1)
        return {"strings": [y_strings, z_strings], "shape": tuple(z.shape[1:3])}

    def _decompress_wavefront(self, strings, z_hat, y_conditioned):
        from . import ar_wavefront as wf

        priors = self._prior_feats_fn()(z_hat, y_conditioned)
        b = z_hat.shape[0]
        hgt, wid = z_hat.shape[1] * 4, z_hat.shape[2] * 4
        m = self.in_channels
        t = self.tables["gaussian_conditional"]
        th, tw, nt = self._tile_dims(hgt, wid)
        if nt > 1:
            priors = wf.tile_plane(priors, th, tw)
        coords, valid, _, params_step, write_step, fused_step = (
            self._wavefront_setup(th, tw)
        )
        valid_np = np.asarray(valid)

        decoders = [self.coder.make_stream_decoder(s) for s in strings[0]]
        lut = entropy_base.get_lut(t, self.coder)
        target_pad = jnp.zeros((b * nt, th + 4, tw + 4, m), jnp.float32)
        L = coords.shape[1]
        T = coords.shape[0]
        # every wavefront t ∈ [0, T) is non-empty for w > span (the t-buckets
        # tile the grid), so the fused write(t)+params(t+1) dispatch applies
        # uniformly: ONE dispatch + one u8 idx fetch per wavefront; with
        # tiling, all nt tiles decode inside the same round
        st = self._codec_stats
        grouped = self._wf_format() == "grouped"
        means, idx = params_step(target_pad, priors, coords[0])
        for ti in range(T):
            v = valid_np[ti]
            n_valid = int(v.sum())
            t0 = time.perf_counter() if st is not None else 0.0
            idx_np = np.asarray(idx, np.int32).reshape(b, nt, L, m)
            if st is not None:  # np.asarray above blocks on the device round
                t1 = time.perf_counter()
                st["device_s"] = st.get("device_s", 0.0) + (t1 - t0)
            sym = np.zeros((b, nt, L, m), np.int32)
            for i in range(b):
                idx_r = idx_np[i][:, v].reshape(-1)
                if grouped:
                    decoded = wf.decode_round_grouped(
                        decoders[i], idx_r, t, lut=lut
                    )
                else:
                    decoded = decoders[i].decode(
                        idx_r, t.cdf, t.cdf_length, t.offset, lut=lut,
                    )
                sym[i][:, v] = decoded.reshape(nt, n_valid, m)
            if st is not None:
                st["host_rans_s"] = (st.get("host_rans_s", 0.0)
                                     + time.perf_counter() - t1)
                st["rounds"] = st.get("rounds", 0) + 1
            sym_dev = jnp.asarray(sym.reshape(b * nt, L, m))
            if ti + 1 < T:
                target_pad, means, idx = fused_step(
                    target_pad, priors, coords[ti], valid[ti],
                    sym_dev, means, coords[ti + 1],
                )
            else:
                target_pad = write_step(
                    target_pad, coords[ti], valid[ti], sym_dev, means
                )

        target_hat = target_pad[:, 2:-2, 2:-2, :]
        if nt > 1:
            target_hat = wf.untile_plane(target_hat, b, hgt, wid)
        y_hat = (
            target_hat + jnp.asarray(y_conditioned) if self.residual else target_hat
        )
        return {"y_hat": y_hat}

    # ---- serial AR codec path (SPM variants) -------------------------------

    def _prior_feats_fn(self):
        return self._jitted(
            "prior_feats", lambda z, c: self._apply(z, c, method="prior_feats")
        )

    def _ar_step_fn(self):
        table = self.tables["gaussian_conditional"].scale_table

        def fn(target_pad, priors, h, w):
            crop = jax.lax.dynamic_slice(
                target_pad,
                (0, h, w, 0),
                (target_pad.shape[0], 5, 5, target_pad.shape[3]),
            )
            p_vec = jax.lax.dynamic_slice(
                priors, (0, h, w, 0), (priors.shape[0], 1, 1, priors.shape[3])
            )
            scales, means = self._apply(crop, p_vec, method="ar_step")
            return crop[:, 2, 2, :], means, build_indexes(scales, table)

        return self._jitted("ar_step", fn)

    def _ar_write_fn(self):
        def fn(buf, value, h, w):
            return jax.lax.dynamic_update_slice(
                buf, value[:, None, None, :], (0, h + 2, w + 2, 0)
            )

        return self._jitted("ar_write", fn)

    def _compress_ar(self, y_cur, y_conditioned, z, z_hat, z_strings):
        priors = self._prior_feats_fn()(z_hat, y_conditioned)
        target = (
            jnp.asarray(y_cur) - jnp.asarray(y_conditioned)
            if self.residual
            else jnp.asarray(y_cur)
        )
        b, hgt, wid, m = target.shape
        target_pad = jnp.pad(target, ((0, 0), (2, 2), (2, 2), (0, 0)))
        step, write = self._ar_step_fn(), self._ar_write_fn()

        symbols_all, indexes_all = [], []
        for h in range(hgt):
            for w in range(wid):
                center, means, indexes = step(target_pad, priors, h, w)
                sym = np.round(np.asarray(center) - np.asarray(means)).astype(np.int32)
                target_pad = write(target_pad, jnp.asarray(sym) + means, h, w)
                symbols_all.append(sym)
                indexes_all.append(np.asarray(indexes))

        t = self.tables["gaussian_conditional"]
        y_strings = []
        for i in range(b):
            syms = np.stack([s[i] for s in symbols_all]).reshape(-1)
            idxs = np.stack([ix[i] for ix in indexes_all]).reshape(-1)
            y_strings.append(
                self.coder.encode_stream(syms, idxs, t.cdf, t.cdf_length,
                                         t.offset)
            )
        return {"strings": [y_strings, z_strings], "shape": tuple(z.shape[1:3])}

    def _decompress_ar(self, strings, z_hat, y_conditioned):
        priors = self._prior_feats_fn()(z_hat, y_conditioned)
        b = z_hat.shape[0]
        hgt, wid = z_hat.shape[1] * 4, z_hat.shape[2] * 4
        m = self.in_channels
        t = self.tables["gaussian_conditional"]
        step, write = self._ar_step_fn(), self._ar_write_fn()

        decoders = [self.coder.make_stream_decoder(s) for s in strings[0]]
        target_pad = jnp.zeros((b, hgt + 4, wid + 4, m), jnp.float32)
        for h in range(hgt):
            for w in range(wid):
                _, means, indexes = step(target_pad, priors, h, w)
                idx_np = np.asarray(indexes)
                sym = np.stack(
                    [
                        decoders[i].decode(idx_np[i], t.cdf, t.cdf_length, t.offset)
                        for i in range(b)
                    ]
                )
                target_pad = write(target_pad, jnp.asarray(sym) + means, h, w)

        target_hat = target_pad[:, 2:-2, 2:-2, :]
        y_hat = (
            target_hat + jnp.asarray(y_conditioned) if self.residual else target_hat
        )
        return {"y_hat": y_hat}


# ---- reference-named constructors (README/zoo parity) ----------------------


def SpatioTemporalPriorModelWithoutSPMTPM(**kw):
    return SpatioTemporalPriorModel(variant="without_spm_tpm", **kw)


def SpatioTemporalPriorModelWithoutSPM(**kw):
    return SpatioTemporalPriorModel(variant="without_spm", **kw)


def SpatioTemporalPriorModelWithoutTPM(**kw):
    return SpatioTemporalPriorModel(variant="without_tpm", **kw)


def SpatioTemporalPriorModelFull(**kw):
    return SpatioTemporalPriorModel(variant="full", **kw)


def SpatioTemporalPriorModel_Res(**kw):
    return SpatioTemporalPriorModel(variant="res", **kw)
