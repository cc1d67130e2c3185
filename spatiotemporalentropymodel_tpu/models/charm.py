"""Channel-autoregressive STEM (beyond-reference, TPU-first).

The reference's SPM variants pay for spatial context with a serial per-pixel
decode (spatiotemporalpriors.py:729-768 — its own comment points at
channel-chunked autoregression as the fix). This model replaces the masked
spatial conv with **channel-group conditioning** (Minnen & Singh 2020,
"Channel-wise Autoregressive Entropy Models", arXiv:2007.08739): the latent
splits into G channel groups; group g's (σ, μ) condition on the temporal +
hyper priors and on the already-decoded groups < g.

Decode is fully parallel over space — G device dispatches + G host rANS
calls per frame (G≈4) instead of H·W pixel steps or 3H+W wavefronts — while
retaining backward-adaptive context like SPM.

Capability addition relative to the reference (not a parity item); shares the
STEM blocks, API and bitstream machinery.
"""

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyBottleneck, GaussianConditional, build_indexes
from ..entropy import base as entropy_base
from ..layers import Conv, Deconv, Sequential, leaky_relu
from ..ops.quantize import ste_round
from .base import CompressionModel


class _LeakyReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return leaky_relu(x)


class ChannelARSTEMModule(nn.Module):
    """STEM with TPM + hyper priors and G-group channel autoregression.

    ``lrp=True`` adds latent residual prediction (Minnen & Singh 2020,
    arXiv:2007.08739 §III-B): after group g decodes, a small 1×1 stack
    predicts its quantization residual from the priors, the decoded earlier
    groups and the group's own quantized values; the bounded refinement
    (0.5·tanh, at most half a bin) sharpens both the reconstruction and the
    context later groups condition on. Decoder-replicable by construction —
    it reads only decoded information.
    """

    groups: int = 4
    entropy_bottleneck_channels: int = 256
    in_channels: int = 192
    residual: bool = True
    lrp: bool = True

    def setup(self):
        m, ebc = self.in_channels, self.entropy_bottleneck_channels
        if m % self.groups:
            raise ValueError(f"in_channels {m} not divisible by {self.groups}")
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
        self.TPM = Sequential(
            [Conv(256, 5, 1), _LeakyReLU(), Conv(320, 5, 1), _LeakyReLU(),
             Conv(m * 2, 5, 1)],
            name="TPM",
        )
        gs = m // self.groups
        self.EPMs = [
            Sequential(
                [Conv(512, 1, 1), _LeakyReLU(), Conv(384, 1, 1), _LeakyReLU(),
                 Conv(2 * gs, 1, 1)],
                name=f"EPM_{g}",
            )
            for g in range(self.groups)
        ]
        if self.lrp:
            self.LRPs = [
                Sequential(
                    [Conv(224, 1, 1), _LeakyReLU(), Conv(128, 1, 1),
                     _LeakyReLU(), Conv(gs, 1, 1)],
                    name=f"LRP_{g}",
                )
                for g in range(self.groups)
            ]
        self.entropy_bottleneck = EntropyBottleneck(ebc)
        self.gaussian_conditional = GaussianConditional()

    @property
    def group_size(self) -> int:
        return self.in_channels // self.groups

    def priors(self, z_hat, y_cond, train: bool = False):
        del train
        return jnp.concatenate([self.TPM(y_cond), self.HD(z_hat)], axis=-1)

    def hyper_encode(self, y_cur, y_cond, train: bool = False):
        del train
        return self.HE(jnp.concatenate([y_cur, y_cond], axis=-1))

    def group_params(self, priors, ctx, g: int, train: bool = False):
        """(σ_g, μ_g) for group g from priors + decoded groups < g.

        ctx: (B, H, W, g·gs) decoded channels (empty allowed as zeros of
        width 0 is not traceable — caller pads to fixed g·gs per call site).
        """
        del train
        feats = jnp.concatenate([priors, ctx], axis=-1) if ctx.shape[-1] else priors
        gp = self.EPMs[g](feats)
        return jnp.split(gp, 2, axis=-1)

    def lrp_refine(self, priors, ctx, y_hat_g, g: int, train: bool = False):
        """Bounded quantization-residual refinement for decoded group g
        (no-op when the module was built with lrp=False)."""
        del train
        if not self.lrp:
            return y_hat_g
        parts = [priors, ctx, y_hat_g] if ctx.shape[-1] else [priors, y_hat_g]
        feats = jnp.concatenate(parts, axis=-1)
        return y_hat_g + 0.5 * jnp.tanh(self.LRPs[g](feats))

    def __call__(self, y_cur, y_conditioned, train: bool = False):
        z = self.hyper_encode(y_cur, y_conditioned)
        z_hat, z_lik = self.entropy_bottleneck(z, train=train)
        priors = self.priors(z_hat, y_conditioned)

        target = y_cur - y_conditioned if self.residual else y_cur

        gs = self.group_size
        liks, decoded = [], []
        for g in range(self.groups):
            ctx = (
                jnp.concatenate(decoded, axis=-1)
                if decoded
                else target[..., :0]
            )
            scales, means = self.group_params(priors, ctx, g)
            t_g = target[..., g * gs : (g + 1) * gs]
            _, lik_g = self.gaussian_conditional(t_g, scales, means,
                                                 train=train)
            liks.append(lik_g)
            # context/reconstruction quantized EXACTLY like the coder:
            # round(t - mu) + mu, straight-through in training (Minnen &
            # Singh 2020 §III-A quantize the conditioning values with STE
            # rounding, not noise). The pre-round-4 mean-free round(t)
            # context diverged from the serving path's sym + mu — retrained
            # models carried a +50% actual-vs-estimated rate gap because
            # every later group's (sigma, mu) was predicted from a context
            # distribution never seen at encode time.
            t_hat_g = ste_round(t_g - means) + means
            decoded.append(self.lrp_refine(priors, ctx, t_hat_g, g))
        y_lik = jnp.concatenate(liks, axis=-1)
        target_out = jnp.concatenate(decoded, axis=-1)
        y_hat = target_out + y_conditioned if self.residual else target_out
        return {
            "y_hat": y_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
        }

    def aux_loss(self, train: bool = False):
        del train
        return self.entropy_bottleneck.aux_loss()


class SpatioTemporalPriorModelChannelAR(CompressionModel):
    """Host wrapper: encode is ONE jitted dispatch (the G-group recursion
    unrolls on device — quantization is decoder-replicable, so no host syncs);
    decode is G (params → host rANS) rounds, each whole-plane parallel."""

    has_gaussian = True
    bottleneck_names = ("entropy_bottleneck",)
    _I16_LIM = 32767.0

    def __init__(self, groups: int = 4, entropy_bottleneck_channels: int = 256,
                 in_channels: int = 192, residual: bool = True,
                 lrp: bool = True, **kw):
        super().__init__(
            ChannelARSTEMModule(groups, entropy_bottleneck_channels,
                                in_channels, residual, lrp),
            **kw,
        )
        self.groups = groups
        self.in_channels = in_channels
        self.residual = residual

    # -- encode: one dispatch --------------------------------------------------

    def _fused_encode_fn(self):
        table = self.tables["gaussian_conditional"].scale_table
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)
        lim = self._I16_LIM
        gs = self.module.group_size

        def fn(y_cur, y_cond):
            z = self._apply(y_cur, y_cond, method="hyper_encode")
            z_sym = jnp.clip(jnp.round(z - medians), -lim, lim).astype(jnp.int16)
            z_hat = z_sym.astype(jnp.float32) + medians
            priors = self._apply(z_hat, y_cond, method="priors")
            target = y_cur - y_cond if self.residual else y_cur

            syms, idxs, decoded = [], [], []
            for g in range(self.groups):
                ctx = (
                    jnp.concatenate(decoded, axis=-1)
                    if decoded
                    else target[..., :0]
                )
                scales, means = self._apply(priors, ctx, g, method="group_params")
                # f32 island: symbols/CDF rows must match the decoder's
                # build_indexes(scales.astype(f32)) under any compute_dtype
                scales = scales.astype(jnp.float32)
                means = means.astype(jnp.float32)
                t_g = target[..., g * gs : (g + 1) * gs].astype(jnp.float32)
                sym = jnp.clip(jnp.round(t_g - means), -lim, lim).astype(
                    jnp.int16
                )
                decoded.append(self._apply(
                    priors, ctx, sym.astype(jnp.float32) + means, g,
                    method="lrp_refine",
                ))
                syms.append(sym)
                idxs.append(build_indexes(scales, table).astype(jnp.uint8))
            y_sym = jnp.concatenate(syms, axis=-1)
            idx = jnp.concatenate(idxs, axis=-1)
            return jnp.concatenate([
                jax.lax.bitcast_convert_type(y_sym, jnp.uint8).reshape(-1),
                jax.lax.bitcast_convert_type(z_sym, jnp.uint8).reshape(-1),
                idx.reshape(-1),
            ])

        return self._jitted("fused_encode", fn)

    def _fused_encode_sparse_fn(self):
        """Sparse-grouped encode: ONE dispatch → transport buffer with the
        composite key (group·levels + CDF row) sort, so per-group wire
        segments are contiguous and the host never downloads index planes
        (entropy/transport.py design)."""
        table = self.tables["gaussian_conditional"].scale_table
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)
        gs = self.module.group_size
        levels = int(table.shape[0])
        groups = self.groups

        def fn(y_cur, y_cond):
            z = self._apply(y_cur, y_cond, method="hyper_encode")
            z_raw = jnp.round(z - medians)
            z_over = jnp.any(jnp.abs(z_raw) > 127)
            z_sym = jnp.clip(z_raw, -127, 127).astype(jnp.int8)
            z_hat = z_sym.astype(jnp.float32) + medians
            priors = self._apply(z_hat, y_cond, method="priors")
            target = y_cur - y_cond if self.residual else y_cur

            syms, idxs, decoded = [], [], []
            for g in range(groups):
                ctx = (
                    jnp.concatenate(decoded, axis=-1)
                    if decoded
                    else target[..., :0]
                )
                scales, means = self._apply(priors, ctx, g,
                                            method="group_params")
                scales = scales.astype(jnp.float32)
                means = means.astype(jnp.float32)
                t_g = target[..., g * gs : (g + 1) * gs].astype(jnp.float32)
                sym = jnp.round(t_g - means)
                decoded.append(self._apply(
                    priors, ctx,
                    jnp.clip(sym, -self._I16_LIM, self._I16_LIM) + means, g,
                    method="lrp_refine",
                ))
                syms.append(sym)
                idxs.append(build_indexes(scales, table).astype(jnp.int32))
            y_sym = jnp.concatenate(syms, axis=-1)
            idx = jnp.concatenate(idxs, axis=-1)

            b = y_sym.shape[0]
            n = y_sym.size // b
            group_plane = jnp.repeat(
                jnp.arange(groups, dtype=jnp.int32), gs
            )[None, None, None, :]
            key = idx + levels * group_plane
            key_flat = jnp.reshape(
                jnp.broadcast_to(key, y_sym.shape), (b, n)
            )
            y_flat = y_sym.reshape(b, n)
            y_over = jnp.any(jnp.abs(y_flat) > 127, axis=-1)

            order = jnp.argsort(key_flat, axis=-1)
            y_sorted = jnp.take_along_axis(y_flat, order, axis=-1)
            y_sorted = jnp.clip(y_sorted, -127, 127).astype(jnp.int8)
            mask = y_sorted != 0
            nz = mask.sum(axis=-1, dtype=jnp.int32)
            cap = n // 4
            pos = jnp.cumsum(mask, axis=-1, dtype=jnp.int32) - 1
            pos = jnp.where(mask & (pos < cap), pos, cap)
            values = (
                jnp.zeros((b, cap + 1), jnp.int8)
                .at[jnp.arange(b)[:, None], pos]
                .set(y_sorted)[:, :cap]
            )
            counts = jax.vmap(
                lambda r: jnp.bincount(r, length=groups * levels)
            )(key_flat)
            bits = mask.reshape(b, n // 8, 8).astype(jnp.uint32)
            maskbits = jnp.sum(
                bits << jnp.arange(8, dtype=jnp.uint32), axis=-1
            ).astype(jnp.uint8)
            overflow = (y_over | (nz > cap) | z_over).astype(jnp.int32)
            meta = jnp.stack([nz, overflow], axis=-1)

            as_u8 = lambda v: jax.lax.bitcast_convert_type(  # noqa: E731
                v, jnp.uint8
            ).reshape(-1)
            return jnp.concatenate([
                maskbits.reshape(-1),
                as_u8(values),
                as_u8(counts.astype(jnp.int32)),
                as_u8(z_sym),
                as_u8(meta),
            ])

        return self._jitted("fused_encode_sparse", fn)

    def _compress_sparse(self, y_cur, y_conditioned):
        from ..entropy import transport

        b, h, w, m = jnp.shape(y_cur)
        zt = self.tables["entropy_bottleneck"]
        gt = self.tables["gaussian_conditional"]
        levels = int(gt.scale_table.shape[0])
        z_shape = (b, -(-h // 4), -(-w // 4), zt.rows)
        layout = transport.SparseLayout(
            b=b, n=h * w * m, zn=int(np.prod(z_shape[1:])),
            levels=self.groups * levels,
            cap_value=(h * w * m) // 4,  # mirrors _fused_encode_sparse_fn
        )
        packed = np.asarray(self._fused_encode_sparse_fn()(y_cur,
                                                           y_conditioned))
        planes = transport.unpack_encode(packed, layout)
        if planes.overflow:
            return None
        z_idx = entropy_base.bottleneck_indexes(z_shape, zt.rows)
        z_strings = entropy_base.compress(
            planes.z_sym.reshape(z_shape), z_idx, zt, self.coder
        )
        counts = planes.counts.reshape(b, self.groups, levels)
        y_strings = []
        for i in range(b):
            offs = np.concatenate(
                [[0], np.cumsum(counts[i].sum(axis=-1))]
            )
            per_group = []
            for g in range(self.groups):
                seg = planes.y_sorted[i, offs[g]:offs[g + 1]]
                per_group.append(
                    transport.encode_grouped(
                        seg[None], counts[i, g][None], gt, self.coder
                    )[0]
                )
            y_strings.append(per_group)
        return {
            "strings": [y_strings, z_strings],
            "shape": tuple(z_shape[1:3]),
            "transport": "sparse",
            # per-group CDF-row counts ride the container (G·levels i32 per
            # batch element ≈ 1 KB; derivable from ẑ + decoded groups, but
            # shipping them makes decode ONE dispatch with zero fetches)
            "counts": counts,
        }

    def compress(self, y_cur, y_conditioned,
                 transport_mode: str = "sparse") -> Dict[str, Any]:
        self._require_tables()
        if transport_mode == "sparse":
            enc = self._compress_sparse(y_cur, y_conditioned)
            if enc is not None:
                return enc
        b, h, w, m = jnp.shape(y_cur)
        zt = self.tables["entropy_bottleneck"]
        y_shape, z_shape = (b, h, w, m), (b, h // 4, w // 4, zt.rows)
        packed = self._fused_encode_fn()(y_cur, y_conditioned)
        y_sym, z_sym, idx = entropy_base.unpack_symbol_buffer(
            packed, y_shape, z_shape
        )
        z_idx = entropy_base.bottleneck_indexes(z_shape, zt.rows)
        z_strings = entropy_base.compress(
            z_sym.astype(np.int32), z_idx, zt, self.coder
        )
        # one stream per group per batch element → groups decode in sequence
        # but each group's plane decodes in one parallel host call
        gs = m // self.groups
        gt = self.tables["gaussian_conditional"]
        y_strings = []
        for i in range(b):
            per_group = []
            for g in range(self.groups):
                sl = slice(g * gs, (g + 1) * gs)
                per_group.append(
                    self.coder.encode_with_indexes(
                        y_sym[i, ..., sl].astype(np.int32).reshape(-1),
                        idx[i, ..., sl].reshape(-1),
                        gt.cdf, gt.cdf_length, gt.offset,
                    )
                )
            y_strings.append(per_group)
        return {
            "strings": [y_strings, z_strings],
            "shape": tuple(z_shape[1:3]),
            "transport": "dense",
        }

    # -- decode: G parallel-plane rounds ---------------------------------------

    def _group_params_fn(self):
        table = self.tables["gaussian_conditional"].scale_table

        def make(g):
            def fn(priors, ctx):
                scales, means = self._apply(priors, ctx, g,
                                            method="group_params")
                return (means.astype(jnp.float32),
                        build_indexes(scales.astype(jnp.float32),
                                      table).astype(jnp.uint8))

            return fn

        key = "group_params_fns"
        if key not in self._jit_cache:
            self._jit_cache[key] = [jax.jit(make(g)) for g in range(self.groups)]
        return self._jit_cache[key]

    def _group_lrp_fn(self):
        def make(g):
            def fn(priors, ctx, y_hat_g):
                return self._apply(priors, ctx, y_hat_g, g,
                                   method="lrp_refine")

            return fn

        key = "group_lrp_fns"
        if key not in self._jit_cache:
            self._jit_cache[key] = [jax.jit(make(g))
                                    for g in range(self.groups)]
        return self._jit_cache[key]

    # -- sparse group transport (entropy/transport.py design, per group) -----

    def _group_params_sparse_fn(self):
        """Per-group decoder params: only the 256-byte counts vector crosses
        to the host; order/means stay device-resident."""
        table = self.tables["gaussian_conditional"].scale_table
        levels = int(table.shape[0])

        def make(g):
            def fn(priors, ctx):
                scales, means = self._apply(priors, ctx, g,
                                            method="group_params")
                idx = build_indexes(scales.astype(jnp.float32), table)
                b = idx.shape[0]
                n = idx.size // b
                idx_flat = idx.reshape(b, n).astype(jnp.int32)
                counts = jax.vmap(
                    lambda r: jnp.bincount(r, length=levels)
                )(idx_flat)
                order = jnp.argsort(idx_flat, axis=-1)
                return counts.astype(jnp.int32), order, means

            return fn

        key = "group_params_sparse_fns"
        if key not in self._jit_cache:
            self._jit_cache[key] = [jax.jit(make(g))
                                    for g in range(self.groups)]
        return self._jit_cache[key]

    def _group_reconstruct_sparse_fn(self):
        def fn(maskbits, values, order, means):
            b = means.shape[0]
            n = means.size // b
            cap = values.shape[1]
            bits = (
                (maskbits.reshape(b, n // 8, 1)
                 >> jnp.arange(8, dtype=jnp.uint8)) & 1
            )
            mask = bits.reshape(b, n).astype(bool)
            cums = jnp.cumsum(mask, axis=-1, dtype=jnp.int32)
            gathered = jnp.take_along_axis(
                values, jnp.clip(cums - 1, 0, cap - 1), axis=-1
            )
            y_sorted = jnp.where(mask, gathered, jnp.int8(0))
            flat = (
                jnp.zeros((b, n), jnp.int32)
                .at[jnp.arange(b)[:, None], order]
                .set(y_sorted.astype(jnp.int32))
            )
            return flat.reshape(means.shape).astype(jnp.float32) + means

        return self._jitted("group_reconstruct_sparse", fn)

    def _priors_fn(self):
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)

        def fn(z_sym, y_cond):
            z_hat = z_sym.astype(jnp.float32) + medians
            return self._apply(z_hat, y_cond, method="priors")

        return self._jitted("priors_from_zsym", fn)

    def decompress(self, strings, shape, y_conditioned,
                   transport_mode: str = "sparse",
                   counts=None) -> Dict[str, Any]:
        """counts: optional (b, groups, levels) per-group CDF-row counts from
        the container — enables the fetch-free one-dispatch decode."""
        assert isinstance(strings, list) and len(strings) == 2
        self._require_tables()
        zt = self.tables["entropy_bottleneck"]
        gt = self.tables["gaussian_conditional"]
        z_idx = entropy_base.bottleneck_indexes(
            (len(strings[1]), *shape, zt.rows), zt.rows
        )
        z_sym = entropy_base.decompress(strings[1], z_idx, zt, self.coder)

        b = len(strings[1])
        h, w = shape[0] * 4, shape[1] * 4
        gs = self.module.group_size

        if transport_mode == "sparse" and counts is not None:
            target_hat = self._decode_fetchfree(
                strings[0], np.asarray(counts, np.int32), z_sym,
                y_conditioned, b, h, w,
            )
            if target_hat is not None:
                y_hat = (
                    target_hat + jnp.asarray(y_conditioned)
                    if self.residual
                    else target_hat
                )
                return {"y_hat": y_hat}

        priors = self._priors_fn()(
            jnp.asarray(z_sym.astype(np.int16)), y_conditioned
        )
        if transport_mode == "sparse":
            decoded = self._decode_groups_sparse(strings[0], priors, b, h, w)
        else:
            decoded = self._decode_groups_dense(
                strings[0], priors, b, h, w, gs, gt
            )

        target_hat = jnp.concatenate(decoded, axis=-1)
        y_hat = (
            target_hat + jnp.asarray(y_conditioned)
            if self.residual
            else target_hat
        )
        return {"y_hat": y_hat}

    # -- fetch-free decode (counts in the container) ---------------------------

    def _get_fused_decode(self, b, h, w):
        """ONE-dispatch decoder: (z_sym i8, payload u8, y_cond) → target_hat.

        payload = concat over groups of [maskbits b·n_g/8][values i8 b·cap_g].
        Group g's stable argsort of its CDF rows reproduces the encoder's
        composite-key order restricted to the group (both order by (h, w, c)),
        so the host-decoded grouped symbols scatter back exactly."""
        key = ("fused_decode", b, h, w)
        if key in self._jit_cache:
            return self._jit_cache[key]
        gs = self.module.group_size
        n_g = h * w * gs
        cap = n_g // 4
        medians = jnp.asarray(self.tables["entropy_bottleneck"].medians,
                              jnp.float32)
        table = self.tables["gaussian_conditional"].scale_table
        seg_mask, seg_val = b * n_g // 8, b * cap

        def fn(z_sym, payload, y_cond):
            z_hat = z_sym.astype(jnp.float32) + medians
            priors = self._apply(z_hat, y_cond, method="priors")
            decoded = []
            off = 0
            for g in range(self.groups):
                maskbits = payload[off:off + seg_mask].reshape(b, n_g // 8)
                values = jax.lax.bitcast_convert_type(
                    payload[off + seg_mask:off + seg_mask + seg_val], jnp.int8
                ).reshape(b, cap)
                off += seg_mask + seg_val
                ctx = (
                    jnp.concatenate(decoded, axis=-1)
                    if decoded
                    else jnp.zeros((b, h, w, 0), jnp.float32)
                )
                scales, means = self._apply(priors, ctx, g,
                                            method="group_params")
                idx = build_indexes(scales.astype(jnp.float32), table)
                order = jnp.argsort(idx.reshape(b, n_g).astype(jnp.int32),
                                    axis=-1)
                bits = (
                    (maskbits.reshape(b, n_g // 8, 1)
                     >> jnp.arange(8, dtype=jnp.uint8)) & 1
                )
                mask = bits.reshape(b, n_g).astype(bool)
                cums = jnp.cumsum(mask, axis=-1, dtype=jnp.int32)
                gathered = jnp.take_along_axis(
                    values, jnp.clip(cums - 1, 0, cap - 1), axis=-1
                )
                y_sorted = jnp.where(mask, gathered, jnp.int8(0))
                flat = (
                    jnp.zeros((b, n_g), jnp.int32)
                    .at[jnp.arange(b)[:, None], order]
                    .set(y_sorted.astype(jnp.int32))
                )
                y_hat_g = (
                    flat.reshape(b, h, w, gs).astype(jnp.float32) + means
                )
                decoded.append(self._apply(
                    priors, ctx, y_hat_g, g, method="lrp_refine"
                ))
            return jnp.concatenate(decoded, axis=-1)

        self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def _decode_fetchfree(self, y_strings, counts, z_sym, y_cond, b, h, w):
        """Host rANS for ALL groups up front (row counts from the container),
        one packed upload, one dispatch. Returns None when a group's nonzeros
        exceed the static payload capacity (caller falls back)."""
        from ..entropy import transport

        gt = self.tables["gaussian_conditional"]
        gs = self.module.group_size
        n_g = h * w * gs
        cap = n_g // 4
        segments = []
        for g in range(self.groups):
            group_strings = [y_strings[i][g] for i in range(b)]
            packed = transport.decode_grouped_packed(
                group_strings, counts[:, g], cap, gt, self.coder
            )
            if packed is not None:
                maskbits, values = packed
            else:  # coder without the fused path, or nonzeros exceed cap
                y_sorted = transport.decode_grouped(
                    group_strings, counts[:, g], gt, self.coder
                )
                if int((y_sorted != 0).sum(axis=-1).max()) > cap:
                    return None
                maskbits, values = transport.pack_decode_payload(
                    y_sorted, cap
                )
            segments.append(maskbits.reshape(-1))
            segments.append(values.view(np.uint8).reshape(-1))
        payload = np.concatenate(segments)
        fn = self._get_fused_decode(b, h, w)
        return fn(
            jnp.asarray(np.ascontiguousarray(z_sym.astype(np.int8))),
            jnp.asarray(payload), y_cond,
        )

    def _decode_groups_dense(self, y_strings, priors, b, h, w, gs, gt):
        params_fns = self._group_params_fn()
        lrp_fns = self._group_lrp_fn()
        decoded = []
        for g in range(self.groups):
            ctx = (
                jnp.concatenate(decoded, axis=-1)
                if decoded
                else jnp.zeros((b, h, w, 0), jnp.float32)
            )
            means, idx = params_fns[g](priors, ctx)
            idx_np = np.asarray(idx, np.int32)
            sym = np.stack([
                self.coder.decode_with_indexes(
                    y_strings[i][g], idx_np[i].reshape(-1),
                    gt.cdf, gt.cdf_length, gt.offset,
                ).reshape(h, w, gs)
                for i in range(b)
            ])
            decoded.append(lrp_fns[g](
                priors, ctx,
                jnp.asarray(sym.astype(np.int16), jnp.float32) + means,
            ))
        return decoded

    def _decode_groups_sparse(self, y_strings, priors, b, h, w):
        """Per group: 256 B counts D2H, grouped host rANS, bitmask+int8
        upload, device-side reconstruct — no index planes over the link."""
        from ..entropy import transport

        gt = self.tables["gaussian_conditional"]
        params_fns = self._group_params_sparse_fn()
        lrp_fns = self._group_lrp_fn()
        reconstruct = self._group_reconstruct_sparse_fn()
        decoded = []
        for g in range(self.groups):
            ctx = (
                jnp.concatenate(decoded, axis=-1)
                if decoded
                else jnp.zeros((b, h, w, 0), jnp.float32)
            )
            counts, order, means = params_fns[g](priors, ctx)
            counts = np.asarray(counts)
            y_sorted = transport.decode_grouped(
                [y_strings[i][g] for i in range(b)], counts, gt, self.coder
            )
            n_g = y_sorted.shape[1]
            # per-group payload capacity: the encoder only bounds the GLOBAL
            # nonzero count; size the group buffer to its actual need
            # (rounded up, so jit shapes stay in a few buckets)
            nz_max = int((y_sorted != 0).sum(axis=-1).max())
            cap = max(n_g // 4, -(-max(nz_max, 1) // 4096) * 4096)
            cap = min(cap, n_g)
            maskbits, values = transport.pack_decode_payload(y_sorted, cap)
            decoded.append(lrp_fns[g](
                priors, ctx,
                reconstruct(
                    jnp.asarray(maskbits), jnp.asarray(values), order, means
                ),
            ))
        return decoded
