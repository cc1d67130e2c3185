"""Convolution helpers with the reference's exact geometry, NHWC layout.

Parity targets:
- ``conv``   == compressai/models/utils.py:112-121 (k5 s2, padding=k//2)
- ``deconv`` == compressai/models/utils.py:124-130 (ConvTranspose2d with
  padding=k//2, output_padding=stride-1 → output exactly stride*H)
- ``conv3x3`` / ``conv1x1`` / ``subpel_conv3x3`` == compressai/layers/layers.py:50-64

The transposed conv is implemented directly as an input-dilated convolution
(`lax.conv_general_dilated` with ``lhs_dilation``) so the geometry is explicit
and torch-checkpoint conversion is a pure layout transform: the stored kernel
(kh, kw, in, out) equals the spatially *flipped* torch ConvTranspose2d weight.
All kernels use HWIO layout; torch Conv2d weights (O, I, kh, kw) convert via
``transpose(2, 3, 1, 0)``.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch's nn.init.kaiming_normal_ default (fan_in, leaky_relu a=0 → gain √2);
# reference applies it to every conv weight (compressai/models/priors.py:67-72).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


# Strided-conv lowering policy (the encoder-side mirror of FAST_DECONV):
# a k×k stride-s conv is EXACTLY a stride-1 conv on the s×s space-to-depth
# rearrangement of its input — denser MXU contraction (s²·Cin input
# channels) at the cost of (R·s/k)² zero-padded tap slots. False = XLA's
# native strided conv; True forces s2d for A/B (tools/conv_s2d_probe.py);
# TestS2dConv pins the two lowerings elementwise-equal.
S2D_CONV = False


def _s2d_kernel(kernel, k: int, s: int):
    """(k, k, in, out) stride-s conv kernel → the equivalent
    (R, R, s²·in, out) stride-1 kernel over the s2d input + padding.

    Tap u hits s2d block m = ⌊(u−p)/s⌋, phase a = (u−p) mod s; s2d channel
    layout is (a·s + b)·in + c (matching ``space_to_depth``)."""
    p = k // 2
    in_ch, out_ch = kernel.shape[2], kernel.shape[3]
    m_min, m_max = (0 - p) // s, (k - 1 - p) // s  # floor div (p may be < s)
    R = m_max - m_min + 1
    sub = jnp.zeros((R, R, s * s * in_ch, out_ch), kernel.dtype)
    for u in range(k):
        mu, au = (u - p) // s, (u - p) % s
        for v in range(k):
            mv, av = (v - p) // s, (v - p) % s
            ch = (au * s + av) * in_ch
            sub = sub.at[mu - m_min, mv - m_min, ch:ch + in_ch, :].set(
                kernel[u, v]
            )
    return sub, -m_min, m_max


def space_to_depth(x, s: int):
    """NHWC (B, H, W, C) → (B, H/s, W/s, s²·C); channel = (a·s + b)·C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // s, w // s, s * s * c)


class Conv(nn.Module):
    """2-D convolution with symmetric torch-style padding (padding=k//2)."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        k = self.kernel_size
        s = self.stride
        p = k // 2
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_normal, (k, k, in_ch, self.features), jnp.float32
        )
        if return_weights:  # for fused consumers; params identical
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                    if self.use_bias else None)
            return kernel, bias
        if (S2D_CONV and s > 1 and k % 2 == 1
                and x.shape[1] % s == 0 and x.shape[2] % s == 0):
            sub, pl, ph = _s2d_kernel(kernel.astype(x.dtype), k, s)
            out = jax.lax.conv_general_dilated(
                space_to_depth(x, s),
                sub,
                window_strides=(1, 1),
                padding=((pl, ph), (pl, ph)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            out = jax.lax.conv_general_dilated(
                x,
                kernel.astype(x.dtype),
                window_strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias.astype(out.dtype)
        return out


# Deconv lowering policy: input-dilated deconvs as s² phase sub-convolutions
# + pixel shuffle — an exact weight rearrangement into one dense stride-1
# conv. MEASURED on the v5e at the 1080p g_s shapes (tools/gdn_tune.py,
# artifacts/gdn_tune.json): for wide outputs (192ch) XLA's lhs_dilation
# lowering already wins (66.9 vs 72.3 ms — it skips the zeros and the
# pixel-shuffle relayout loses 8%), but for the narrow RGB deconv (192→3)
# the sub-pixel form wins 24% (19.9 vs 26.2 ms). "auto" = sub-pixel iff the
# output is narrow (features ≤ _FAST_DECONV_MAX_FEATURES); True/False force
# one lowering for A/B (TestFastDeconv pins the two elementwise-equal).
FAST_DECONV = "auto"
_FAST_DECONV_MAX_FEATURES = 16


def _subpixel_kernel(kernel, k: int, s: int):
    """Rearrange a (k, k, in, out) deconv kernel into the equivalent
    (R, R, in, out·s²) stride-1 conv kernel + padding, R = ceil(k/s).

    For output phase a ∈ [0, s): the dilated conv's taps are
    u ≡ (pad_lo − a) (mod s), hitting x[i + base_a + j] with
    base_a = (a + ((pad_lo − a) mod s) − pad_lo)/s. Sub-kernels are padded
    to a common R×R grid; output channels are laid out o·s² + a·s + b so
    ``pixel_shuffle`` reassembles y[s·i + a, s·j + b]."""
    p = k // 2
    pad_lo = k - 1 - p
    in_ch, out_ch = kernel.shape[2], kernel.shape[3]
    R = -(-k // s)

    def taps(a):
        off = (pad_lo - a) % s
        base = (a + off - pad_lo) // s
        return base, list(range(off, k, s))

    base_min = min(taps(a)[0] for a in range(s))
    sub = jnp.zeros((R, R, in_ch, out_ch, s * s), kernel.dtype)
    for a in range(s):
        base_a, us = taps(a)
        for b in range(s):
            base_b, vs = taps(b)
            for j, u in enumerate(us):
                for i2, v in enumerate(vs):
                    sub = sub.at[
                        base_a + j - base_min, base_b + i2 - base_min,
                        :, :, a * s + b,
                    ].set(kernel[u, v])
    sub = sub.reshape(R, R, in_ch, out_ch * s * s)
    pl = -base_min
    return sub, R, pl, R - 1 - pl


class Deconv(nn.Module):
    """Transposed conv matching ConvTranspose2d(k, s, padding=k//2,
    output_padding=s-1): output spatial size is exactly ``s * H``.

    The kernel param is the flipped torch weight, laid out (kh, kw, in,
    out). Two equivalent lowerings: conv_general_dilated with
    lhs_dilation=s (the definitional form), or — when ``FAST_DECONV`` —
    the sub-pixel decomposition (see ``_subpixel_kernel``), which is the
    same arithmetic re-tiled for the MXU (within float summation-order
    noise; the element-exact-vs-torch layer tests pass either way).
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        k = self.kernel_size
        s = self.stride
        p = k // 2
        op = s - 1
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_normal, (k, k, in_ch, self.features), jnp.float32
        )
        if return_weights:  # for fused consumers; params identical
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                    if self.use_bias else None)
            return kernel, bias
        # odd k only: even kernels have (s·H − 1) output geometry that the
        # phase grid doesn't tile (no even-k deconv exists in the zoo)
        use_fast = FAST_DECONV is True or (
            FAST_DECONV == "auto" and self.features <= _FAST_DECONV_MAX_FEATURES
        )
        if use_fast and s > 1 and k % 2 == 1:
            sub, R, pl, ph = _subpixel_kernel(kernel, k, s)
            out = jax.lax.conv_general_dilated(
                x,
                sub.astype(x.dtype),
                window_strides=(1, 1),
                padding=((pl, ph), (pl, ph)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = pixel_shuffle(out, s)
        else:
            pad_lo = k - 1 - p
            pad_hi = k - 1 - p + op
            out = jax.lax.conv_general_dilated(
                x,
                kernel.astype(x.dtype),
                window_strides=(1, 1),
                padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
                lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias.astype(out.dtype)
        return out


def conv(out_ch: int, kernel_size: int = 5, stride: int = 2, name=None) -> Conv:
    return Conv(out_ch, kernel_size, stride, name=name)


def deconv(out_ch: int, kernel_size: int = 5, stride: int = 2, name=None) -> Deconv:
    return Deconv(out_ch, kernel_size, stride, name=name)


def conv3x3(out_ch: int, stride: int = 1, name=None) -> Conv:
    return Conv(out_ch, 3, stride, name=name)


def conv1x1(out_ch: int, stride: int = 1, name=None) -> Conv:
    return Conv(out_ch, 1, stride, name=name)


def pixel_shuffle(x, r: int):
    """NHWC pixel shuffle with torch channel ordering (c*r² + dy*r + dx)."""
    b, h, w, c = x.shape
    assert c % (r * r) == 0, (c, r)
    oc = c // (r * r)
    x = x.reshape(b, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, dy, w, dx, oc
    return x.reshape(b, h * r, w * r, oc)


class SubpelConv3x3(nn.Module):
    """3x3 conv + pixel shuffle upsampler (layers.py:55-59)."""

    features: int
    r: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features * self.r**2, 3, 1, name="conv")(x)
        return pixel_shuffle(x, self.r)


class Sequential(nn.Module):
    """Minimal sequential container over callables/modules.

    Peephole: an ``GDN(inverse=True) → Deconv(narrow)`` pair — the g_s tail
    of every image/video codec (compressai/models/priors.py:158-161) — runs
    as the fused Pallas kernel ``igdn_deconv_fused`` on TPU (one HBM read of
    x, one write of the shuffled RGB rows, instead of two bandwidth-bound
    layer round-trips). Parameters, names and shapes are identical; the
    modules are still called (``return_weights=True``) so checkpoints and
    param trees don't change. Disable via pallas_kernels.FUSE_IGDN_DECONV.
    """

    layers: Sequence

    @nn.compact
    def __call__(self, x):
        from ..ops import pallas_kernels as pk
        from .gdn import GDN

        i, n = 0, len(self.layers)
        while i < n:
            layer = self.layers[i]
            nxt = self.layers[i + 1] if i + 1 < n else None
            if (
                isinstance(layer, GDN)
                and layer.inverse
                and isinstance(nxt, Deconv)
                and i + 3 < n
                and isinstance(self.layers[i + 2], GDN)
                and self.layers[i + 2].inverse
                and isinstance(self.layers[i + 3], Deconv)
                and hasattr(x, "ndim")
                and x.ndim == 4
                and pk.igdn_deconv_wide_packed_applicable(
                    x, nxt.features, nxt.kernel_size, nxt.stride)
                and pk.igdn_deconv_tail_packed_applicable(
                    jax.ShapeDtypeStruct(
                        (*x.shape[:3], 4 * nxt.features), x.dtype),
                    self.layers[i + 3].features,
                    self.layers[i + 3].kernel_size,
                    self.layers[i + 3].stride)
            ):
                # packed g_s chain (pallas_kernels.FUSE_GS_PACKED): the wide
                # IGDN→deconv emits its pre-shuffle tensor phase-major and
                # the narrow tail consumes it — the shuffled intermediate
                # (~200 MB/frame at 1080p) never materializes. Params,
                # names and shapes identical to the unfused layers.
                g2, d_wide = layer, nxt
                g3, d_tail = self.layers[i + 2], self.layers[i + 3]
                beta2, gamma2 = g2(x, return_weights=True)
                kw, bw = d_wide(x, return_weights=True)
                # the return_weights paths only read x.shape[-1] (Deconv's
                # in_ch); the tail layers' logical input has d_wide.features
                # channels, so hand them a shape stand-in
                mid = jax.ShapeDtypeStruct(
                    (*x.shape[:3], d_wide.features), x.dtype)
                beta3, gamma3 = g3(mid, return_weights=True)
                kt, bt = d_tail(mid, return_weights=True)
                packed = pk.igdn_deconv_wide_packed(
                    x, gamma2.T, beta2, kw, bw)
                x = pk.igdn_deconv_tail_packed(
                    packed, gamma3.T, beta3, kt, bt)
                i += 4
                continue
            if (
                isinstance(layer, GDN)
                and not layer.inverse
                and isinstance(nxt, Conv)
                and hasattr(x, "ndim")
                and x.ndim == 4
                and pk.gdn_conv_applicable(
                    x, x.shape[-1], nxt.kernel_size, nxt.stride)
            ):
                # encoder mirror of the IGDN→Deconv peephole below: the GDN
                # fuses into its consumer k5s2 conv (pallas_kernels.
                # gdn_conv_fused); params/names/shapes identical
                beta_v, gamma_v = layer(x, return_weights=True)
                kernel, bias = nxt(x, return_weights=True)
                x = pk.gdn_conv_fused(x, gamma_v.T, beta_v, kernel, bias)
                i += 2
                continue
            if (
                isinstance(layer, GDN)
                and layer.inverse
                and isinstance(nxt, Deconv)
                and nxt.kernel_size % 2 == 1
                and nxt.stride == 2
                and hasattr(x, "ndim")
                and pk.igdn_deconv_applicable(
                    x, nxt.features, nxt.kernel_size, nxt.stride)
            ):
                beta_v, gamma_v = layer(x, return_weights=True)
                kernel, bias = nxt(x, return_weights=True)
                x = pk.igdn_deconv_fused(
                    x, gamma_v.T, beta_v, kernel, bias, nxt.stride)
                i += 2
                continue
            if (
                isinstance(layer, GDN)
                and layer.inverse
                and isinstance(nxt, Deconv)
                and hasattr(x, "ndim")
                and x.ndim == 4
                and pk.igdn_deconv_wide_applicable(
                    x, nxt.features, nxt.kernel_size, nxt.stride)
            ):
                # the wide interior stages the narrow tail kernel's feature
                # cap excludes (pallas_kernels.igdn_deconv_wide)
                beta_v, gamma_v = layer(x, return_weights=True)
                kernel, bias = nxt(x, return_weights=True)
                x = pk.igdn_deconv_wide(
                    x, gamma_v.T, beta_v, kernel, bias)
                i += 2
                continue
            x = layer(x)
            i += 1
        return x
