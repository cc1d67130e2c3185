"""Cheng2020 residual/attention building blocks and SFT layers.

Parity: compressai/layers/layers.py:67-213 (residual blocks, attention) and
compressai/models/stem_utils.py:24-63 (SFT / SFTResblk used by the ROI family).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from .conv import Conv, SubpelConv3x3
from .gdn import GDN


def leaky_relu(x):
    return jax.nn.leaky_relu(x, 0.01)  # torch default negative_slope


class ResidualBlockWithStride(nn.Module):
    """conv3x3(s) → lrelu → conv3x3 → GDN, + 1x1-strided skip (layers.py:67-98)."""

    out_ch: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = Conv(self.out_ch, 3, self.stride, name="conv1")(x)
        out = leaky_relu(out)
        out = Conv(self.out_ch, 3, 1, name="conv2")(out)
        out = GDN(self.out_ch, name="gdn")(out)
        if self.stride != 1 or in_ch != self.out_ch:
            identity = Conv(self.out_ch, 1, self.stride, name="skip")(x)
        else:
            identity = x
        return out + identity


class ResidualBlockUpsample(nn.Module):
    """subpel → lrelu → conv3x3 → IGDN, + subpel skip (layers.py:101-126)."""

    out_ch: int
    upsample: int = 2

    @nn.compact
    def __call__(self, x):
        out = SubpelConv3x3(self.out_ch, self.upsample, name="subpel_conv")(x)
        out = leaky_relu(out)
        out = Conv(self.out_ch, 3, 1, name="conv")(out)
        out = GDN(self.out_ch, inverse=True, name="igdn")(out)
        identity = SubpelConv3x3(self.out_ch, self.upsample, name="upsample")(x)
        return out + identity


class ResidualBlock(nn.Module):
    """conv3x3 → lrelu → conv3x3 → lrelu, + skip (layers.py:129-159)."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = Conv(self.out_ch, 3, 1, name="conv1")(x)
        out = leaky_relu(out)
        out = Conv(self.out_ch, 3, 1, name="conv2")(out)
        out = leaky_relu(out)
        if in_ch != self.out_ch:
            identity = Conv(self.out_ch, 1, 1, name="skip")(x)
        else:
            identity = x
        return out + identity


class _ResidualUnit(nn.Module):
    """1x1(N/2) → relu → 3x3(N/2) → relu → 1x1(N), +x, relu (layers.py:177-196)."""

    n: int

    @nn.compact
    def __call__(self, x):
        out = Conv(self.n // 2, 1, 1, name="conv_0")(x)
        out = jax.nn.relu(out)
        out = Conv(self.n // 2, 3, 1, name="conv_1")(out)
        out = jax.nn.relu(out)
        out = Conv(self.n, 1, 1, name="conv_2")(out)
        return jax.nn.relu(out + x)


class AttentionBlock(nn.Module):
    """Sigmoid-gated dual-branch attention (layers.py:162-213)."""

    n: int

    @nn.compact
    def __call__(self, x):
        a = x
        for i in range(3):
            a = _ResidualUnit(self.n, name=f"a_{i}")(a)
        b = x
        for i in range(3):
            b = _ResidualUnit(self.n, name=f"b_{i}")(b)
        b = Conv(self.n, 1, 1, name="b_out")(b)
        return x + a * jax.nn.sigmoid(b)


def adaptive_avg_pool(x, out_hw):
    """NHWC adaptive average pool (torch F.adaptive_avg_pool2d semantics for
    divisible sizes; general sizes fall back to area resize)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h == oh and w == ow:
        return x
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        return x.reshape(b, oh, kh, ow, kw, c).mean(axis=(2, 4))
    return jax.image.resize(x, (b, oh, ow, c), method="linear")


class SFT(nn.Module):
    """Spatial feature transform conditioned on a quality map
    (stem_utils.py:24-43): shared conv on the (pooled) qmap → per-pixel
    (gamma, beta); out = x*(1+gamma) + beta. ``prior_nc`` (the qmap channel
    count) is kept for reference-signature parity; flax infers it."""

    x_nc: int
    prior_nc: int = 1
    ks: int = 3
    nhidden: int = 128

    @nn.compact
    def __call__(self, x, qmap):
        qmap = adaptive_avg_pool(qmap, x.shape[1:3])
        actv = Conv(self.nhidden, self.ks, 1, name="mlp_shared")(qmap)
        actv = jax.nn.relu(actv)
        gamma = Conv(self.x_nc, self.ks, 1, name="mlp_gamma")(actv)
        beta = Conv(self.x_nc, self.ks, 1, name="mlp_beta")(actv)
        return x * (1 + gamma) + beta


class SFTResblk(nn.Module):
    """Residual block applying SFT twice (stem_utils.py:46-63)."""

    x_nc: int
    prior_nc: int = 1
    ks: int = 3

    @nn.compact
    def __call__(self, x, qmap):
        dx = SFT(self.x_nc, self.prior_nc, ks=self.ks, name="norm_0")(x, qmap)
        dx = Conv(self.x_nc, 3, 1, name="conv_0")(jax.nn.leaky_relu(dx, 0.2))
        dx = SFT(self.x_nc, self.prior_nc, ks=self.ks, name="norm_1")(dx, qmap)
        dx = Conv(self.x_nc, 3, 1, name="conv_1")(jax.nn.leaky_relu(dx, 0.2))
        return x + dx
