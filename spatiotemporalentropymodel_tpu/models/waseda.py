"""Cheng2020 anchor/attention models (residual-block variants of mbt2018).

Parity: compressai/models/waseda.py:29-138 — N == M, residual/attention g_a
and g_s, 3×3-conv hyper pair with subpel upsampling in h_s. Inherits the joint
AR entropy machinery from JointAutoregressiveModule and overrides only the
transform factories.
"""

from ..layers import (
    AttentionBlock,
    Conv,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    Sequential,
    SubpelConv3x3,
)
from .base import CompressionModel
from .priors import (
    JointAutoregressiveHierarchicalPriors,
    JointAutoregressiveModule,
    _LeakyReLU,
)


class Cheng2020AnchorModule(JointAutoregressiveModule):
    def _build_g_a(self):
        n = self.N
        return Sequential(
            [ResidualBlockWithStride(n, 2), ResidualBlock(n),
             ResidualBlockWithStride(n, 2), ResidualBlock(n),
             ResidualBlockWithStride(n, 2), ResidualBlock(n),
             Conv(n, 3, 2)],
            name="g_a",
        )

    def _build_h_a(self):
        n = self.N
        return Sequential(
            [Conv(n, 3, 1), _LeakyReLU(), Conv(n, 3, 1), _LeakyReLU(),
             Conv(n, 3, 2), _LeakyReLU(), Conv(n, 3, 1), _LeakyReLU(),
             Conv(n, 3, 2)],
            name="h_a",
        )

    def _build_h_s(self):
        n = self.N
        return Sequential(
            [Conv(n, 3, 1), _LeakyReLU(), SubpelConv3x3(n, 2), _LeakyReLU(),
             Conv(n * 3 // 2, 3, 1), _LeakyReLU(),
             SubpelConv3x3(n * 3 // 2, 2), _LeakyReLU(),
             Conv(n * 2, 3, 1)],
            name="h_s",
        )

    def _build_g_s(self):
        n = self.N
        return Sequential(
            [ResidualBlock(n), ResidualBlockUpsample(n, 2), ResidualBlock(n),
             ResidualBlockUpsample(n, 2), ResidualBlock(n),
             ResidualBlockUpsample(n, 2), ResidualBlock(n),
             SubpelConv3x3(3, 2)],
            name="g_s",
        )


class Cheng2020AttentionModule(Cheng2020AnchorModule):
    def _build_g_a(self):
        n = self.N
        return Sequential(
            [ResidualBlockWithStride(n, 2), ResidualBlock(n),
             ResidualBlockWithStride(n, 2), AttentionBlock(n), ResidualBlock(n),
             ResidualBlockWithStride(n, 2), ResidualBlock(n),
             Conv(n, 3, 2), AttentionBlock(n)],
            name="g_a",
        )

    def _build_g_s(self):
        n = self.N
        return Sequential(
            [AttentionBlock(n), ResidualBlock(n), ResidualBlockUpsample(n, 2),
             ResidualBlock(n), ResidualBlockUpsample(n, 2), AttentionBlock(n),
             ResidualBlock(n), ResidualBlockUpsample(n, 2), ResidualBlock(n),
             SubpelConv3x3(3, 2)],
            name="g_s",
        )


class Cheng2020Anchor(JointAutoregressiveHierarchicalPriors):
    def __init__(self, N: int = 192, ar_mode: str = "wavefront", **kw):
        CompressionModel.__init__(self, Cheng2020AnchorModule(N, N), **kw)
        self.N = self.M = N
        self.ar_mode = ar_mode
        self._wavefront_cache = {}


class Cheng2020Attention(JointAutoregressiveHierarchicalPriors):
    def __init__(self, N: int = 192, ar_mode: str = "wavefront", **kw):
        CompressionModel.__init__(self, Cheng2020AttentionModule(N, N), **kw)
        self.N = self.M = N
        self.ar_mode = ar_mode
        self._wavefront_cache = {}
