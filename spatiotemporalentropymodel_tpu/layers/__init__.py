from .conv import (
    Conv,
    Deconv,
    Sequential,
    SubpelConv3x3,
    conv,
    conv1x1,
    conv3x3,
    deconv,
    pixel_shuffle,
)
from .gdn import GDN, GDN1
from .masked_conv import MaskedConv2d, make_causal_mask
from .blocks import (
    SFT,
    AttentionBlock,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SFTResblk,
    adaptive_avg_pool,
    leaky_relu,
)

__all__ = [
    "Conv",
    "Deconv",
    "Sequential",
    "SubpelConv3x3",
    "conv",
    "conv1x1",
    "conv3x3",
    "deconv",
    "pixel_shuffle",
    "GDN",
    "GDN1",
    "MaskedConv2d",
    "make_causal_mask",
    "ResidualBlock",
    "ResidualBlockWithStride",
    "ResidualBlockUpsample",
    "AttentionBlock",
    "SFT",
    "SFTResblk",
    "adaptive_avg_pool",
    "leaky_relu",
]
