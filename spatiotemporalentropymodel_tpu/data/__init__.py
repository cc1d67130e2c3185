from .gop import GOPDataset, GOPFrame, GOPSequence, HEVC_GOP, UVG_GOP
from .image_folder import ImageFolder
from .pipeline import batch_iterator, prefetch_to_device
from .qmap import gradient_qmap, synthesize_qmap, uniform_qmap
from .transforms import (
    rgb2ycbcr,
    ycbcr2rgb,
    yuv_420_to_444,
    yuv_444_to_420,
)
from .vimeo import (
    TEMPORAL_SUBSAMPLES,
    VimeoSepTuplet,
    VimeoSepTupletQMap,
    subsample_frames,
)

__all__ = [
    "VimeoSepTuplet",
    "VimeoSepTupletQMap",
    "TEMPORAL_SUBSAMPLES",
    "subsample_frames",
    "ImageFolder",
    "GOPDataset",
    "GOPSequence",
    "GOPFrame",
    "UVG_GOP",
    "HEVC_GOP",
    "synthesize_qmap",
    "uniform_qmap",
    "gradient_qmap",
    "batch_iterator",
    "prefetch_to_device",
    "rgb2ycbcr",
    "ycbcr2rgb",
    "yuv_444_to_420",
    "yuv_420_to_444",
]
