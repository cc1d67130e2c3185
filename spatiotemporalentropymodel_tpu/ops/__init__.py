from .bound import lower_bound, upper_bound
from .parametrizers import NonNegativeParametrizer
from .quantize import (
    dequantize,
    quantize,
    quantize_dequantize,
    quantize_noise,
    quantize_symbols,
    ste_round,
)
from .padding import crop_to, pad_to_multiple

__all__ = [
    "lower_bound",
    "upper_bound",
    "NonNegativeParametrizer",
    "ste_round",
    "quantize",
    "quantize_noise",
    "quantize_dequantize",
    "quantize_symbols",
    "dequantize",
    "pad_to_multiple",
    "crop_to",
]
