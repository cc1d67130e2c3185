"""ctypes bindings for the native rANS coder.

API parity with the reference's ``compressai.ans`` module
(rans_interface.cpp:352-372) but with batched NumPy int32 arrays instead of
Python lists — the tensor→list conversion was the reference's dominant host
cost (entropy_models.py:222-231).
"""

import ctypes
from functools import lru_cache
from typing import NamedTuple

import numpy as np

from .build import build

_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")


@lru_cache(maxsize=1)
def _lib():
    lib = ctypes.CDLL(str(build()))

    lib.stem_pmf_to_quantized_cdf.restype = ctypes.c_int
    lib.stem_pmf_to_quantized_cdf.argtypes = [
        _f64p, ctypes.c_int32, ctypes.c_int32, _i32p,
    ]

    lib.stem_encode_with_indexes.restype = ctypes.c_int64
    lib.stem_encode_with_indexes.argtypes = [
        _i32p, _i32p, ctypes.c_int64, _i32p, ctypes.c_int32, ctypes.c_int32,
        _i32p, _i32p, _u8p, ctypes.c_int64,
    ]

    lib.stem_decode_with_indexes.restype = ctypes.c_int
    lib.stem_decode_with_indexes.argtypes = [
        _u8p, ctypes.c_int64, _i32p, ctypes.c_int64, _i32p, ctypes.c_int32,
        ctypes.c_int32, _i32p, _i32p, _i32p,
    ]

    lib.stem_encode_interleaved.restype = ctypes.c_int64
    lib.stem_encode_interleaved.argtypes = [
        _i32p, _i32p, ctypes.c_int64, _i32p, ctypes.c_int32, ctypes.c_int32,
        _i32p, _i32p, ctypes.c_int32, _u8p, ctypes.c_int64,
    ]

    lib.stem_decode_interleaved.restype = ctypes.c_int
    lib.stem_decode_interleaved.argtypes = [
        _u8p, ctypes.c_int64, _i32p, ctypes.c_int64, _i32p, ctypes.c_int32,
        ctypes.c_int32, _i32p, _i32p, _i32p, ctypes.c_void_p, ctypes.c_void_p,
    ]

    lib.stem_decode_with_indexes_lut.restype = ctypes.c_int
    lib.stem_decode_with_indexes_lut.argtypes = [
        _u8p, ctypes.c_int64, _i32p, ctypes.c_int64, _i32p, ctypes.c_int32,
        ctypes.c_int32, _i32p, _i32p, ctypes.c_void_p, ctypes.c_void_p, _i32p,
    ]

    lib.stem_build_lut.restype = None
    lib.stem_build_lut.argtypes = [
        _i32p, ctypes.c_int32, ctypes.c_int32, _i32p,
        np.ctypeslib.ndpointer(dtype=np.int16, flags="C_CONTIGUOUS"),
    ]

    lib.stem_build_dom.restype = None
    lib.stem_build_dom.argtypes = [
        _i32p, ctypes.c_int32, ctypes.c_int32, _i32p, _i32p,
    ]

    lib.stem_dec_create.restype = ctypes.c_void_p
    lib.stem_dec_create.argtypes = [_u8p, ctypes.c_int64]
    lib.stem_dec_destroy.restype = None
    lib.stem_dec_destroy.argtypes = [ctypes.c_void_p]
    lib.stem_dec_decode.restype = ctypes.c_int
    lib.stem_dec_decode.argtypes = [
        ctypes.c_void_p, _i32p, ctypes.c_int64, _i32p, ctypes.c_int32,
        ctypes.c_int32, _i32p, _i32p, _i32p,
    ]
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except RuntimeError:
        return False


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def pmf_to_quantized_cdf(pmf, precision: int = 16) -> np.ndarray:
    pmf = np.ascontiguousarray(pmf, dtype=np.float64)
    out = np.empty(pmf.shape[0] + 1, dtype=np.int32)
    rc = _lib().stem_pmf_to_quantized_cdf(pmf, pmf.shape[0], precision, out)
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed (rc={rc})")
    return out


def _prep(symbols, indexes, cdfs, cdf_lengths, offsets):
    symbols = _as_i32(symbols).reshape(-1)
    indexes = _as_i32(indexes).reshape(-1)
    cdfs = _as_i32(cdfs)
    assert cdfs.ndim == 2
    return symbols, indexes, cdfs, _as_i32(cdf_lengths), _as_i32(offsets)


def encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    symbols, indexes, cdfs, lengths, offs = _prep(
        symbols, indexes, cdfs, cdf_lengths, offsets
    )
    n = symbols.shape[0]
    cap = 4 * n + 1024
    while True:
        out = np.empty(cap, dtype=np.uint8)
        rc = _lib().stem_encode_with_indexes(
            symbols, indexes, n, cdfs, cdfs.shape[0], cdfs.shape[1],
            lengths, offs, out, cap,
        )
        if rc >= 0:
            return out[:rc].tobytes()
        cap = -rc  # retry with the exact required size


class DecodeLUT(NamedTuple):
    """Decode acceleration tables: the O(1) direct-lookup table plus the
    per-row dominant-symbol shortcut (rans.cpp::decode_lane `dom` path)."""

    lut: np.ndarray  # (rows, 2^16) int16
    dom: np.ndarray  # (rows, 3) int32 {symbol, cdf[sym], cdf[sym+1]}


def _lut_ptrs(lut):
    if lut is None:
        return None, None
    if isinstance(lut, DecodeLUT):
        return lut.lut.ctypes.data, lut.dom.ctypes.data
    return lut.ctypes.data, None  # bare (rows, 2^16) array


def build_lut(cdfs, cdf_lengths) -> DecodeLUT:
    """Decode acceleration tables (O(1) lookup + dominant-symbol shortcut)."""
    cdfs = _as_i32(cdfs)
    lengths = _as_i32(cdf_lengths)
    lut = np.zeros((cdfs.shape[0], 1 << 16), np.int16)
    _lib().stem_build_lut(cdfs, cdfs.shape[0], cdfs.shape[1], lengths, lut)
    dom = np.zeros((cdfs.shape[0], 3), np.int32)
    _lib().stem_build_dom(cdfs, cdfs.shape[0], cdfs.shape[1], lengths, dom)
    return DecodeLUT(lut, dom)


def decode_with_indexes(data: bytes, indexes, cdfs, cdf_lengths, offsets,
                        lut=None):
    indexes = _as_i32(indexes).reshape(-1)
    cdfs = _as_i32(cdfs)
    lengths, offs = _as_i32(cdf_lengths), _as_i32(offsets)
    n = indexes.shape[0]
    out = np.empty(n, dtype=np.int32)
    buf = np.frombuffer(data, dtype=np.uint8)
    lut_ptr, dom_ptr = _lut_ptrs(lut)
    if lut_ptr is not None:
        rc = _lib().stem_decode_with_indexes_lut(
            buf, buf.shape[0], indexes, n, cdfs, cdfs.shape[0], cdfs.shape[1],
            lengths, offs, lut_ptr, dom_ptr, out,
        )
    else:
        rc = _lib().stem_decode_with_indexes(
            buf, buf.shape[0], indexes, n, cdfs, cdfs.shape[0], cdfs.shape[1],
            lengths, offs, out,
        )
    if rc != 0:
        raise ValueError(f"rans decode failed (rc={rc})")
    return out


def encode_interleaved(
    symbols, indexes, cdfs, cdf_lengths, offsets, n_lanes: int = 8
) -> bytes:
    symbols, indexes, cdfs, lengths, offs = _prep(
        symbols, indexes, cdfs, cdf_lengths, offsets
    )
    n = symbols.shape[0]
    n_lanes = max(1, min(int(n_lanes), max(1, n)))
    cap = 4 * n + 64 * n_lanes + 1024
    while True:
        out = np.empty(cap, dtype=np.uint8)
        rc = _lib().stem_encode_interleaved(
            symbols, indexes, n, cdfs, cdfs.shape[0], cdfs.shape[1],
            lengths, offs, n_lanes, out, cap,
        )
        if rc >= 0:
            return out[:rc].tobytes()
        cap = -rc


def decode_interleaved(data: bytes, indexes, cdfs, cdf_lengths, offsets,
                       lut=None):
    indexes = _as_i32(indexes).reshape(-1)
    cdfs = _as_i32(cdfs)
    lengths, offs = _as_i32(cdf_lengths), _as_i32(offsets)
    n = indexes.shape[0]
    out = np.empty(n, dtype=np.int32)
    buf = np.frombuffer(data, dtype=np.uint8)
    lut_ptr, dom_ptr = _lut_ptrs(lut)
    rc = _lib().stem_decode_interleaved(
        buf, buf.shape[0], indexes, n, cdfs, cdfs.shape[0], cdfs.shape[1],
        lengths, offs, out, lut_ptr, dom_ptr,
    )
    if rc != 0:
        raise ValueError(f"interleaved rans decode failed (rc={rc})")
    return out


class StreamDecoder:
    """Stateful decoder for autoregressive decode (set_stream/decode_stream
    parity, rans_interface.cpp:277-350)."""

    def __init__(self, data: bytes):
        buf = np.frombuffer(data, dtype=np.uint8)
        self._buf = np.ascontiguousarray(buf)
        self._h = _lib().stem_dec_create(self._buf, self._buf.shape[0])

    def decode(self, indexes, cdfs, cdf_lengths, offsets):
        indexes = _as_i32(indexes).reshape(-1)
        cdfs = _as_i32(cdfs)
        lengths, offs = _as_i32(cdf_lengths), _as_i32(offsets)
        out = np.empty(indexes.shape[0], dtype=np.int32)
        rc = _lib().stem_dec_decode(
            self._h, indexes, indexes.shape[0], cdfs, cdfs.shape[0],
            cdfs.shape[1], lengths, offs, out,
        )
        if rc != 0:
            raise ValueError(f"stream decode failed (rc={rc})")
        return out

    def close(self):
        if self._h is not None:
            _lib().stem_dec_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
