"""Entropy-coder backends.

``get_coder(name)`` returns an object with the uniform array API:

  encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes
  decode_with_indexes(data, indexes, cdfs, cdf_lengths, offsets) -> int32[n]
  encode_stream(symbols, indexes, ...) -> bytes   single plain-stream format
  make_stream_decoder(data) -> StreamDecoder (for autoregressive decode)

encode_with_indexes/decode_with_indexes are a matched pair in each backend's
own container (rans_interleaved wraps multi-lane containers). Autoregressive
paths that decode incrementally MUST pair encode_stream with
make_stream_decoder — StreamDecoder only reads the plain single-stream
format, never a lane container.

Backends:
  "rans"             — native C++ single-stream; bitstream-compatible with the
                       reference's ``compressai.ans`` module.
  "rans_interleaved" — native C++ multi-lane container (parallel decode);
                       NOT reference-bitstream-compatible (own container).
  "numpy"            — pure-Python executable spec (slow; tests/fallback).
"""

import numpy as np

from . import _numpy_rans


class NumpyCoder:
    name = "numpy"
    supports_lut = False
    supports_runs = False
    supports_stream_runs = False

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets):
        cdfs = np.asarray(cdfs, dtype=np.int32)
        return _numpy_rans.encode_with_indexes(
            np.asarray(symbols, dtype=np.int32).reshape(-1),
            np.asarray(indexes, dtype=np.int32).reshape(-1),
            cdfs,
            np.asarray(cdf_lengths, dtype=np.int32),
            np.asarray(offsets, dtype=np.int32),
        )

    def decode_with_indexes(self, data, indexes, cdfs, cdf_lengths, offsets,
                            lut=None):
        del lut  # reference spec path uses the searchsorted lookup
        cdfs = np.asarray(cdfs, dtype=np.int32)
        return _numpy_rans.decode_with_indexes(
            data,
            np.asarray(indexes, dtype=np.int32).reshape(-1),
            cdfs,
            np.asarray(cdf_lengths, dtype=np.int32),
            np.asarray(offsets, dtype=np.int32),
        )

    def encode_stream(self, symbols, indexes, cdfs, cdf_lengths, offsets,
                      esym=None):
        del esym  # spec path has no acceleration tables
        return self.encode_with_indexes(
            symbols, indexes, cdfs, cdf_lengths, offsets
        )

    def make_stream_decoder(self, data):
        return _NumpyStream(data)


class _NumpyStream:
    def __init__(self, data):
        self._dec = _numpy_rans.StreamDecoder(data)

    def decode(self, indexes, cdfs, cdf_lengths, offsets, lut=None):
        del lut  # spec path has no acceleration tables
        return self._dec.decode(
            np.asarray(indexes, dtype=np.int32).reshape(-1),
            np.asarray(cdfs, dtype=np.int32),
            np.asarray(cdf_lengths, dtype=np.int32),
            np.asarray(offsets, dtype=np.int32),
        )


class NativeCoder:
    name = "rans"
    supports_lut = True
    # run-based grouped container (counts-derived rows, chunked lanes,
    # fused packed decode) — the sparse transport's fast path
    supports_runs = True
    # segmented single-stream run coding (wavefront v2: per-round
    # grouped-by-row order, StreamDecoder.decode_runs per round)
    supports_stream_runs = True
    n_lanes = 1  # single stream

    def __init__(self):
        from . import rans as _rans

        self._rans = _rans

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets,
                            esym=None):
        return self._rans.encode_with_indexes(
            symbols, indexes, cdfs, cdf_lengths, offsets, esym
        )

    def build_enc_table(self, cdfs, cdf_lengths):
        return self._rans.build_enc_table(cdfs, cdf_lengths)

    def encode_runs(self, symbols, counts, cdfs, cdf_lengths, offsets,
                    esym=None):
        return self._rans.encode_runs(
            symbols, counts, cdfs, cdf_lengths, offsets, self.n_lanes, esym
        )

    def encode_stream(self, symbols, indexes, cdfs, cdf_lengths, offsets,
                      esym=None):
        """Plain single-stream encode — the ONLY format make_stream_decoder
        reads. Deliberately not overridden by InterleavedCoder (whose
        encode_with_indexes emits a multi-lane container that a stream
        decoder would silently mis-parse as symbols)."""
        return self._rans.encode_with_indexes(
            symbols, indexes, cdfs, cdf_lengths, offsets, esym
        )

    def encode_runs_segmented(self, symbols, seg_counts, cdfs, cdf_lengths,
                              offsets, esym=None):
        return self._rans.encode_runs_segmented(
            symbols, seg_counts, cdfs, cdf_lengths, offsets, esym
        )

    def decode_runs(self, data, counts, n, cdfs, cdf_lengths, offsets,
                    lut=None):
        return self._rans.decode_runs(
            data, counts, n, cdfs, cdf_lengths, offsets, lut
        )

    def decode_runs_packed(self, data, counts, n, cap, cdfs, cdf_lengths,
                           offsets, lut=None):
        return self._rans.decode_runs_packed(
            data, counts, n, cap, cdfs, cdf_lengths, offsets, lut
        )

    def expand_sparse(self, maskbits, values, n):
        return self._rans.expand_sparse(maskbits, values, n)

    def decode_with_indexes(self, data, indexes, cdfs, cdf_lengths, offsets,
                            lut=None):
        return self._rans.decode_with_indexes(
            data, indexes, cdfs, cdf_lengths, offsets, lut
        )

    def build_lut(self, cdfs, cdf_lengths):
        return self._rans.build_lut(cdfs, cdf_lengths)

    def make_stream_decoder(self, data):
        return self._rans.StreamDecoder(data)


class InterleavedCoder(NativeCoder):
    name = "rans_interleaved"

    def __init__(self, n_lanes: int = 8):
        super().__init__()
        self.n_lanes = int(n_lanes)

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets,
                            esym=None):
        return self._rans.encode_interleaved(
            symbols, indexes, cdfs, cdf_lengths, offsets, self.n_lanes, esym
        )

    def decode_with_indexes(self, data, indexes, cdfs, cdf_lengths, offsets,
                            lut=None):
        return self._rans.decode_interleaved(
            data, indexes, cdfs, cdf_lengths, offsets, lut
        )


_cache = {}


def get_coder(name=None):
    """Return a coder backend instance (cached)."""
    if name is None:
        from .. import get_entropy_coder

        name = get_entropy_coder()
    if name not in _cache:
        if name == "numpy":
            _cache[name] = NumpyCoder()
        elif name == "rans":
            try:
                _cache[name] = NativeCoder()
            except RuntimeError:
                _cache[name] = NumpyCoder()
        elif name == "rans_interleaved":
            try:
                _cache[name] = InterleavedCoder()
            except RuntimeError:
                _cache[name] = NumpyCoder()
        else:
            raise ValueError(f"unknown entropy coder: {name!r}")
    return _cache[name]
