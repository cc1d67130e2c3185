"""Entropy-coder registry tests (reference strategy: compressai_tests/
test_coder.py + test_init.py)."""

import pytest

import spatiotemporalentropymodel_tpu as stem_tpu
from spatiotemporalentropymodel_tpu.coders import get_coder


class TestCoderRegistry:
    def test_available(self):
        coders = stem_tpu.available_entropy_coders()
        assert "rans" in coders and "numpy" in coders
        assert "rans_interleaved" in coders

    def test_default_and_set(self):
        original = stem_tpu.get_entropy_coder()
        try:
            stem_tpu.set_entropy_coder("numpy")
            assert stem_tpu.get_entropy_coder() == "numpy"
            assert get_coder().name == "numpy"
        finally:
            stem_tpu.set_entropy_coder(original)

    def test_invalid_name(self):
        with pytest.raises(ValueError):
            stem_tpu.set_entropy_coder("bogus")
        with pytest.raises(ValueError):
            get_coder("bogus")

    def test_version(self):
        assert isinstance(stem_tpu.__version__, str)


class TestCompatShims:
    """Reference compressai.ans API compatibility (lists in, bytes out)."""

    def _tables(self):
        # one small valid cdf row, as plain python lists like the reference
        cdfs = [[0, 13107, 45875, 58982, 65529, 65536]]
        return cdfs, [6], [-2]

    def test_encoder_decoder_roundtrip(self):
        from spatiotemporalentropymodel_tpu.coders.compat import (
            RansDecoder,
            RansEncoder,
        )

        cdfs, sizes, offsets = self._tables()
        symbols = [0, -2, 1, 1, 0, 2, -1, 1]
        indexes = [0] * len(symbols)
        s = RansEncoder().encode_with_indexes(symbols, indexes, cdfs, sizes,
                                              offsets)
        out = RansDecoder().decode_with_indexes(s, indexes, cdfs, sizes,
                                                offsets)
        assert out == symbols

    def test_buffered_encoder_and_stream_decoder(self):
        from spatiotemporalentropymodel_tpu.coders.compat import (
            BufferedRansEncoder,
            RansDecoder,
        )

        cdfs, sizes, offsets = self._tables()
        enc = BufferedRansEncoder()
        enc.encode_with_indexes([0, -2, 1], [0, 0, 0], cdfs, sizes, offsets)
        enc.encode_with_indexes([1, 0], [0, 0], cdfs, sizes, offsets)
        s = enc.flush()

        dec = RansDecoder()
        dec.set_stream(s)
        assert dec.decode_stream([0, 0, 0], cdfs, sizes, offsets) == [0, -2, 1]
        assert dec.decode_stream([0, 0], cdfs, sizes, offsets) == [1, 0]
