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
