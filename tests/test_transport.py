"""Unit tests for the sparse-grouped symbol transport (entropy/transport.py).

The device side (models/stem.py sparse exprs) is covered end-to-end in
test_pipeline.py / test_charm.py; these pin the host-side pieces and edge
cases (all-zero planes, full capacity, layout validation).
"""

import numpy as np
import pytest

from spatiotemporalentropymodel_tpu.entropy import transport
from spatiotemporalentropymodel_tpu.entropy.tables import CodecTables
from spatiotemporalentropymodel_tpu.entropy import update_gaussian_tables


@pytest.fixture(scope="module")
def tables() -> CodecTables:
    return update_gaussian_tables()


def test_rows_from_counts():
    counts = np.array([[2, 0, 3], [0, 5, 0]], np.int32)
    rows = transport.rows_from_counts(counts)
    np.testing.assert_array_equal(rows[0], [0, 0, 2, 2, 2])
    np.testing.assert_array_equal(rows[1], [1, 1, 1, 1, 1])


def test_grouped_coding_roundtrip(tables):
    rng = np.random.default_rng(0)
    b, n, levels = 2, 512, 64
    # grouped-order symbols with realistic sparsity
    rows = np.sort(rng.integers(0, levels, (b, n)).astype(np.int32), axis=-1)
    counts = np.stack([np.bincount(rows[i], minlength=levels)
                       for i in range(b)]).astype(np.int32)
    symbols = (rng.random((b, n)) < 0.1) * rng.integers(-5, 6, (b, n))
    symbols = symbols.astype(np.int32)

    strings = transport.encode_grouped(symbols, counts, tables)
    decoded = transport.decode_grouped(strings, counts, tables)
    np.testing.assert_array_equal(decoded, symbols)


def test_pack_decode_payload_all_zero():
    y = np.zeros((2, 64), np.int32)
    maskbits, values = transport.pack_decode_payload(y, cap=16)
    assert maskbits.sum() == 0
    assert values.sum() == 0


def test_pack_decode_payload_full_capacity():
    y = np.ones((1, 64), np.int32) * 3
    y[0, ::2] = 0  # 32 nonzeros, cap exactly 32
    maskbits, values = transport.pack_decode_payload(y, cap=32)
    mask = np.unpackbits(maskbits, axis=-1, bitorder="little").astype(bool)
    np.testing.assert_array_equal(mask[0], y[0] != 0)
    assert (values[0] == 3).sum() == 32


def test_unpack_encode_rejects_wrong_size():
    layout = transport.SparseLayout(b=1, n=64, zn=8, levels=4)
    with pytest.raises(ValueError):
        transport.unpack_encode(np.zeros(layout.total + 1, np.uint8), layout)


def test_sparse_capacity_formula():
    """The single shared capacity definition: n/8 with a 64 floor, capped
    at n (mirrored by the device encoder and charm's explicit n/4)."""
    assert transport.sparse_capacity(1_566_720) == 195_840  # 1080p latent
    assert transport.sparse_capacity(192) == 64  # small plane floor
    assert transport.sparse_capacity(32) == 32  # floor capped at n
    layout = transport.SparseLayout(b=1, n=192, zn=8, levels=4)
    assert layout.cap == transport.sparse_capacity(192)
    explicit = transport.SparseLayout(b=1, n=192, zn=8, levels=4,
                                      cap_value=48)
    assert explicit.cap == 48


class TestPackCounts:
    """Varint counts wire format (.stemv v4 side-info)."""

    def test_roundtrip(self):
        import io

        rng = np.random.default_rng(3)
        counts = np.zeros((4, 64), np.int64)
        for i in range(4):
            rows = rng.choice(64, size=rng.integers(0, 30), replace=False)
            counts[i, rows] = rng.integers(1, 2**22, rows.size)
        blob = transport.pack_counts(counts)
        out = transport.unpack_counts(io.BytesIO(blob))
        np.testing.assert_array_equal(out, counts)

    def test_smaller_than_raw_u32(self):
        counts = np.zeros((4, 64), np.int64)
        counts[:, 10:35] = 5000  # 25 used rows/group, typical trained model
        assert len(transport.pack_counts(counts)) < 4 * 64 * 4 / 3

    def test_extra_bytes_untouched(self):
        import io

        f = io.BytesIO(transport.pack_counts(np.array([[0, 7, 0]])) + b"xyz")
        np.testing.assert_array_equal(transport.unpack_counts(f),
                                      [[0, 7, 0]])
        assert f.read() == b"xyz"
