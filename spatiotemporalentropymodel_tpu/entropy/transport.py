"""Host side of the sparse-grouped symbol transport.

Counterpart of ``models/stem.py::fused_encode_sparse_expr`` /
``fused_params_sparse_expr`` / ``fused_reconstruct_sparse_expr``: unpack the
device's packed transport buffer, run the rANS coder in grouped-by-CDF-row
order (per-symbol row ids rebuilt from the 64 counts — no index plane ever
crosses the link), and pack decoded symbols back into (bitmask + compacted
int8 values) for upload.

Replaces the reference's per-tensor ``.tolist()`` boundary
(entropy_models.py:201-233) with, per 1080p frame: ~0.5 MB down on encode and
~0.5 MB up on decode (zero fetches — the container carries the row counts),
vs ~10 MB dense.
"""

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from ..coders import get_coder
from . import base as entropy_base
from .tables import CodecTables


def sparse_capacity(n: int) -> int:
    """Values-plane capacity for n symbols — THE single definition both the
    device encode expression (models/stem.py::_sparse_capacity) and the host
    unpack (SparseLayout.cap) must agree on. Converged models run ~5-8%
    nonzeros at the published 0.08-0.16 bpp, so n/8 leaves ~2× headroom
    (overflow falls back to the dense transport); small planes get a floor
    since their byte cost is negligible and their nonzero fraction noisier."""
    return min(n, max(n // 8, 64))


@dataclass(frozen=True)
class SparseLayout:
    """Byte offsets of ``fused_encode_sparse_expr``'s buffer."""

    b: int
    n: int  # y symbols per batch element
    zn: int  # z symbols per batch element
    levels: int
    # explicit values-plane capacity for layouts whose encoder uses a
    # different formula (charm.py packs n//4); default = sparse_capacity(n)
    cap_value: Optional[int] = None

    @property
    def cap(self) -> int:
        return self.cap_value if self.cap_value is not None else \
            sparse_capacity(self.n)

    @property
    def sizes(self):
        b = self.b
        return (
            b * self.n // 8,       # bitmask
            b * self.cap,          # values i8
            b * self.levels * 4,   # counts i32
            b * self.zn,           # z i8
            b * 2 * 4,             # meta i32 (nz, overflow)
        )

    @property
    def total(self) -> int:
        return sum(self.sizes)


@dataclass
class SparseEncodePlanes:
    y_sorted: np.ndarray   # (b, n) int32, grouped-by-row order
    counts: np.ndarray     # (b, levels) int32
    z_sym: np.ndarray      # (b, zn) int32 (flat)
    overflow: bool


def unpack_encode(buf, layout: SparseLayout) -> SparseEncodePlanes:
    buf = np.asarray(buf, np.uint8)
    if buf.size != layout.total:
        raise ValueError(
            f"transport buffer size {buf.size} != layout {layout.total}"
        )
    s = layout.sizes
    off = np.cumsum((0,) + s)
    b, n, cap = layout.b, layout.n, layout.cap

    maskbits = buf[off[0]:off[1]].reshape(b, n // 8)
    values = buf[off[1]:off[2]].view(np.int8).reshape(b, cap)
    counts = buf[off[2]:off[3]].view(np.int32).reshape(b, layout.levels)
    z_sym = buf[off[3]:off[4]].view(np.int8).reshape(b, layout.zn)
    meta = buf[off[4]:off[5]].view(np.int32).reshape(b, 2)

    if meta[:, 1].any():  # int8/capacity overflow → caller re-encodes dense
        return SparseEncodePlanes(
            y_sorted=np.zeros((b, n), np.int32),
            counts=counts,
            z_sym=z_sym.astype(np.int32),
            overflow=True,
        )

    mask = np.unpackbits(maskbits, axis=-1, bitorder="little").astype(bool)
    y_sorted = np.zeros((b, n), np.int32)
    for i in range(b):
        nz = int(meta[i, 0])
        y_sorted[i, mask[i]] = values[i, :nz]
    return SparseEncodePlanes(
        y_sorted=y_sorted,
        counts=counts,
        z_sym=z_sym.astype(np.int32),
        overflow=False,
    )


def rows_from_counts(counts: np.ndarray) -> np.ndarray:
    """(b, levels) counts → (b, n) per-symbol CDF-row ids in grouped order."""
    return np.stack([
        np.repeat(np.arange(counts.shape[1], dtype=np.int32), counts[i])
        for i in range(counts.shape[0])
    ])


def encode_grouped(
    y_sorted: np.ndarray,
    counts: np.ndarray,
    tables: CodecTables,
    coder=None,
) -> List[bytes]:
    """rANS-encode grouped-order symbols (one stream per batch element)."""
    return entropy_base.compress(
        y_sorted, rows_from_counts(counts), tables, coder, order="hwc"
    )


def decode_grouped(
    strings: Sequence[bytes],
    counts: np.ndarray,
    tables: CodecTables,
    coder=None,
) -> np.ndarray:
    """Decode grouped-order streams → (b, n) int32 sorted symbols."""
    return entropy_base.decompress(
        strings, rows_from_counts(counts), tables, coder, order="hwc"
    )


def pack_decode_payload(y_sorted: np.ndarray, cap: int):
    """(b, n) decoded symbols → (maskbits u8 (b, n/8), values i8 (b, cap))
    for upload; symbols must fit int8 (they do — the encoder clamped)."""
    b, n = y_sorted.shape
    mask = y_sorted != 0
    maskbits = np.packbits(mask, axis=-1, bitorder="little")
    values = np.zeros((b, cap), np.int8)
    for i in range(b):
        nzv = y_sorted[i, mask[i]]
        values[i, : nzv.size] = nzv.astype(np.int8)
    return maskbits, values
