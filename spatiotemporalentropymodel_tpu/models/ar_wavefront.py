"""Wavefront (anti-diagonal) scheduling for autoregressive SPM coding.

The reference decodes masked-conv models pixel-by-pixel with a Python loop and
per-pixel C++ calls (priors.py:558-684, spatiotemporalpriors.py:633-768) —
H·W sequential host round-trips. For a 5×5 raster-causal mask, two pixels
(h, w) and (h', w') are independent whenever |3h + w| == |3h' + w'|: the
dependency set of (h, w) lies strictly below the line t = 3h + w. Scheduling
by t gives T = 3(H−1) + W steps with up to ~min(H, W/3) pixels each:

  * encode runs as ONE jitted `lax.scan` over wavefronts — zero host syncs;
  * decode needs one host rANS call per wavefront (321 for a 1080p latent
    instead of 8160 per-pixel calls), each decoding a whole wavefront batch.

Bitstream symbol order is wavefront order (encoder and decoder agree); this is
the framework's fast AR format, distinct from the reference's raster order.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import build_indexes

SPAN = 3  # wavefront slope for a 5x5 causal mask (offset 2)


def wavefront_tables(h: int, w: int, span: int = SPAN):
    """Static scheduling tables.

    Returns (coords, valid): coords (T, L, 2) int32 pixel positions per
    wavefront (padded with (h, w)=(0, 0)), valid (T, L) bool lane mask, where
    T = span·(h−1) + w and L = max pixels per wavefront.
    """
    buckets = {}
    for i in range(h):
        for j in range(w):
            buckets.setdefault(span * i + j, []).append((i, j))
    T = span * (h - 1) + w
    L = max(len(v) for v in buckets.values())
    coords = np.zeros((T, L, 2), np.int32)
    valid = np.zeros((T, L), bool)
    for t in range(T):
        pix = buckets.get(t, [])
        for l, (i, j) in enumerate(pix):
            coords[t, l] = (i, j)
            valid[t, l] = True
    return jnp.asarray(coords), jnp.asarray(valid)


def _gather_crops(target_pad, coords):
    """target_pad (B, H+4, W+4, C), coords (L, 2) → crops (B, L, 5, 5, C)."""

    def one(c):
        return jax.lax.dynamic_slice(
            target_pad,
            (0, c[0], c[1], 0),
            (target_pad.shape[0], 5, 5, target_pad.shape[3]),
        )

    crops = jax.vmap(one)(coords)  # (L, B, 5, 5, C)
    return jnp.moveaxis(crops, 0, 1)


def _scatter_plane(plane, coords, valid, values, offset=(0, 0)):
    """Write values (B, L, C) into plane at coords (+offset); invalid lanes
    are redirected out of bounds and dropped."""
    hh = jnp.where(valid, coords[:, 0] + offset[0], plane.shape[1] + 10)
    ww = jnp.where(valid, coords[:, 1] + offset[1], plane.shape[2] + 10)
    return plane.at[:, hh, ww, :].set(values, mode="drop")


def make_wavefront_encoder(apply_ar_step, scale_table, in_channels: int):
    """Build a jitted full-device wavefront encoder.

    apply_ar_step: (crops (N,5,5,M), p_vec (N,1,1,P)) -> (scales, means) (N,M)
    Returns fn(target (B,H,W,M), priors (B,H,W,P)) ->
      (symbols (B,H,W,M) int16, indexes (B,H,W,M) uint8) — filled in raster
      positions; the host flattens them in wavefront order. Narrow dtypes
      cut the encode-side fetch 2.7x (the planes are the dominant encode
      transfer at 1080p); symbols saturate at ±32767 — identical to int32
      for any |round(y−μ)| < 32768, i.e. every non-degenerate latent — and
      the saturated value feeds the ŷ context, so encoder and decoder stay
      consistent even when saturation fires.
    """
    if int(jnp.shape(scale_table)[0]) > 256:
        raise ValueError(
            "wavefront encode ships u8 CDF indexes; scale tables are "
            f"limited to 256 rows (got {int(jnp.shape(scale_table)[0])})"
        )

    def encode(target, priors, coords, valid):
        b, h, w, m = target.shape
        target_pad = jnp.pad(target, ((0, 0), (2, 2), (2, 2), (0, 0)))
        syms0 = jnp.zeros((b, h, w, m), jnp.int16)
        idx0 = jnp.zeros((b, h, w, m), jnp.uint8)

        def step(carry, xs):
            target_pad, syms, idxs = carry
            c, v = xs  # (L, 2), (L,)
            l = c.shape[0]
            crops = _gather_crops(target_pad, c)  # (B, L, 5, 5, M)
            pvec = priors[:, c[:, 0], c[:, 1], :]  # (B, L, P)
            crops_f = crops.reshape(b * l, 5, 5, m)
            pvec_f = pvec.reshape(b * l, 1, 1, -1)
            scales, means = apply_ar_step(crops_f, pvec_f)
            scales = scales.reshape(b, l, m)
            means = means.reshape(b, l, m)
            center = crops[:, :, 2, 2, :]  # (B, L, M)
            sym = jnp.clip(jnp.round(center - means),
                           -32768, 32767).astype(jnp.int16)
            quantized = sym.astype(jnp.float32) + means
            idx = build_indexes(scales, scale_table).astype(jnp.uint8)

            target_pad = _scatter_plane(target_pad, c, v, quantized, (2, 2))
            syms = _scatter_plane(syms, c, v, sym)
            idxs = _scatter_plane(idxs, c, v, idx)
            return (target_pad, syms, idxs), None

        (target_pad, syms, idxs), _ = jax.lax.scan(
            step, (target_pad, syms0, idx0), (coords, valid)
        )
        return syms, idxs, target_pad[:, 2:-2, 2:-2, :]

    return jax.jit(encode)


def make_wavefront_decode_step(apply_ar_step, scale_table):
    """Jitted per-wavefront decode helpers.

    params_step(target_pad, priors, coords) -> (means (B,L,M), idx u8)
    write_step(target_pad, coords, valid, sym, means) -> target_pad
    fused_step(target_pad, priors, c_prev, v_prev, sym_prev, means_prev,
               c_next) -> (target_pad, means_next, idx_next) — writes
    wavefront t's decoded pixels and computes wavefront t+1's parameters in
    ONE dispatch, halving the per-round device calls (one dispatch + one
    idx fetch per wavefront instead of two dispatches + one fetch).
    """

    if int(jnp.shape(scale_table)[0]) > 256:
        raise ValueError(
            "wavefront decode ships u8 CDF indexes; scale tables are "
            f"limited to 256 rows (got {int(jnp.shape(scale_table)[0])})"
        )

    def _params(target_pad, priors, coords):
        b = target_pad.shape[0]
        m = target_pad.shape[3]
        crops = _gather_crops(target_pad, coords)
        pvec = priors[:, coords[:, 0], coords[:, 1], :]
        l = coords.shape[0]
        scales, means = apply_ar_step(
            crops.reshape(b * l, 5, 5, m), pvec.reshape(b * l, 1, 1, -1)
        )
        scales = scales.reshape(b, l, m)
        means = means.reshape(b, l, m)
        # scale tables have ≤64 rows — u8 quarters the per-round fetch
        idx = build_indexes(scales, scale_table).astype(jnp.uint8)
        return means, idx

    def params_step(target_pad, priors, coords):
        return _params(target_pad, priors, coords)

    def write_step(target_pad, coords, valid, sym, means):
        quantized = sym.astype(jnp.float32) + means
        return _scatter_plane(target_pad, coords, valid, quantized, (2, 2))

    def fused_step(target_pad, priors, c_prev, v_prev, sym_prev, means_prev,
                   c_next):
        target_pad = write_step(target_pad, c_prev, v_prev, sym_prev,
                                means_prev)
        means, idx = _params(target_pad, priors, c_next)
        return target_pad, means, idx

    return jax.jit(params_step), jax.jit(write_step), jax.jit(fused_step)


def flatten_wavefront(planes, coords, valid):
    """Host-side: (B, H, W, M) planes → (B, N·M) arrays in wavefront order."""
    planes = np.asarray(planes)
    coords = np.asarray(coords)
    valid = np.asarray(valid)
    hh = coords[..., 0][valid]
    ww = coords[..., 1][valid]
    return planes[:, hh, ww, :].reshape(planes.shape[0], -1)


# ---- tiled wavefront (video-codec slices/tiles idea) ------------------------
#
# Tiling the latent into th×tw blocks resets the masked-conv context at tile
# borders, making every tile's wavefront independent: all tiles advance in
# the SAME round, so decode needs 3(th−1)+tw host rounds instead of
# 3(H−1)+W (78 vs 321 at 1080p with 17×30 tiles). Implemented by folding
# tiles into the batch axis and reusing the untiled machinery verbatim.


def tile_plane(x, th: int, tw: int):
    """(B, H, W, M) → (B·nt, th, tw, M), tiles raster-ordered per element."""
    b, h, w, m = x.shape
    x = jnp.reshape(x, (b, h // th, th, w // tw, tw, m))
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return jnp.reshape(x, (b * (h // th) * (w // tw), th, tw, m))


def untile_plane(x, b: int, h: int, w: int):
    """Inverse of tile_plane."""
    _, th, tw, m = x.shape
    x = jnp.reshape(x, (b, h // th, w // tw, th, tw, m))
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return jnp.reshape(x, (b, h, w, m))


def wire_format(fmt: str, coder) -> str:
    """Resolve a model's ``wavefront_format`` ("auto"/"grouped"/"lane")
    against the active coder's capabilities.

    "auto" resolves to "lane": the grouped (v2) order needs a host-side
    stable permutation per frame whose NumPy cost (argsort 20 ms + scatter
    10 ms + bincount 9 ms at 1.57M symbols, tools/wavefront_coder_bench.py)
    is ~4× the ENTIRE v1 coding cost (5.5 ms enc + 6.5 ms dec standalone
    with the reciprocal-encode and dominant-symbol tables), so v2 only pays
    off for coders without those tables. It stays available as an explicit
    opt-in and a tested wire format (.stemv v5 records the order)."""
    if fmt == "auto":
        return "lane"
    if fmt == "grouped" and not getattr(coder, "supports_stream_runs", False):
        raise ValueError(
            "wavefront_format='grouped' needs a coder with stream-run "
            f"support; {getattr(coder, 'name', coder)!r} has none"
        )
    return fmt


def round_sizes(valid, nt: int, m: int) -> np.ndarray:
    """Per-round flat symbol counts for one batch element: round t carries
    nt·n_valid(t)·m symbols in the flattened wavefront order."""
    v = np.asarray(valid)
    return (v.sum(axis=1).astype(np.int64) * nt * m)


def group_round_symbols(sym_flat, idx_flat, sizes, levels: int):
    """Wavefront wire-format v2 host transform (encode side).

    Permutes each round's symbols into grouped-by-CDF-row order (stable, so
    both sides derive the identical permutation from the indexes) and
    returns (sym_grouped (n,), seg_counts (T, levels) int32) for
    ``encode_runs_segmented``. One radix argsort over the whole frame — the
    per-round loop never touches Python."""
    sym_flat = np.asarray(sym_flat).reshape(-1)
    idx_flat = np.asarray(idx_flat, np.int64).reshape(-1)
    sizes = np.asarray(sizes, np.int64)
    t_of = np.repeat(np.arange(sizes.shape[0], dtype=np.int64), sizes)
    key = t_of * levels + idx_flat
    order = np.argsort(key, kind="stable")
    seg_counts = np.bincount(
        key, minlength=sizes.shape[0] * levels
    ).astype(np.int32).reshape(sizes.shape[0], levels)
    return sym_flat[order], seg_counts


def decode_round_grouped(dec, idx_round, tables, lut=None):
    """Wavefront v2 decode of one round: run-decode the segment in
    grouped-by-row order, then scatter back to lane order. `dec` is a
    StreamDecoder over an ``encode_runs_segmented`` stream."""
    idx_round = np.asarray(idx_round, np.int64).reshape(-1)
    levels = tables.cdf.shape[0]
    counts = np.bincount(idx_round, minlength=levels).astype(np.int32)
    decoded = dec.decode_runs(
        counts, tables.cdf, tables.cdf_length, tables.offset, lut=lut
    )
    out = np.empty_like(decoded)
    out[np.argsort(idx_round, kind="stable")] = decoded
    return out


def flatten_wavefront_grouped(planes, coords, valid, b: int):
    """(b·nt, th, tw, M) tile-batch planes → (b, nt·N·M) in ROUND-major
    (wavefront, tile, lane, channel) order — the wire order a per-round
    decoder consumes. Equals flatten_wavefront when nt == 1."""
    planes = np.asarray(planes)
    coords = np.asarray(coords)
    valid = np.asarray(valid)
    chunks = []
    for t in range(coords.shape[0]):
        v = valid[t]
        if not v.any():
            continue
        sel = planes[:, coords[t, v, 0], coords[t, v, 1], :]  # (b·nt, L_t, M)
        chunks.append(sel.reshape(b, -1))
    return np.concatenate(chunks, axis=1)
