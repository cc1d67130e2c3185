"""Pallas TPU kernels for the hot ops.

Two kernels where fusion pays beyond what XLA does automatically:

  * ``gdn``  — fused GDN/IGDN: one VMEM pass computes x², the channel matmul
    on the MXU, the (r)sqrt on the VPU, and the final scale — instead of
    materializing the x² and norm intermediates in HBM. Custom VJP with a
    rematerializing JAX backward.
  * ``quantize_and_index`` — the codec-path fusion: one read of (y, μ, σ)
    produces saturated int32 symbols and uint8 CDF-row indexes (the
    scale-table scan runs as an unrolled VPU compare-accumulate), one write
    each — the arrays the host rANS coder consumes.

Both dispatch to plain-JAX reference implementations off-TPU (tests run the
kernels in interpreter mode for parity).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from ..entropy.base import SYMBOL_MAX

_TILE_ROWS = 256


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_enabled() -> bool:
    return _PALLAS_OK and _on_tpu()


# The (I)GDN normalization dot inside the fused kernels runs on the MXU; in
# f32 it issues at a fraction of the bf16 rate and is ~35% of a stripe's
# FLOPs (stage1 @544x960: 8 fill rows × (Ws,2C)×(2C,2C) ≈ 1.13 GF vs
# 2.12 GF of conv dots).  With this knob the squares and the γ operand are
# bf16 and the MXU still accumulates into f32 (preferred_element_type) —
# the serving path is bf16 end-to-end already, and the extra rounding is one
# 2⁻⁹ relative step on x² (≈0.1% on the normalizer after the sqrt).  f32
# inputs (training, interpret-mode parity pins) keep the exact f32 math:
# the γ operand is passed in f32 and the kernels branch on ITS dtype, so
# the knob can never change a result the f32 tests pin.
#
# Measured NULL result (round 4, artifacts/gdn_dot_ab.json): stage1
# 5.433 ms/frame bf16-dot vs 5.457 f32-dot, outputs identical to 5 dp —
# the stage is input-DMA-bound (see _GDN_CONV_HALO), not norm-dot-bound.
# Default OFF (ADVICE r4): a null speed gain does not justify changing the
# default bf16-serving numerics — with the knob off, bf16-path bitstreams
# stay bit-stable across releases. Flip on for dot-bound shapes.
# Scope note: only the fused GDN→conv / IGDN→deconv kernels route through
# _norm_dot; the STANDALONE gdn_fused kernel intentionally keeps an f32
# norm dot regardless (it serves training and the interpret-mode parity
# pins, where exact f32 math is the contract).
GDN_DOT_BF16 = bool(int(os.environ.get("STEM_GDN_DOT_BF16", "0")))


def _gdn_dot_dtype(win_dtype):
    """dtype for the γ operand of the in-kernel normalization dot."""
    if GDN_DOT_BF16 and win_dtype == jnp.bfloat16:
        return jnp.bfloat16
    return jnp.float32


def _norm_dot(v, g_ref, beta_ref):
    """norm = x² @ γ + β at the γ operand's dtype (f32 result either way)."""
    s = v.astype(g_ref.dtype)
    s = s * s
    return jnp.dot(s, g_ref[:],
                   preferred_element_type=jnp.float32) + beta_ref[:]


# ---------------------------------------------------------------------------
# fused GDN
# ---------------------------------------------------------------------------


def _gdn_ref(x2d, gamma_t, beta, inverse: bool):
    """Reference math on (R, C) rows: norm = x² @ gamma_t + beta."""
    norm = jnp.dot(x2d * x2d, gamma_t, preferred_element_type=jnp.float32)
    norm = norm + beta
    norm = jnp.sqrt(norm) if inverse else jax.lax.rsqrt(norm)
    return x2d * norm


def _gdn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse, fold, c):
    x = x_ref[:].astype(jnp.float32)
    outs = []
    for f in range(fold):
        xs = x[:, f * c:(f + 1) * c]
        norm = jnp.dot(xs * xs, gamma_ref[:],
                       preferred_element_type=jnp.float32)
        norm = norm + beta_ref[:]
        norm = jnp.sqrt(norm) if inverse else jax.lax.rsqrt(norm)
        outs.append(xs * norm)
    out = outs[0] if fold == 1 else jnp.concatenate(outs, axis=1)
    out_ref[:] = out.astype(out_ref.dtype)


def _gdn_pallas(x2d, gamma_t, beta, inverse: bool, interpret: bool = False,
                fold: int = 1):
    # dtype-preserving block I/O: the kernel is pure data movement at these
    # widths (tools/gdn_tune.py — removing the dot or the rsqrt does not
    # change its time), so bf16 activations halve it. Math stays f32 in
    # VMEM. Lane-aligned folding (F pixels per block row so the width is a
    # multiple of 128) measured 11.9 → 7.6 ms bf16 standalone
    # (gdn_tune3/4), but IN-CHAIN the required reshape makes XLA
    # materialize a relayout copy of the conv's (·,192)-layout output and
    # the chain regresses (24.5 → 26.4 ms/frame device-only) — so
    # production stays at fold=1; the folded path is kept (and tested) for
    # callers that already hold lane-aligned buffers.
    r, c = x2d.shape
    assert r % fold == 0, (r, fold)
    rw, cw = r // fold, c * fold
    xw = x2d.reshape(rw, cw)
    tile = _TILE_ROWS if fold == 1 else max(_TILE_ROWS // fold, 128) * 4
    out = pl.pallas_call(
        functools.partial(_gdn_kernel, inverse=inverse, fold=fold, c=c),
        out_shape=jax.ShapeDtypeStruct((rw, cw), x2d.dtype),
        grid=(pl.cdiv(rw, tile),),
        in_specs=[
            pl.BlockSpec((tile, cw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xw, gamma_t.astype(jnp.float32), beta[None, :].astype(jnp.float32))
    return out.reshape(r, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gdn_fused(x, gamma_t, beta, inverse: bool = False,
              interpret: bool = False):
    """Fused GDN over NHWC x. gamma_t is (in, out) = torch gamma transposed;
    beta is (C,). Output has x's shape and dtype (f32 math internally)."""
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    if pallas_enabled() or interpret:
        out = _gdn_pallas(x2d, gamma_t, beta, inverse, interpret)
    else:
        out = _gdn_ref(x2d.astype(jnp.float32), gamma_t, beta,
                       inverse).astype(x.dtype)
    return out.reshape(shape)


def _gdn_fwd(x, gamma_t, beta, inverse, interpret):
    return gdn_fused(x, gamma_t, beta, inverse, interpret), (x, gamma_t, beta)


def _gdn_bwd(inverse, interpret, res, g):
    x, gamma_t, beta = res
    shape = x.shape

    def ref(x_, gt_, b_):
        return _gdn_ref(
            x_.reshape(-1, shape[-1]).astype(jnp.float32), gt_, b_, inverse
        ).reshape(shape)

    _, vjp = jax.vjp(ref, x, gamma_t, beta)
    return vjp(g.astype(jnp.float32))


gdn_fused.defvjp(_gdn_fwd, _gdn_bwd)


# ---------------------------------------------------------------------------
# fused quantize + scale-table index
# ---------------------------------------------------------------------------


def _qidx_ref(y, means, scales, table, scale_bound):
    sym = jnp.clip(
        jnp.round(y - means), -float(SYMBOL_MAX), float(SYMBOL_MAX)
    ).astype(jnp.int32)
    s = jnp.maximum(scales, scale_bound)
    idx = jnp.searchsorted(table[:-1], s, side="left").astype(jnp.uint8)
    return sym, idx


def _qidx_kernel(y_ref, means_ref, scales_ref, sym_ref, idx_ref, *, table,
                 scale_bound):
    y = y_ref[:]
    sym = jnp.clip(
        jnp.round(y - means_ref[:]), -float(SYMBOL_MAX), float(SYMBOL_MAX)
    )
    sym_ref[:] = sym.astype(jnp.int32)
    s = jnp.maximum(scales_ref[:], scale_bound)
    # unrolled compare-accumulate over the (static, 63-entry) scale table:
    # idx = #{ table[j] < s }, the searchsorted-left equivalent
    idx = jnp.zeros(s.shape, jnp.int32)
    for t in table[:-1]:
        idx = idx + (s > t).astype(jnp.int32)
    idx_ref[:] = idx.astype(jnp.uint8)


def quantize_and_index(y, means, scales, table, scale_bound: float = 0.11,
                       interpret: bool = False):
    """(y, μ, σ) NHWC → (int32 symbols, uint8 CDF-row indexes)."""
    table = np.asarray(table, np.float32)
    if not (pallas_enabled() or interpret):
        return _qidx_ref(y, means, scales, jnp.asarray(table), scale_bound)

    shape = y.shape
    c = shape[-1]
    y2 = y.reshape(-1, c).astype(jnp.float32)
    m2 = means.reshape(-1, c).astype(jnp.float32)
    s2 = scales.reshape(-1, c).astype(jnp.float32)
    r = y2.shape[0]
    grid = (pl.cdiv(r, _TILE_ROWS),)
    spec = pl.BlockSpec((_TILE_ROWS, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sym, idx = pl.pallas_call(
        functools.partial(
            _qidx_kernel, table=tuple(float(t) for t in table),
            scale_bound=float(scale_bound),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, c), jnp.int32),
            jax.ShapeDtypeStruct((r, c), jnp.uint8),
        ),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(y2, m2, s2)
    return sym.reshape(shape), idx.reshape(shape)


# ---------------------------------------------------------------------------
# fused IGDN + narrow sub-pixel deconv (the g_s tail: IGDN @ s·H/2 → RGB)
# ---------------------------------------------------------------------------
#
# The last two g_s layers (compressai/models/priors.py:158-161 —
# GDN(inverse=True) then ConvTranspose2d(N→3, k5 s2)) are both
# bandwidth-bound and XLA runs them as separate HBM round-trips
# (artifacts/layer_probe.json: 18.4 + 19.9 ms of the 130 ms f32 b=4 1080p
# chain). This kernel reads x once, applies IGDN in VMEM, runs the
# sub-pixel decomposition of the deconv (layers/conv.py::_subpixel_kernel —
# a k3 s1 conv with F·s² output channels) as 9 static-slice MXU dots with
# column-edge masks, adds bias, and pixel-shuffles into flat output rows of
# s·W·F lanes — one read of x, one write of the RGB frame. Row halos ride a
# small side input (2 rows per stripe) so stripes never overlap-fetch.

FUSE_IGDN_DECONV = True  # A/B knob (tools/fused_tail_tune.py)
_IGDN_DECONV_TH = 0      # 0 = auto (VMEM model); probes force a stripe height


def _igdn_deconv_ref(x, gamma_t, beta, kernel, bias, s: int):
    """XLA composition: IGDN then the definitional lhs-dilated deconv."""
    c = x.shape[-1]
    y = _gdn_ref(
        x.reshape(-1, c).astype(jnp.float32), gamma_t, beta, inverse=True
    ).reshape(x.shape)
    k = kernel.shape[0]
    p = k // 2
    pad_lo = k - 1 - p
    pad_hi = k - 1 - p + s - 1
    out = jax.lax.conv_general_dilated(
        y,
        kernel.astype(y.dtype),
        window_strides=(1, 1),
        padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
        lhs_dilation=(s, s),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


def _igdn_deconv_kernel(x_ref, xb_ref, gamma_ref, beta_ref, sub_ref,
                        bias_ref, out_ref, win_ref, *, th, w, c, f, s, rk):
    def igdn(v):
        n = _norm_dot(v, gamma_ref, beta_ref)
        return v.astype(jnp.float32) * jnp.sqrt(n)

    wd = win_ref.dtype
    zero = jnp.zeros((1, c), wd)
    win_ref[0:1] = zero
    # IGDN in image-row chunks: a whole-stripe igdn would materialize
    # (th·W, C) float32 temporaries and blow the 16 MB scoped-VMEM limit
    win_ref[1:w + 1] = igdn(xb_ref[0:w, :]).astype(wd)          # prev row
    for t in range(th):
        win_ref[w + 1 + t * w:w + 1 + (t + 1) * w] = igdn(
            x_ref[t * w:(t + 1) * w]).astype(wd)                # stripe
    win_ref[w + 1 + th * w:2 * w + 1 + th * w] = igdn(
        xb_ref[w:2 * w, :]).astype(wd)                          # next row
    win_ref[2 * w + 1 + th * w:] = zero

    # output pixel (t, wc) ← window rows (t+dy)·w + wc + dx − 1, plus the
    # +1 leading-zero-row offset ⇒ slab start (t+dy)·w + dx; taps at the
    # image's W edges are zero (conv zero padding) ⇒ mask wc==0 (dx=0) /
    # wc==W−1. The mask multiplies the (·, F·s²) dot OUTPUT, not the (·, C)
    # slab — the dot is row-wise so the two are equivalent, and the narrow
    # form keeps the VMEM temp 16× smaller. The tap loop runs one image row
    # per iteration so the nine live slab temporaries are (W, C), not
    # (th·W, C) — the whole-stripe form blew the 16 MB scoped-VMEM limit.
    wc = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    m_lo = (wc != 0).astype(jnp.float32)
    m_hi = (wc != w - 1).astype(jnp.float32)
    for t in range(th):
        acc = jnp.zeros((w, f * s * s), jnp.float32)
        for dy in range(rk):
            for dx in range(rk):
                slab = win_ref[(t + dy) * w + dx:(t + dy) * w + dx + w]
                tap = dy * rk + dx
                d = jnp.dot(slab, sub_ref[tap * c:(tap + 1) * c],
                            preferred_element_type=jnp.float32)
                if dx == 0:
                    d = d * m_lo
                elif dx == rk - 1:
                    d = d * m_hi
                acc = acc + d
        out12 = acc + bias_ref[:]
        # Mosaic supports 2-D transposes but not sublane↔lane reshapes, so
        # the kernel emits the compact pre-shuffle tensor channel-major
        # (F·s², N) and the (tiny, ~100 MB) pixel shuffle runs as one fused
        # XLA epilogue
        out_ref[:, t * w:(t + 1) * w] = out12.T.astype(out_ref.dtype)


def igdn_deconv_applicable(x, features: int, kernel_size: int,
                           stride: int) -> bool:
    if not (FUSE_IGDN_DECONV and pallas_enabled()):
        return False
    if x.ndim != 4 or stride != 2 or kernel_size % 2 == 0:
        return False
    if x.dtype != jnp.bfloat16:
        # measured A/B at the bench tail shape (artifacts/fused_tail_ab.json):
        # bf16 24.6 vs 30.6 ms unfused (win), f32 55.0 vs 37.9 ms (loss — the
        # f32 VMEM budget forces th=2 stripes whose halo re-reads and
        # per-stripe transposes dominate). Serving runs bf16; training (f32)
        # keeps the unfused path.
        return False
    if -(-kernel_size // stride) != 3:  # halo design covers R == 3
        return False
    if features * stride * stride > 128:
        return False
    b, h, w, c = x.shape
    if h % 2 or (b * h * w) % 8:
        return False
    th = _igdn_deconv_th(x)
    return th is not None


def _igdn_deconv_th(x):
    """Largest stripe height whose VMEM working set fits the 16 MB scoped
    limit: 2 pipelined x blocks + 2 halo blocks + the IGDN'd window
    scratch + per-chunk igdn f32 temps + dot/acc temps + slack."""
    b, h, w, c = x.shape
    isz = jnp.dtype(x.dtype).itemsize
    for th in (16, 8, 4, 2):
        if h % th:
            continue
        # coefficients fitted to Mosaic's actual scoped-VMEM accounting at
        # the 1080p shape (tools/fused_tail compile probes: bf16 fits at
        # th=4, f32 at th=2; one step larger OOMs in both dtypes)
        vmem = (3 * th * w * c * isz            # x blocks (pipelined)
                + 2 * 2 * w * c * isz           # halo blocks
                + ((th + 2) * w + 2) * c * 2    # window scratch (bf16)
                + 9 * w * c * 2                 # live tap slabs (one row)
                + 3 * w * c * 4)                # igdn chunk f32 temps
        if vmem <= 16 * 1024 * 1024:
            return th
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def igdn_deconv_fused(x, gamma_t, beta, kernel, bias, stride: int = 2,
                      interpret: bool = False):
    """IGDN (gamma_t = (in, out), beta (C,)) fused with a narrow deconv
    (kernel (k, k, C, F) = flipped torch ConvTranspose2d weight, bias (F,)).
    Returns (B, s·H, s·W, F) in x's dtype."""
    s = stride
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    if not (interpret or igdn_deconv_applicable(x, f, kernel.shape[0], s)):
        return _igdn_deconv_ref(x, gamma_t, beta, kernel, bias, s)

    from ..layers.conv import _subpixel_kernel  # lazy: avoid import cycle

    sub, rk, pl_, ph = _subpixel_kernel(kernel, kernel.shape[0], s)
    assert (pl_, ph) == (1, 1), (pl_, ph)
    sub2 = sub.reshape(rk * rk * c, f * s * s)
    th = _IGDN_DECONV_TH or _igdn_deconv_th(x) or (1 if interpret else None)
    stripes = h // th
    # the IGDN'd window is stored bf16 on hardware (halves the largest
    # scratch; conv inputs round to bf16 exactly as XLA's default-precision
    # f32 convs do); interpret mode keeps x's dtype so the parity tests pin
    # the exact math
    win_dtype = x.dtype if interpret else jnp.bfloat16

    # halo side input: the image rows just above/below every stripe (zeros
    # at the frame edge) — 2/th extra reads instead of overlapped blocks
    x4 = x.reshape(b, h, w, c)
    si = jnp.arange(stripes)
    prev = jnp.where((si * th - 1 < 0)[None, :, None, None, None],
                     jnp.zeros((), x.dtype),
                     x4[:, jnp.maximum(si * th - 1, 0)][:, :, None])
    nxt = jnp.where((si * th + th >= h)[None, :, None, None, None],
                    jnp.zeros((), x.dtype),
                    x4[:, jnp.minimum(si * th + th, h - 1)][:, :, None])
    xb = jnp.concatenate([prev, nxt], axis=2)  # (b, stripes, 2, w, c)
    xb2 = xb.reshape(b * stripes * 2 * w, c)

    bias12 = jnp.repeat(
        jnp.zeros((f,), jnp.float32) if bias is None
        else bias.astype(jnp.float32), s * s)[None, :]

    x2 = x.reshape(b * h * w, c)
    out = pl.pallas_call(
        functools.partial(_igdn_deconv_kernel, th=th, w=w, c=c, f=f, s=s,
                          rk=rk),
        out_shape=jax.ShapeDtypeStruct((f * s * s, b * h * w), x.dtype),
        grid=(b * stripes,),
        in_specs=[
            pl.BlockSpec((th * w, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * w, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rk * rk * c, f * s * s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f * s * s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f * s * s, th * w), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(((th + 2) * w + 2, c), win_dtype),
        ],
        interpret=interpret,
    )(x2, xb2, gamma_t.astype(_gdn_dot_dtype(win_dtype)),
      beta[None, :].astype(jnp.float32), sub2.astype(win_dtype), bias12)

    from ..layers.conv import pixel_shuffle

    out12 = out.T.reshape(b, h, w, f * s * s)
    return pixel_shuffle(out12, s)


def _igdn_deconv_fwd(x, gamma_t, beta, kernel, bias, stride, interpret):
    out = igdn_deconv_fused(x, gamma_t, beta, kernel, bias, stride,
                            interpret)
    return out, (x, gamma_t, beta, kernel, bias)


def _igdn_deconv_bwd(stride, interpret, res, g):
    x, gamma_t, beta, kernel, bias = res
    has_bias = bias is not None

    def ref(x_, gt_, b_, k_, bs_):
        return _igdn_deconv_ref(x_, gt_, b_, k_,
                                bs_ if has_bias else None, stride)

    _, vjp = jax.vjp(ref, x, gamma_t, beta, kernel,
                     bias if has_bias else jnp.zeros((kernel.shape[-1],),
                                                     jnp.float32))
    gx, ggt, gb, gk, gbs = vjp(g.astype(x.dtype))
    return gx, ggt, gb, gk, (gbs if has_bias else None)


igdn_deconv_fused.defvjp(_igdn_deconv_fwd, _igdn_deconv_bwd)

# ---------------------------------------------------------------------------
# fused GDN → k5 s2 conv (encoder stages)
# ---------------------------------------------------------------------------
#
# The g_a trunk alternates GDN and k5s2 convs (reference
# compressai/models/priors.py:330-340 geometry); XLA runs the GDN as an HBM
# round-trip and lowers the strided conv at ~47 TF/s bf16 — 30% of the
# measured MXU rate (artifacts/conv_s2d.json: direct/s2d/tap-matmul all
# plateau there). This kernel fuses each GDN into its *consumer* conv (the
# decoder mirror, igdn_deconv_fused, fuses IGDN into the deconv the same
# way) and restructures the stride-2 taps for the MXU:
#
#   The free reshape (B,H,W,C) → (B·H·W/2, 2C) pairs adjacent columns
#   (column tap v = 2m + phase), and the window-fill pass additionally
#   pairs image ROWS on the lane axis (row pair r₂ at lanes [a·2C, (a+1)·2C)
#   for row phase a) — a space-to-depth layout built for free while the
#   pre-GDN streams through VMEM anyway. A stride-2 5×5 tap then becomes a
#   CONTIGUOUS whole-stripe shift (du, m) ∈ {-1,0,1}²: NINE
#   (TH·Ws, 4C)×(4C, O) dots per stripe (du=+1 uses only row-phase 0 →
#   K = 2C), instead of per-output-row dots whose MXU issue overhead
#   dominates (v1 of this kernel measured 9.0 ms/frame — no better than
#   XLA). Taps that read across row boundaries in the flat window are
#   zeroed by masking the dot OUTPUT at j = 0 / j = Ws−1 (the row-wise dot
#   makes the two equivalent), exactly like the deconv kernel's masks.
#
# The GDN of the pre-layer is applied while filling the window scratch
# (one VMEM pass, f32 math, bf16 storage), with a block-diagonal
# kron(I₂, γᵀ) so the per-pixel channel matmul works on the paired layout.

FUSE_GDN_CONV = True  # A/B knob (tools/gdn_conv_tune.py)
_GDN_CONV_TH = 0      # 0 = auto (VMEM model); probes force a stripe height
# Input-path variant: True = three standard block-indexed operands (main
# rows + 2-row halos above/below into one padded array) so Mosaic can
# double-buffer the DMAs against the dots; False = the round-3 single
# overlapping Element-indexed window. Motivated by the fill probe
# (artifacts/gdn_fill_probe.json: ~2.7 of stage1's 5.4 ms/frame is
# un-overlapped input traffic), but the TPU A/B is a NULL-to-slight-LOSS
# (artifacts/gdn_halo_ab.json, round 4): stage1 5.596 ms/frame halo vs
# 5.449 Element-window, stage2 1.524 vs 1.520, identical rel_err — the
# Element window already pipelines; the residual cost is per-grid-step
# overhead, not serialized DMA. Default = the measured winner.
_GDN_CONV_HALO = False  # A/B knob (tools/gdn_halo_ab.py)
# Manual-DMA input path (round 5, the lever BENCH_NOTES:308-311 called for):
# x stays in HBM (memory_space=ANY) and the kernel copies the stripe's
# window in as explicit chunked make_async_copy's into a manually
# double-buffered landing scratch.  That removes the input window from
# Mosaic's 2x double-buffered block accounting — the term that capped
# stage1 at TH=2 (136 grid steps/frame at 544x960, ~20 us/step overhead)
# — so TH=4 fits stage1's VMEM budget and TH=8 fits stage2's, halving /
# quartering the per-grid-step overhead.  "auto" (default) uses the DMA
# path exactly when its VMEM model admits a strictly larger TH than the
# Element-window model (i.e. where grid steps actually shrink); "1"/"0"
# force it on/off for A/Bs (tools/gdn_dma_ab.py).
_GDN_CONV_DMA = os.environ.get("STEM_GDN_CONV_DMA", "auto")
# timing-isolation knob for tools/gdn_conv_tune.py --debug: "nofill" skips
# the window fill, "onedot" runs a single tap block, "nogdn" copies raw
# rows. Wrong results by construction — never set in production.
_GDN_CONV_DEBUG = ""


def _gdn_conv_ref(x, gamma_t, beta, kernel, bias):
    """XLA composition: GDN then the direct k5 s2 conv (+ bias)."""
    c = x.shape[-1]
    y = _gdn_ref(
        x.reshape(-1, c).astype(jnp.float32), gamma_t, beta, inverse=False
    ).reshape(x.shape).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        y, kernel.astype(y.dtype), (2, 2), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


# the nine whole-stripe taps: (row-pair shift du, column shift m, K width
# factor) — du=+1 only touches row-phase 0 (image row tap u=4), so its K
# halves to 2C
_PAIR_BLOCKS = [(-1, -1, 2), (-1, 0, 2), (-1, 1, 2),
                (0, -1, 2), (0, 0, 2), (0, 1, 2),
                (1, -1, 1), (1, 0, 1), (1, 1, 1)]


def _pair_conv_kernel(x_ref, g2_ref, beta2_ref, w_ref, bias_ref,
                      out_ref, win_ref, *, th, ws, c2, o, has_gdn,
                      stripes):
    """One stripe: window fill (pre-GDN in f32, stored in win dtype, image
    rows paired on lanes) then NINE whole-stripe masked dots. Window
    layout: 1 zero row, then TH+2 row-pairs × Ws paired columns × 4C
    lanes, then 1 zero row. The x block arrives as ONE overlapping
    Element-indexed window of 2·TH+4 image rows — halos and frame-edge
    zero rows come from the block's declared padding, so there is no
    separate halo operand and no gather."""

    debug = _GDN_CONV_DEBUG

    def pre(v):
        if not has_gdn or "nogdn" in debug:
            return v.astype(win_ref.dtype)
        n = _norm_dot(v, g2_ref, beta2_ref)
        return (v.astype(jnp.float32)
                * jax.lax.rsqrt(n)).astype(win_ref.dtype)

    c4 = 2 * c2
    zero = jnp.zeros((1, c4), win_ref.dtype)
    win_ref[0:1] = zero
    win_ref[1 + (th + 2) * ws:] = zero
    if "nofill" not in debug:
        # x_ref row r·ws.. holds image row 2·(t0−1) + r: window pair
        # p = r//2 at lane block (r%2)·2C. Element-padding regions hold
        # UNDEFINED bytes — zero the frame-edge halo rows before the GDN
        # (where, not multiply: garbage may be NaN/inf)
        si = pl.program_id(0) % stripes
        for r in range(2 * th + 4):
            v = x_ref[r * ws:(r + 1) * ws]
            if r < 2:
                v = jnp.where(si == 0, jnp.zeros((), v.dtype), v)
            elif r >= 2 * th + 2:
                v = jnp.where(si == stripes - 1, jnp.zeros((), v.dtype), v)
            win_ref[1 + (r // 2) * ws:1 + (r // 2 + 1) * ws,
                    (r % 2) * c2:(r % 2 + 1) * c2] = pre(v)

    _pair_conv_dots(win_ref, w_ref, bias_ref, out_ref, th, ws, c2, o, debug)


def _pair_conv_dots(win_ref, w_ref, bias_ref, out_ref, th, ws, c2, o, debug,
                    ns: int = 1):
    """The nine whole-stripe masked tap dots over the filled window —
    shared by every input-path variant. ``ns`` splits the output rows into
    sub-stripes computed sequentially: the slab / dot-result / accumulator
    temporaries scale with TH/ns instead of TH, which is what lets the
    manual-DMA path run TH=4+ inside the 16 MB scoped-VMEM limit (each
    sub-stripe still feeds TH/ns·Ws ≥ 960-row operands to the MXU)."""
    nr = th // ns
    jc = jax.lax.broadcasted_iota(jnp.int32, (nr * ws, 1), 0) % ws
    m_lo = (jc != 0).astype(jnp.float32)
    m_hi = (jc != ws - 1).astype(jnp.float32)
    blocks = _PAIR_BLOCKS[4:5] if "onedot" in debug else _PAIR_BLOCKS
    if "nodots" in debug:  # timing isolation: out = bias only
        for p in range(ns):
            out_ref[p * nr * ws:(p + 1) * nr * ws] = (
                jnp.zeros((nr * ws, o), jnp.float32) + bias_ref[:]
            ).astype(out_ref.dtype)
        return
    for p in range(ns):
        acc = jnp.zeros((nr * ws, o), jnp.float32) + bias_ref[:]
        koff = 0
        for du, m, kf in blocks:
            kw = kf * c2
            base = 1 + (du + 1) * ws + m + p * nr * ws
            if debug == "aligndots":
                # timing isolation: all nine slab bases forced onto the
                # sublane tiling (wrong results) — measures what the six
                # misaligned slab reads (base ≡ 0,1,2 mod 16) cost
                base = (du + 1) * ws + p * nr * ws
            slab = win_ref[base:base + nr * ws, 0:kw]
            d = jnp.dot(slab, w_ref[koff:koff + kw],
                        preferred_element_type=jnp.float32)
            koff += kw
            if m == -1:
                d = d * m_lo
            elif m == 1:
                d = d * m_hi
            acc = acc + d
        out_ref[p * nr * ws:(p + 1) * nr * ws] = acc.astype(out_ref.dtype)


def _pair_conv_halo_kernel(xm_ref, xa_ref, xb_ref, g2_ref, beta2_ref, w_ref,
                           bias_ref, out_ref, win_ref, *, th, ws, c2, o,
                           has_gdn):
    """Halo variant of _pair_conv_kernel: the stripe's own 2·TH image rows
    arrive as a standard block (xm), the 2 rows above / below as two more
    standard block-indexed operands into the SAME zero-padded array — so
    Mosaic double-buffers every DMA against the dots. (The Element-indexed
    window of the non-halo variant measures as SERIALIZED DMA: ~2.7 of
    stage1's 5.4 ms/frame is un-overlapped input traffic —
    artifacts/gdn_fill_probe.json.) Frame-edge halo rows are the pad's
    real zeros, so the si==0 / si==stripes−1 masking disappears too
    (GDN(0) = 0 and zero rows contribute nothing to the taps)."""

    debug = _GDN_CONV_DEBUG

    def pre(v):
        if not has_gdn or "nogdn" in debug:
            return v.astype(win_ref.dtype)
        n = _norm_dot(v, g2_ref, beta2_ref)
        return (v.astype(jnp.float32)
                * jax.lax.rsqrt(n)).astype(win_ref.dtype)

    c4 = 2 * c2
    zero = jnp.zeros((1, c4), win_ref.dtype)
    win_ref[0:1] = zero
    win_ref[1 + (th + 2) * ws:] = zero
    if "nofill" not in debug:
        for r in range(2 * th + 4):
            if r < 2:
                v = xa_ref[r * ws:(r + 1) * ws]
            elif r >= 2 * th + 2:
                v = xb_ref[(r - 2 * th - 2) * ws:(r - 2 * th - 1) * ws]
            else:
                v = xm_ref[(r - 2) * ws:(r - 1) * ws]
            win_ref[1 + (r // 2) * ws:1 + (r // 2 + 1) * ws,
                    (r % 2) * c2:(r % 2 + 1) * c2] = pre(v)

    _pair_conv_dots(win_ref, w_ref, bias_ref, out_ref, th, ws, c2, o, debug)


def _pair_conv_dma_kernel(x_hbm, g2_ref, beta2_ref, w_ref, bias_ref,
                          out_ref, land0, land1, win_ref, sems, *, th, ws,
                          c2, o, has_gdn, stripes, n_steps):
    """ROLLING-window variant of _pair_conv_kernel (round 5): x lives in
    HBM (ANY) and each stripe fetches only its 2·TH NEW image rows — the
    2-pair halo overlap with the previous stripe is reused by shifting the
    already-GDN'd tail of the persistent window scratch down (VMEM copy,
    disjoint for TH>=2). That halves the input traffic the Element window
    pays (its overlapping windows re-read (2TH+4)/2TH of the frame: the
    ~2.65 ms/frame residual in artifacts/gdn_fill_probe.json), and the
    fetch for stripe i+1 is issued BEFORE stripe i's tap dots, so the DMA
    runs under the MXU work instead of serializing ahead of it. Boot
    stripes (si == 0) take the prefetched head (2·TH rows) plus a
    synchronous 4-row tail fetch through the other landing slot. The
    frame-edge halo rows are the caller's real zero padding, so no
    stripe-index masking is needed (GDN(0) = 0 feeds nothing into the
    taps)."""

    debug = _GDN_CONV_DEBUG

    def pre(v):
        if not has_gdn or "nogdn" in debug:
            return v.astype(win_ref.dtype)
        n = _norm_dot(v, g2_ref, beta2_ref)
        return (v.astype(jnp.float32)
                * jax.lax.rsqrt(n)).astype(win_ref.dtype)

    i = pl.program_id(0)
    si = i % stripes
    rows = 2 * th * ws          # full steady fetch (array rows)
    rows_edge = rows - 2 * ws   # boot head / last stripe (one pair less)
    boot = si == 0
    last = si == stripes - 1

    def fetch(idx, land, sem, do_start: bool):
        """Start or wait step idx's head fetch. x is UNPADDED (the
        Element path's explicit jnp.pad materializes a whole-frame HBM
        copy ahead of the kernel — the ~2.6 ms/frame every input-path
        variant shared); the frame-edge halo pairs are zeroed in-window
        instead. Boot: pairs 0..TH−2; last: pairs si·TH+1..hs−1; else
        pairs si·TH+1..si·TH+TH. The ×ws stays OUTSIDE the arithmetic
        select so Mosaic can prove tiling divisibility."""
        bi_, si_ = idx // stripes, idx % stripes
        is_boot = si_ == 0
        is_last = si_ == stripes - 1
        start_mid = (2 * si_ * th + 2) * ws

        @pl.when(is_boot)
        def _():
            c = pltpu.make_async_copy(
                x_hbm.at[bi_, pl.ds(0, rows_edge), :],
                land.at[pl.ds(0, rows_edge)], sem)
            c.start() if do_start else c.wait()

        @pl.when(jnp.logical_and(jnp.logical_not(is_boot),
                                 jnp.logical_not(is_last)))
        def _():
            c = pltpu.make_async_copy(
                x_hbm.at[bi_, pl.ds(start_mid, rows), :], land, sem)
            c.start() if do_start else c.wait()

        @pl.when(jnp.logical_and(jnp.logical_not(is_boot), is_last))
        def _():
            c = pltpu.make_async_copy(
                x_hbm.at[bi_, pl.ds(start_mid, rows_edge), :],
                land.at[pl.ds(0, rows_edge)], sem)
            c.start() if do_start else c.wait()

    def fill(land, j, slot_pair):
        """GDN-process landed image-row j into window pair slot_pair."""
        v = land[j * ws:(j + 1) * ws, :]
        win_ref[1 + slot_pair * ws:1 + (slot_pair + 1) * ws,
                (j % 2) * c2:(j % 2 + 1) * c2] = pre(v)

    def zero_pair(slot_pair):
        win_ref[1 + slot_pair * ws:1 + (slot_pair + 1) * ws] = jnp.zeros(
            (ws, 2 * c2), win_ref.dtype)

    c4 = 2 * c2
    zero = jnp.zeros((1, c4), win_ref.dtype)
    win_ref[0:1] = zero
    win_ref[1 + (th + 2) * ws:] = zero

    # the very first grid step has no predecessor to prefetch for it
    @pl.when(i == 0)
    def _boot_fetch():
        fetch(0, land0, sems.at[0], do_start=True)

    def consume(land, sem_i, other, sem_o):
        """Wait on this step's prefetched rows and fill the window."""
        fetch(i, land, sems.at[sem_i], do_start=False)

        @pl.when(boot)
        def _head_and_tail():
            zero_pair(0)                      # pair −1 = top frame edge
            if "nofill" not in debug:
                for j in range(2 * th - 2):   # pairs 0..TH−2
                    fill(land, j, 1 + j // 2)
            # tail pairs TH−1, TH (4 image rows) via the OTHER slot —
            # waited before that slot is reused for the i+1 prefetch
            bi_ = i // stripes
            tail = pltpu.make_async_copy(
                x_hbm.at[bi_, pl.ds(rows_edge, 4 * ws), :],
                other.at[pl.ds(0, 4 * ws)], sems.at[sem_o])
            tail.start()
            tail.wait()
            if "nofill" not in debug:
                for j in range(4):
                    fill(other, j, th + j // 2)

        @pl.when(jnp.logical_not(boot))
        def _shift_and_fill():
            # halo pairs slide down: slots TH, TH+1 → 0, 1 (disjoint
            # VMEM copy for TH>=2; already GDN-processed last step)
            win_ref[1:1 + 2 * ws] = win_ref[1 + th * ws:1 + (th + 2) * ws]

            @pl.when(jnp.logical_not(last))
            def _():
                if "nofill" not in debug:
                    for j in range(2 * th):   # pairs si·TH+1..si·TH+TH
                        fill(land, j, 2 + j // 2)

            @pl.when(last)
            def _():
                if "nofill" not in debug:
                    for j in range(2 * th - 2):  # pairs si·TH+1..hs−1
                        fill(land, j, 2 + j // 2)
                zero_pair(th + 1)             # pair hs = bottom edge

    @pl.when(i % 2 == 0)
    def _even():
        consume(land0, 0, land1, 1)

    @pl.when(i % 2 == 1)
    def _odd():
        consume(land1, 1, land0, 0)

    # prefetch stripe i+1's rows into the other slot, then overlap the
    # DMA with this stripe's nine tap dots
    @pl.when(jnp.logical_and(i + 1 < n_steps, (i + 1) % 2 == 0))
    def _pf_even():
        fetch(i + 1, land0, sems.at[0], do_start=True)

    @pl.when(jnp.logical_and(i + 1 < n_steps, (i + 1) % 2 == 1))
    def _pf_odd():
        fetch(i + 1, land1, sems.at[1], do_start=True)

    _pair_conv_dots(win_ref, w_ref, bias_ref, out_ref, th, ws, c2, o, debug,
                    ns=_dma_dot_splits(th))


def _gdn_conv_dma_th(x, o: int):
    """Largest stripe height (>=2: the rolling shift needs disjoint
    src/dst) fitting VMEM for the rolling-window kernel. Terms mirror
    Mosaic's scoped accounting, calibrated on the stage-1 shape: th=4
    with un-split dots modeled ~17.5M and compiled to a measured 20.88M
    refusal; the ns=2 sub-stripe dots + 2·TH-row landing slots fit."""
    b, h, w, c = x.shape
    hs, ws, c2 = h // 2, w // 2, 2 * c
    isz = jnp.dtype(x.dtype).itemsize
    for th in (16, 8, 4, 2):
        if hs % th or hs // th < 2:
            continue
        nr = th // _dma_dot_splits(th)
        vmem = (((th + 2) * ws + 2) * 2 * c2 * 2   # s2d window (bf16)
                + 2 * (2 * th * ws) * c2 * isz     # landing slots x2
                + 2 * ws * c2 * 4                  # pre-GDN f32 temps
                + 15 * c2 * o * 2                  # packed weights
                + c2 * c2 * 4                      # γ² block (f32)
                + nr * ws * 2 * c2 * 2             # tap slab (bf16)
                + 2 * nr * ws * o * 4              # dot result + acc (f32)
                + 2 * th * ws * o * 2)             # out blocks (pipelined)
        if vmem <= 15_900_000:
            return th
    return None


def _dma_dot_splits(th: int) -> int:
    """Sub-stripe count for the tap dots in the DMA kernel: TH>=4 halves
    the dot temporaries (see _gdn_conv_dma_th's calibration note)."""
    return 2 if th >= 4 and th % 2 == 0 else 1


def _gdn_conv_use_dma(x, o: int):
    """Resolve the _GDN_CONV_DMA knob → TH for the rolling-DMA path, or
    None. "auto" uses it whenever it fits VMEM: it moves half the input
    bytes of the Element window and overlaps the fetch with the tap dots
    (A/B: artifacts/gdn_dma_ab.json)."""
    mode = _GDN_CONV_DMA
    if mode == "0":
        return None
    return _gdn_conv_dma_th(x, o)


def _gdn_conv_th(x):
    """Largest stripe height whose VMEM working set fits the 16 MB scoped
    limit (same fitting approach as _igdn_deconv_th)."""
    b, h, w, c = x.shape
    hs, ws, c2 = h // 2, w // 2, 2 * c
    isz = jnp.dtype(x.dtype).itemsize
    for th in (16, 8, 4, 2, 1):
        if hs % th:
            continue
        vmem = (2 * (2 * th + 4) * ws * c2 * isz  # x windows (pipelined)
                + ((th + 2) * ws + 2) * 2 * c2 * 2  # s2d window (bf16)
                + 2 * ws * c2 * 4               # pre-GDN f32 temps
                + 15 * c2 * 192 * 2             # packed weights (≈, O≈192)
                + c2 * c2 * 4                   # γ² block (f32)
                + th * ws * 192 * 4             # f32 accumulator
                + 2 * th * ws * 192 * 2)        # out blocks (pipelined)
        # calibrated against Mosaic's scoped accounting: 15.4M modeled at
        # th=2/ws=480 compiles, th=4 (19.9M modeled) OOMs the 16M limit
        if vmem <= 15_900_000:
            return th
    return None


def gdn_conv_applicable(x, in_ch: int, kernel_size: int, stride: int) -> bool:
    if not (FUSE_GDN_CONV and pallas_enabled()):
        return False
    if x.ndim != 4 or stride != 2 or kernel_size != 5:
        return False
    if x.dtype != jnp.bfloat16:
        # serving runs bf16; training (f32) keeps the unfused path — same
        # gating (and reasoning) as igdn_deconv_applicable
        return False
    b, h, w, c = x.shape
    if c != in_ch or c % 64 or c < 128:
        return False
    if h % 2 or w % 2 or (w // 2) % 8:
        return False
    return (_gdn_conv_th(x) is not None
            or _gdn_conv_use_dma(x, in_ch) is not None)


def _pack_pair_kernel(kernel):
    """(5, 5, C, O) stride-2 kernel → (30C, O): the nine _PAIR_BLOCKS
    stacked on K. Block (du, m) holds lane (a·2 + b)·C + c ← w[u, v] with
    u = 2du + a + 2, v = 2m + b + 2 (zero where the 5×5 grid has no tap);
    du=+1 blocks carry only row-phase a=0 (K = 2C)."""
    k, _, c, o = kernel.shape
    parts = []
    for du, m, kf in _PAIR_BLOCKS:
        blk = jnp.zeros((kf * 2, c, o), kernel.dtype)
        for a in range(kf):
            for b2 in range(2):
                u, v = 2 * du + a + 2, 2 * m + b2 + 2
                if 0 <= u < k and 0 <= v < k:
                    blk = blk.at[a * 2 + b2].set(kernel[u, v])
        parts.append(blk.reshape(kf * 2 * c, o))
    return jnp.concatenate(parts, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gdn_conv_fused(x, gamma_t, beta, kernel, bias, interpret: bool = False):
    """GDN (gamma_t = (in, out) transposed torch γ, beta (C,)) fused with a
    k5 s2 conv (kernel (5, 5, C, O) HWIO, bias (O,) or None). Returns
    (B, H/2, W/2, O) in x's dtype. Pass gamma_t=None for conv-only."""
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    has_gdn = gamma_t is not None
    if not (interpret or gdn_conv_applicable(x, c, kernel.shape[0], 2)):
        if has_gdn:
            return _gdn_conv_ref(x, gamma_t, beta, kernel, bias)
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (2, 2), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (out + bias.astype(out.dtype)) if bias is not None else out

    hs, ws, c2 = h // 2, w // 2, 2 * c
    if _GDN_CONV_DMA == "1":
        dma_th = (_GDN_CONV_TH or _gdn_conv_dma_th(x, o)
                  or (2 if interpret else None))
    elif _GDN_CONV_DMA == "auto" and not interpret:
        dma_th = _gdn_conv_use_dma(x, o)
    else:
        dma_th = None
    if dma_th is not None and (dma_th < 2 or hs % dma_th
                               or hs // dma_th < 2):
        dma_th = None  # rolling needs TH>=2, whole stripes, and a
        #               distinct boot + last stripe per frame
    th = dma_th or _GDN_CONV_TH or _gdn_conv_th(x) or (
        1 if interpret else None)
    stripes = hs // th
    win_dtype = x.dtype if interpret else jnp.bfloat16

    gdt = _gdn_dot_dtype(win_dtype)
    if has_gdn:
        g2 = jnp.kron(jnp.eye(2, dtype=jnp.float32),
                      gamma_t.astype(jnp.float32)).astype(gdt)
        beta2 = jnp.concatenate([beta, beta]).astype(jnp.float32)[None, :]
    else:
        g2 = jnp.zeros((c2, c2), gdt)
        beta2 = jnp.ones((1, c2), jnp.float32)
    wp = _pack_pair_kernel(kernel).astype(win_dtype)
    bias_row = (jnp.zeros((o,), jnp.float32) if bias is None
                else bias.astype(jnp.float32))[None, :]

    if dma_th:
        # NO pad: the reshape is layout-free, so the kernel reads the
        # producer's own HBM buffer (the Element path's jnp.pad copies the
        # whole frame first); frame-edge halo pairs are zeroed in-window
        x3 = x.reshape(b, h * ws, c2)
        out = pl.pallas_call(
            functools.partial(_pair_conv_dma_kernel, th=th, ws=ws, c2=c2,
                              o=o, has_gdn=has_gdn, stripes=stripes,
                              n_steps=b * stripes),
            out_shape=jax.ShapeDtypeStruct((b * hs * ws, o), x.dtype),
            grid=(b * stripes,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((th * ws, o), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2 * th * ws, c2), x.dtype),   # landing slot 0
                pltpu.VMEM((2 * th * ws, c2), x.dtype),   # landing slot 1
                pltpu.VMEM(((th + 2) * ws + 2, 2 * c2), win_dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(x3, g2, beta2, wp, bias_row)
        return out.reshape(b, hs, ws, o)

    if _GDN_CONV_HALO:
        # zero-pad 2·TH image rows at each frame edge so the main block
        # (2·TH rows, offset si+1), the above halo (2 rows, offset
        # th·(si+1)−1 in 2-row units) and the below halo (2 rows, offset
        # th·(si+2)) all land on integer multiples of their block sizes —
        # three STANDARD block-indexed operands into the SAME padded
        # array, each double-buffered by Mosaic. The pad is real zeros so
        # the kernel needs no frame-edge masking.
        x3 = jnp.pad(x.reshape(b, h * ws, c2),
                     ((0, 0), (2 * th * ws, 2 * th * ws), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_pair_conv_halo_kernel, th=th, ws=ws, c2=c2,
                              o=o, has_gdn=has_gdn),
            out_shape=jax.ShapeDtypeStruct((b * hs * ws, o), x.dtype),
            grid=(b * stripes,),
            in_specs=[
                pl.BlockSpec((None, 2 * th * ws, c2),
                             lambda i: (i // stripes, i % stripes + 1, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (None, 2 * ws, c2),
                    lambda i: (i // stripes, th * (i % stripes + 1) - 1, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (None, 2 * ws, c2),
                    lambda i: (i // stripes, th * (i % stripes + 2), 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((th * ws, o), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM(((th + 2) * ws + 2, 2 * c2), win_dtype),
            ],
            interpret=interpret,
        )(x3, x3, x3, g2, beta2, wp, bias_row)
        return out.reshape(b, hs, ws, o)

    # frame-isolated halo rows: explicit zero-pad of 2 image rows at each
    # frame edge (Mosaic's element_window rejects low padding, so the pad
    # is a real XLA op — it fuses with the producer in-chain)
    x3 = jnp.pad(x.reshape(b, h * ws, c2),
                 ((0, 0), (2 * ws, 2 * ws), (0, 0)))
    win_rows = (2 * th + 4) * ws
    out = pl.pallas_call(
        functools.partial(_pair_conv_kernel, th=th, ws=ws, c2=c2, o=o,
                          has_gdn=has_gdn, stripes=stripes),
        out_shape=jax.ShapeDtypeStruct((b * hs * ws, o), x.dtype),
        grid=(b * stripes,),
        in_specs=[
            # one overlapping window of 2·TH+4 image rows per stripe,
            # element-indexed into the zero-padded row axis
            pl.BlockSpec(
                (None, pl.Element(win_rows), pl.Element(c2)),
                lambda i: (i // stripes, (i % stripes) * 2 * th * ws, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th * ws, o), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(((th + 2) * ws + 2, 2 * c2), win_dtype),
        ],
        interpret=interpret,
    )(x3, g2, beta2, wp, bias_row)
    return out.reshape(b, hs, ws, o)


def _gdn_conv_fwd(x, gamma_t, beta, kernel, bias, interpret):
    out = gdn_conv_fused(x, gamma_t, beta, kernel, bias, interpret)
    return out, (x, gamma_t, beta, kernel, bias)


def _gdn_conv_bwd(interpret, res, g):
    x, gamma_t, beta, kernel, bias = res
    has_gdn = gamma_t is not None
    has_bias = bias is not None
    c = x.shape[-1]

    def ref(x_, gt_, b_, k_, bs_):
        if has_gdn:
            out = _gdn_conv_ref(x_, gt_, b_, k_, bs_ if has_bias else None)
        else:
            out = jax.lax.conv_general_dilated(
                x_, k_.astype(x_.dtype), (2, 2), ((2, 2), (2, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if has_bias:
                out = out + bs_.astype(out.dtype)
        return out

    _, vjp = jax.vjp(
        ref, x,
        gamma_t if has_gdn else jnp.zeros((c, c), jnp.float32),
        beta if has_gdn else jnp.zeros((c,), jnp.float32),
        kernel,
        bias if has_bias else jnp.zeros((kernel.shape[-1],), jnp.float32))
    gx, ggt, gb, gk, gbs = vjp(g.astype(x.dtype))
    return (gx, ggt if has_gdn else None, gb if has_gdn else None, gk,
            gbs if has_bias else None)


gdn_conv_fused.defvjp(_gdn_conv_fwd, _gdn_conv_bwd)

# ---------------------------------------------------------------------------
# fused IGDN → k5 s2 WIDE deconv (decoder stages)
# ---------------------------------------------------------------------------
#
# The g_s trunk mirror of gdn_conv_fused: IGDN fused into its consumer
# 192→192 deconv. The deconv runs in its sub-pixel form (one stride-1 3×3
# conv producing O·s² pre-shuffle channels; layers/conv.py::_subpixel_kernel
# is the exact weight rearrangement) as NINE whole-stripe (TH·W, C)×(C, 4O)
# dots over an IGDN'd window — K = C lanes, N = 4O = 768 full lane tiles.
# The (tiny relative) pixel shuffle runs as an XLA epilogue, exactly like
# the narrow-tail kernel (Mosaic has no sublane↔lane reshape). The narrow
# kernel (igdn_deconv_fused) keeps the RGB tail; this one takes the wide
# interior stages its feature cap excludes.

# Default OFF: standalone the wide fusion wins (3.55 vs 5.15 ms/frame at
# the 272x480 stage) but IN-CHAIN the pixel-shuffle epilogue + input pad
# materialize relayouts XLA otherwise avoids — device-only chain A/B at
# 1080p b4 bf16: 23.03 ms/frame baseline, 22.59 encoder fusion only (ON),
# 29.19 with this knob. The identified fix is carrying a column-paired
# ("CP") layout through g_s — rows full-res, columns paired on lanes —
# so each deconv resolves its row phases with sublane-only interleaves
# (Mosaic allows those; it is the sublane↔lane shuffle that is banned) and
# no stage ever materializes the shuffled tensor. Not yet implemented.
FUSE_IGDN_DECONV_WIDE = False  # A/B knob

_WIDE_BLOCKS = [(-1, -1), (-1, 0), (-1, 1),
                (0, -1), (0, 0), (0, 1),
                (1, -1), (1, 0), (1, 1)]


def _igdn_deconv_wide_kernel(x_ref, g_ref, beta_ref, w_ref, bias_ref,
                             out_ref, win_ref, *, th, w, c, o4, stripes):
    """One stripe: IGDN window fill (TH+2 input rows, 1 zero row each end)
    then nine whole-stripe masked dots into the (TH·W, O·s²) pre-shuffle
    accumulator."""

    def igdn(v):
        n = _norm_dot(v, g_ref, beta_ref)
        return (v.astype(jnp.float32) * jnp.sqrt(n)).astype(win_ref.dtype)

    zero = jnp.zeros((1, c), win_ref.dtype)
    win_ref[0:1] = zero
    win_ref[1 + (th + 2) * w:] = zero
    si = pl.program_id(0) % stripes
    for r in range(th + 2):
        v = x_ref[r * w:(r + 1) * w]
        if r == 0:
            v = jnp.where(si == 0, jnp.zeros((), v.dtype), v)
        elif r == th + 1:
            v = jnp.where(si == stripes - 1, jnp.zeros((), v.dtype), v)
        win_ref[1 + r * w:1 + (r + 1) * w] = igdn(v)

    jc = jax.lax.broadcasted_iota(jnp.int32, (th * w, 1), 0) % w
    m_lo = (jc != 0).astype(jnp.float32)
    m_hi = (jc != w - 1).astype(jnp.float32)
    acc = jnp.zeros((th * w, o4), jnp.float32) + bias_ref[:]
    for bi, (dm, dn) in enumerate(_WIDE_BLOCKS):
        slab = win_ref[1 + (dm + 1) * w + dn:1 + (dm + 1) * w + dn + th * w]
        d = jnp.dot(slab, w_ref[bi * c:(bi + 1) * c],
                    preferred_element_type=jnp.float32)
        if dn == -1:
            d = d * m_lo
        elif dn == 1:
            d = d * m_hi
        acc = acc + d
    out_ref[:] = acc.astype(out_ref.dtype)


def _wide_th(x, o4):
    b, h, w, c = x.shape
    isz = jnp.dtype(x.dtype).itemsize
    for th in (8, 4, 2, 1):
        if h % th:
            continue
        vmem = (2 * (th + 2) * w * c * isz      # x windows (pipelined)
                + ((th + 2) * w + 2) * c * 2    # IGDN'd window (bf16)
                + 2 * w * c * 4                 # igdn f32 temps
                + 9 * c * o4 * 2                # packed sub-pixel weights
                + c * c * 4                     # γ (f32)
                + th * w * o4 * 4               # f32 accumulator
                + 2 * th * w * o4 * 2)          # out blocks (pipelined)
        if vmem <= 15_900_000:
            return th
    return None


def igdn_deconv_wide_applicable(x, features: int, kernel_size: int,
                                stride: int) -> bool:
    if not (FUSE_IGDN_DECONV_WIDE and pallas_enabled()):
        return False
    if x.ndim != 4 or stride != 2 or kernel_size != 5:
        return False
    if x.dtype != jnp.bfloat16:
        return False
    b, h, w, c = x.shape
    if c % 64 or c < 128 or features % 64 or features < 128:
        return False
    if w % 8:
        return False
    return _wide_th(x, features * stride * stride) is not None


def _igdn_deconv_wide_call(x, gamma_t, beta, wp, bias4, o4, interpret):
    """Shared pallas_call of the wide IGDN→deconv kernel: returns the
    pre-shuffle (b·h·w, o4) tensor in whatever column order ``wp``/``bias4``
    encode (the shuffled and the packed variants differ only there)."""
    b, h, w, c = x.shape
    th = _wide_th(x, o4) or (1 if interpret else None)
    stripes = h // th
    win_dtype = x.dtype if interpret else jnp.bfloat16
    x3 = jnp.pad(x.reshape(b, h * w, c), ((0, 0), (w, w), (0, 0)))
    win_rows = (th + 2) * w
    return pl.pallas_call(
        functools.partial(_igdn_deconv_wide_kernel, th=th, w=w, c=c, o4=o4,
                          stripes=stripes),
        out_shape=jax.ShapeDtypeStruct((b * h * w, o4), x.dtype),
        grid=(b * stripes,),
        in_specs=[
            pl.BlockSpec(
                (None, pl.Element(win_rows), pl.Element(c)),
                lambda i: (i // stripes, (i % stripes) * th * w, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th * w, o4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win_rows + 2, c), win_dtype),
        ],
        interpret=interpret,
    )(x3, gamma_t.astype(_gdn_dot_dtype(win_dtype)),
      beta[None, :].astype(jnp.float32),
      wp.astype(win_dtype), bias4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def igdn_deconv_wide(x, gamma_t, beta, kernel, bias, interpret: bool = False):
    """IGDN (gamma_t (in, out) transposed torch γ, beta (C,)) fused with a
    WIDE k5 s2 deconv (kernel (5, 5, C, O) = flipped torch ConvTranspose2d
    weight, bias (O,) or None). Returns (B, 2H, 2W, O) in x's dtype."""
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    s = 2
    if not (interpret or igdn_deconv_wide_applicable(
            x, o, kernel.shape[0], s)):
        return _igdn_deconv_ref(x, gamma_t, beta, kernel, bias, s)

    from ..layers.conv import _subpixel_kernel, pixel_shuffle

    sub, rk, pl_, ph = _subpixel_kernel(kernel, kernel.shape[0], s)
    assert (rk, pl_, ph) == (3, 1, 1), (rk, pl_, ph)
    o4 = o * s * s
    wp = sub.reshape(9 * c, o4)
    bias4 = jnp.repeat(
        jnp.zeros((o,), jnp.float32) if bias is None
        else bias.astype(jnp.float32), s * s)[None, :]
    out = _igdn_deconv_wide_call(x, gamma_t, beta, wp, bias4, o4, interpret)
    return pixel_shuffle(out.reshape(b, h, w, o4), s)


def _igdn_deconv_wide_fwd(x, gamma_t, beta, kernel, bias, interpret):
    out = igdn_deconv_wide(x, gamma_t, beta, kernel, bias, interpret)
    return out, (x, gamma_t, beta, kernel, bias)


def _igdn_deconv_wide_bwd(interpret, res, g):
    x, gamma_t, beta, kernel, bias = res
    has_bias = bias is not None

    def ref(x_, gt_, b_, k_, bs_):
        return _igdn_deconv_ref(x_, gt_, b_, k_,
                                bs_ if has_bias else None, 2)

    _, vjp = jax.vjp(ref, x, gamma_t, beta, kernel,
                     bias if has_bias else jnp.zeros((kernel.shape[-1],),
                                                     jnp.float32))
    gx, ggt, gb, gk, gbs = vjp(g.astype(x.dtype))
    return gx, ggt, gb, gk, (gbs if has_bias else None)


igdn_deconv_wide.defvjp(_igdn_deconv_wide_fwd, _igdn_deconv_wide_bwd)

# ---------------------------------------------------------------------------
# packed g_s chain: IGDN→wide-deconv → IGDN→narrow-deconv with NO pixel
# shuffle between them
# ---------------------------------------------------------------------------
#
# Round-3 finding (knob comment above): the wide fusion wins standalone but
# regresses in-chain because its pixel-shuffle epilogue materializes the
# shuffled (B, 2H, 2W, O) tensor (a lane↔sublane relayout of ~200 MB/frame)
# which the next stage immediately re-pads. This section removes the shuffle
# from the chain entirely:
#
#   igdn_deconv_wide_packed : same wide kernel, but the pre-shuffle output
#     columns are reordered PHASE-MAJOR — lane index a·2O + b·O + o for
#     output pixel (2r+a, 2c+b) — and returned as (B, H, W, 4O) with no
#     epilogue. Phase slices land on 128-aligned lane boundaries (2O = 384
#     for O = 192), which is what makes the consumer's aligned slicing work.
#   igdn_deconv_tail_packed : consumes that packed layout directly —
#     IGDN per row-phase slice (384 lanes, kron(I₂, γ) pairs the column
#     phases), then the narrow sub-pixel deconv as NINE packed-cell block
#     dots whose weights bake the phase structure (built by
#     ``_pack_tail_kernel``). Emits (B·H·W, 16F) pre-shuffle; only the tiny
#     RGB tensor (≈25 MB/frame) goes through an XLA un-scramble epilogue.
#
# The shuffled intermediate never exists: one VMEM round-trip per stage,
# sublane/lane traffic only where 128-aligned. Reference behavior being
# fused: compressai/layers/gdn.py:22-66 (IGDN) + models/utils.py:124-130
# (the k5 s2 ConvTranspose2d pairs of g_s, priors.py:348-360).

FUSE_GS_PACKED = True  # A/B knob (chain measurement: tools/gs_packed_tune.py)


def _phase_major_cols(o: int) -> np.ndarray:
    """Column permutation (o, a, b) → (a, b, o): perm[new] = old index."""
    perm = np.empty(4 * o, np.int64)
    for a in range(2):
        for b2 in range(2):
            for oc in range(o):
                perm[a * 2 * o + b2 * o + oc] = oc * 4 + a * 2 + b2
    return perm


def _unpack_phase_major(xp, o: int):
    """(B, H, W, 4O) phase-major packed → logical (B, 2H, 2W, O) (XLA)."""
    b, h, w, _ = xp.shape
    v = xp.reshape(b, h, w, 2, 2, o)
    return v.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, o)


def _igdn_deconv_wide_packed_ref(x, gamma_t, beta, kernel, bias):
    y = _igdn_deconv_ref(x, gamma_t, beta, kernel, bias, 2)
    b, h2, w2, o = y.shape
    v = y.reshape(b, h2 // 2, 2, w2 // 2, 2, o)
    return v.transpose(0, 1, 3, 2, 4, 5).reshape(b, h2 // 2, w2 // 2, 4 * o)


def igdn_deconv_wide_packed_applicable(x, features: int, kernel_size: int,
                                       stride: int) -> bool:
    """Same geometry gate as the shuffled wide kernel, but under the packed
    chain knob (it ships ON — the epilogue that lost the A/B is gone)."""
    if not (FUSE_GS_PACKED and pallas_enabled()):
        return False
    if x.ndim != 4 or stride != 2 or kernel_size != 5:
        return False
    if x.dtype != jnp.bfloat16:
        return False
    b, h, w, c = x.shape
    # the consumer slices the packed lanes at 2O boundaries — they must be
    # 128-aligned (2·192 = 384 ✓ for the production g_s)
    if c % 64 or c < 128 or (2 * features) % 128 or features < 128:
        return False
    if w % 8:
        return False
    return _wide_th(x, features * stride * stride) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def igdn_deconv_wide_packed(x, gamma_t, beta, kernel, bias,
                            interpret: bool = False):
    """IGDN + wide k5 s2 deconv returning the PHASE-MAJOR PACKED output
    (B, H, W, 4O), lane index a·2O + b·O + o for logical pixel (2r+a, 2c+b)
    — no pixel shuffle. Consumer: igdn_deconv_tail_packed."""
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    if not (interpret or igdn_deconv_wide_packed_applicable(
            x, o, kernel.shape[0], 2)):
        return _igdn_deconv_wide_packed_ref(x, gamma_t, beta, kernel, bias)

    from ..layers.conv import _subpixel_kernel

    sub, rk, pl_, ph = _subpixel_kernel(kernel, kernel.shape[0], 2)
    assert (rk, pl_, ph) == (3, 1, 1), (rk, pl_, ph)
    o4 = 4 * o
    perm = _phase_major_cols(o)
    wp = sub.reshape(9 * c, o4)[:, perm]
    bias_f = (jnp.zeros((o,), jnp.float32) if bias is None
              else bias.astype(jnp.float32))
    bias4 = jnp.tile(bias_f, 4)[None, :]  # (a, b, o) order
    out = _igdn_deconv_wide_call(x, gamma_t, beta, wp, bias4, o4, interpret)
    return out.reshape(b, h, w, o4)


def _igdn_deconv_wide_packed_fwd(x, gamma_t, beta, kernel, bias, interpret):
    out = igdn_deconv_wide_packed(x, gamma_t, beta, kernel, bias, interpret)
    return out, (x, gamma_t, beta, kernel, bias)


def _igdn_deconv_wide_packed_bwd(interpret, res, g):
    x, gamma_t, beta, kernel, bias = res
    has_bias = bias is not None

    def ref(x_, gt_, b_, k_, bs_):
        return _igdn_deconv_wide_packed_ref(x_, gt_, b_, k_,
                                            bs_ if has_bias else None)

    _, vjp = jax.vjp(ref, x, gamma_t, beta, kernel,
                     bias if has_bias else jnp.zeros((kernel.shape[-1],),
                                                     jnp.float32))
    gx, ggt, gb, gk, gbs = vjp(g.astype(x.dtype))
    return gx, ggt, gb, gk, (gbs if has_bias else None)


igdn_deconv_wide_packed.defvjp(_igdn_deconv_wide_packed_fwd,
                               _igdn_deconv_wide_packed_bwd)


def _pack_tail_kernel(kernel, c: int):
    """Narrow deconv kernel (5, 5, C, F) → the nine packed-cell tap blocks
    (9·4C, 16F) for the phase-major packed input.

    Output lane layout per packed cell: (a, b, o·4 + a'·2 + b') — outer
    (a, b) = which logical pixel of the cell, inner 4F = that pixel's own
    sub-pixel block in _subpixel_kernel's torch order (the epilogue
    unscrambles both levels at once). For logical tap (dy, dx) of output
    pixel (a, b): logical row a+dy lands in packed-cell row offset
    (a+dy)//2 at input row-phase (a+dy)%2 — input channel block
    (ai·2 + bi)·C. Tap blocks are stacked in _WIDE_BLOCKS order."""
    from ..layers.conv import _subpixel_kernel

    sub, rk, pl_, ph = _subpixel_kernel(kernel, kernel.shape[0], 2)
    assert (rk, pl_, ph) == (3, 1, 1), (rk, pl_, ph)
    f4 = sub.shape[-1]  # F·s²
    # all indices are static — .at[].add() keeps this traceable under jit
    # (the weights are flax params, i.e. tracers inside the model jit)
    blocks = jnp.zeros((3, 3, 4 * c, 4 * f4), sub.dtype)
    for a in range(2):
        for b2 in range(2):
            ocol = (a * 2 + b2) * f4
            for dy in (-1, 0, 1):
                lr = a + dy
                dm, ai = lr // 2, lr % 2
                for dx in (-1, 0, 1):
                    lc = b2 + dx
                    dn, bi = lc // 2, lc % 2
                    irow = (ai * 2 + bi) * c
                    blocks = blocks.at[
                        dm + 1, dn + 1, irow:irow + c,
                        ocol:ocol + f4].add(sub[dy + 1, dx + 1])
    return jnp.concatenate(
        [blocks[dm + 1, dn + 1] for dm, dn in _WIDE_BLOCKS], axis=0
    )


def _tail_packed_kernel(x_ref, g2_ref, beta2_ref, w_ref, bias_ref,
                        out_ref, win_ref, *, th, w, c, f16, stripes):
    """One stripe of the packed tail: IGDN per row-phase slice during the
    window fill (2O = 2C lanes each, kron(I₂, γ) pairs the column phases),
    then nine whole-stripe packed-cell dots into the (th·w, 16F)
    accumulator."""
    c2 = 2 * c
    c4 = 4 * c

    def igdn(v):
        parts = []
        for a in range(2):
            va = v[:, a * c2:(a + 1) * c2]
            n = _norm_dot(va, g2_ref, beta2_ref)
            parts.append(va.astype(jnp.float32) * jnp.sqrt(n))
        return jnp.concatenate(parts, axis=-1).astype(win_ref.dtype)

    zero = jnp.zeros((1, c4), win_ref.dtype)
    win_ref[0:1] = zero
    win_ref[1 + (th + 2) * w:] = zero
    si = pl.program_id(0) % stripes
    for r in range(th + 2):
        v = x_ref[r * w:(r + 1) * w]
        if r == 0:
            v = jnp.where(si == 0, jnp.zeros((), v.dtype), v)
        elif r == th + 1:
            v = jnp.where(si == stripes - 1, jnp.zeros((), v.dtype), v)
        win_ref[1 + r * w:1 + (r + 1) * w] = igdn(v)

    jc = jax.lax.broadcasted_iota(jnp.int32, (th * w, 1), 0) % w
    m_lo = (jc != 0).astype(jnp.float32)
    m_hi = (jc != w - 1).astype(jnp.float32)
    acc = jnp.zeros((th * w, f16), jnp.float32) + bias_ref[:]
    for bi, (dm, dn) in enumerate(_WIDE_BLOCKS):
        slab = win_ref[1 + (dm + 1) * w + dn:1 + (dm + 1) * w + dn + th * w]
        d = jnp.dot(slab, w_ref[bi * c4:(bi + 1) * c4],
                    preferred_element_type=jnp.float32)
        if dn == -1:
            d = d * m_lo
        elif dn == 1:
            d = d * m_hi
        acc = acc + d
    out_ref[:] = acc.astype(out_ref.dtype)


def _tail_packed_th(xp, f16):
    b, h, w, c4 = xp.shape
    isz = jnp.dtype(xp.dtype).itemsize
    for th in (8, 4, 2, 1):
        if h % th:
            continue
        vmem = (2 * (th + 2) * w * c4 * isz      # x windows (pipelined)
                + ((th + 2) * w + 2) * c4 * 2    # IGDN'd window (bf16)
                + 3 * w * c4 * 4                 # igdn f32 temps
                + 9 * c4 * f16 * 2               # packed tap weights
                + (c4 // 2) ** 2 * 4             # γ₂ (f32)
                + th * w * f16 * 4               # f32 accumulator
                + 2 * th * w * f16 * 2)          # out blocks (pipelined)
        if vmem <= 15_900_000:
            return th
    return None


def _igdn_deconv_tail_packed_ref(xp, gamma_t, beta, kernel, bias):
    c = xp.shape[-1] // 4
    x = _unpack_phase_major(xp, c)
    return _igdn_deconv_ref(x, gamma_t, beta, kernel, bias, 2)


def igdn_deconv_tail_packed_applicable(xp, features: int, kernel_size: int,
                                       stride: int) -> bool:
    if not (FUSE_GS_PACKED and pallas_enabled()):
        return False
    if xp.ndim != 4 or stride != 2 or kernel_size != 5:
        return False
    if xp.dtype != jnp.bfloat16:
        return False
    b, h, w, c4 = xp.shape
    if c4 % 256 or c4 < 512:  # per-phase slice (c4/2) must be lane-aligned
        return False
    if features * 16 > 128 or w % 8:
        return False
    return _tail_packed_th(xp, features * 16) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def igdn_deconv_tail_packed(xp, gamma_t, beta, kernel, bias,
                            interpret: bool = False):
    """IGDN + narrow k5 s2 deconv CONSUMING the phase-major packed layout
    (B, H, W, 4C) from igdn_deconv_wide_packed — logical input
    (B, 2H, 2W, C), output (B, 4H, 4W, F). gamma_t/beta are the logical
    C-channel IGDN params; kernel (5, 5, C, F) flipped torch weight."""
    b, h, w, c4 = xp.shape
    c = c4 // 4
    f = kernel.shape[-1]
    if not (interpret or igdn_deconv_tail_packed_applicable(
            xp, f, kernel.shape[0], 2)):
        return _igdn_deconv_tail_packed_ref(xp, gamma_t, beta, kernel, bias)

    f16 = 16 * f
    th = _tail_packed_th(xp, f16) or (1 if interpret else None)
    stripes = h // th
    win_dtype = xp.dtype if interpret else jnp.bfloat16
    # γ paired over the column phases (per row-phase slice): kron(I₂, γᵀ)
    g2 = jnp.zeros((2 * c, 2 * c), jnp.float32)
    gt = gamma_t.astype(jnp.float32)
    g2 = g2.at[:c, :c].set(gt).at[c:, c:].set(gt)
    g2 = g2.astype(_gdn_dot_dtype(win_dtype))
    beta2 = jnp.tile(beta.astype(jnp.float32), 2)[None, :]
    wp = _pack_tail_kernel(kernel, c)
    bias_f = (jnp.zeros((f,), jnp.float32) if bias is None
              else bias.astype(jnp.float32))
    bias16 = jnp.tile(jnp.repeat(bias_f, 4), 4)[None, :]  # (a, b, o, a', b')

    x3 = jnp.pad(xp.reshape(b, h * w, c4), ((0, 0), (w, w), (0, 0)))
    win_rows = (th + 2) * w
    out = pl.pallas_call(
        functools.partial(_tail_packed_kernel, th=th, w=w, c=c, f16=f16,
                          stripes=stripes),
        out_shape=jax.ShapeDtypeStruct((b * h * w, f16), xp.dtype),
        grid=(b * stripes,),
        in_specs=[
            pl.BlockSpec(
                (None, pl.Element(win_rows), pl.Element(c4)),
                lambda i: (i // stripes, (i % stripes) * th * w, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th * w, f16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win_rows + 2, c4), win_dtype),
        ],
        interpret=interpret,
    )(x3, g2, beta2, wp.astype(win_dtype), bias16)

    # epilogue on the small RGB tensor only (~25 MB/frame at 1080p):
    # lanes (a, b, o, a', b') → out[4r + 2a + a', 4m + 2b + b', o]
    v = out.reshape(b, h, w, 2, 2, f, 2, 2)  # a, b, o, a', b'
    v = v.transpose(0, 1, 3, 6, 2, 4, 7, 5)  # b, h, a, a', w, b, b', o
    return v.reshape(b, 4 * h, 4 * w, f)


def _igdn_deconv_tail_packed_fwd(xp, gamma_t, beta, kernel, bias, interpret):
    out = igdn_deconv_tail_packed(xp, gamma_t, beta, kernel, bias, interpret)
    return out, (xp, gamma_t, beta, kernel, bias)


def _igdn_deconv_tail_packed_bwd(interpret, res, g):
    xp, gamma_t, beta, kernel, bias = res
    has_bias = bias is not None

    def ref(x_, gt_, b_, k_, bs_):
        return _igdn_deconv_tail_packed_ref(x_, gt_, b_, k_,
                                            bs_ if has_bias else None)

    _, vjp = jax.vjp(ref, xp, gamma_t, beta, kernel,
                     bias if has_bias else jnp.zeros((kernel.shape[-1],),
                                                     jnp.float32))
    gx, ggt, gb, gk, gbs = vjp(g.astype(xp.dtype))
    return gx, ggt, gb, gk, (gbs if has_bias else None)


igdn_deconv_tail_packed.defvjp(_igdn_deconv_tail_packed_fwd,
                               _igdn_deconv_tail_packed_bwd)
