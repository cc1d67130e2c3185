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
        vf = v.astype(jnp.float32)
        n = jnp.dot(vf * vf, gamma_ref[:],
                    preferred_element_type=jnp.float32) + beta_ref[:]
        return vf * jnp.sqrt(n)

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
    )(x2, xb2, gamma_t.astype(jnp.float32), beta[None, :].astype(jnp.float32),
      sub2.astype(win_dtype), bias12)

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
