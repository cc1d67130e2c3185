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
