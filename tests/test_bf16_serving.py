"""bfloat16 serving tests (models/base.py::set_compute_dtype).

The serving knob runs the transform nets in bf16 while every
quantization / CDF-row decision stays inside an f32 island, so encoder
and decoder agree on symbols and indexes and compress→decompress
round-trips stay exact under bf16 just as at f32 — only the RD point
moves. No reference counterpart (compressai serves f32 only;
entropy_models.py:201-233 quantize path is always f64/f32 on host);
this is a TPU-first addition: bf16 halves HBM traffic and runs the MXU
at its native dtype (artifacts/roofline.json).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatiotemporalentropymodel_tpu.models import (
    MeanScaleHyperprior,
    SpatioTemporalPriorModel,
    SpatioTemporalPriorModelChannelAR,
)

M = 24
EBC = 32


def _latents(b=1, hw=8, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    y_cur = jax.random.normal(k1, (b, hw, hw, M))
    y_cond = y_cur + 0.3 * jax.random.normal(k2, (b, hw, hw, M))
    return y_cur, y_cond


def test_set_compute_dtype_casts_float_params_only():
    m = MeanScaleHyperprior(8, 12)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    m.init(x)
    m.set_compute_dtype(jnp.bfloat16)
    dtypes = {p.dtype for p in jax.tree_util.tree_leaves(m.params)
              if jnp.issubdtype(p.dtype, jnp.floating)}
    assert dtypes == {jnp.dtype(jnp.bfloat16)}
    # back to f32 serving (lossy but well-typed)
    m.set_compute_dtype(None)
    dtypes = {p.dtype for p in jax.tree_util.tree_leaves(m.params)
              if jnp.issubdtype(p.dtype, jnp.floating)}
    assert dtypes == {jnp.dtype(jnp.float32)}


def test_msh_bf16_roundtrip_close_to_f32():
    m = MeanScaleHyperprior(8, 12)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    m.init(x)
    m.update()
    enc32 = m.compress(x)
    x32 = np.asarray(m.decompress(enc32["strings"], enc32["shape"])["x_hat"])

    m.set_compute_dtype(jnp.bfloat16)
    enc16 = m.compress(x)
    dec16 = m.decompress(enc16["strings"], enc16["shape"])
    x16 = np.asarray(dec16["x_hat"], np.float32)
    assert np.all(np.isfinite(x16))
    assert np.abs(x16 - x32).mean() < 0.05
    # rate must be in the same regime (weight cast shifts symbols slightly)
    b32 = sum(len(s[0]) for s in enc32["strings"])
    b16 = sum(len(s[0]) for s in enc16["strings"])
    assert 0.5 * b32 < b16 < 2.0 * b32


@pytest.mark.parametrize("variant", ["without_spm", "res"])
def test_stem_bf16_roundtrip(variant):
    kw = {"wavefront_tile": (2, 4)} if variant == "res" else {}
    m = SpatioTemporalPriorModel(
        variant=variant, entropy_bottleneck_channels=EBC, in_channels=M, **kw
    )
    y_cur, y_cond = _latents()
    m.init(y_cur, y_cond)
    m.update()
    enc32 = m.compress(y_cur, y_cond)
    y32 = np.asarray(
        m.decompress(enc32["strings"], enc32["shape"], y_cond)["y_hat"],
        np.float32,
    )

    m.set_compute_dtype(jnp.bfloat16)
    enc16 = m.compress(y_cur, y_cond)
    dec16 = m.decompress(enc16["strings"], enc16["shape"], y_cond)
    y16 = np.asarray(dec16["y_hat"], np.float32)
    assert np.all(np.isfinite(y16))
    # symbols are integers on a unit grid; a decode mismatch shows up as
    # O(1) garbage, a healthy bf16 shift as sub-quantization-step noise
    assert np.abs(y16 - y32).mean() < 0.25


@pytest.mark.parametrize("transport", ["dense", "sparse"])
def test_charm_bf16_roundtrip(transport):
    m = SpatioTemporalPriorModelChannelAR(
        groups=4, entropy_bottleneck_channels=16, in_channels=16
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    y_cur = jax.random.normal(k1, (1, 8, 8, 16))
    y_cond = y_cur + 0.3 * jax.random.normal(k2, (1, 8, 8, 16))
    m.init(y_cur, y_cond)
    m.update()
    enc32 = m.compress(y_cur, y_cond, transport_mode=transport)
    y32 = np.asarray(
        m.decompress(enc32["strings"], enc32["shape"], y_cond,
                     transport_mode=enc32.get("transport", transport),
                     counts=enc32.get("counts"))["y_hat"],
        np.float32,
    )

    m.set_compute_dtype(jnp.bfloat16)
    enc16 = m.compress(y_cur, y_cond, transport_mode=transport)
    dec16 = m.decompress(enc16["strings"], enc16["shape"], y_cond,
                         transport_mode=enc16.get("transport", transport),
                         counts=enc16.get("counts"))
    y16 = np.asarray(dec16["y_hat"], np.float32)
    assert np.all(np.isfinite(y16))
    assert np.abs(y16 - y32).mean() < 0.25
