"""Spatial model-parallelism: one frame sharded across the device mesh.

The reference scales by putting one frame per GPU (its eval loops are
single-device — stem/evalSTEM.py:93-153); the TPU-native scale-up for
large frames (4K/8K, where a single frame's activations dominate HBM and
latency) shards the frame's width across an ICI mesh and lets GSPMD
insert the conv halo exchanges: every transform in this package is a
stack of k5/k3 SAME convs, GDNs (per-pixel 1×1 matmuls) and pixel
shuffles, all of which XLA partitions over a spatial axis automatically
when the inputs carry a ``NamedSharding``. No manual ``ppermute`` and no
changes to the model code — the sharding annotation IS the program.

Serving split: the device transforms (g_a, g_s, hyper nets, TPM/EPM) run
width-sharded; the latent/entropy boundary stays per-frame on the host
(the rANS coder is a host loop either way), so ``spatial_apply`` is used
for the transform stages around it.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SP_AXIS = "sp"


def make_spatial_mesh(n_devices: Optional[int] = None,
                      axis_name: str = SP_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def frame_sharding(mesh: Mesh, axis_name: str = SP_AXIS) -> NamedSharding:
    """NHWC frame sharded along W.

    W is the split axis (not H) because every transform keeps W the widest
    spatial dim at 16:9, so per-device halo volume (a 2-column strip for
    k5 SAME convs) is minimized relative to shard area.
    """
    return NamedSharding(mesh, P(None, None, axis_name, None))


def shard_frame(x, mesh: Mesh, axis_name: str = SP_AXIS):
    """Place an NHWC frame W-sharded over the mesh.

    W must be divisible by the mesh size times the model's total stride
    (×16 for the 4-stage g_a) so every stage keeps an integral shard.
    """
    n = mesh.devices.size
    if x.shape[2] % n:
        raise ValueError(
            f"frame W={x.shape[2]} not divisible by mesh size {n}")
    return jax.device_put(x, frame_sharding(mesh, axis_name))


def spatial_apply(model, method: str, x, mesh: Mesh, *,
                  axis_name: str = SP_AXIS, gather: bool = False):
    """Run one transform method of a :class:`CompressionModel` with the
    frame W-sharded over ``mesh`` (params replicated; GSPMD inserts the
    conv halo exchanges).

    Returns the output still sharded (every NHWC output whose W divides
    the mesh is pinned W-sharded — XLA's propagation alone may choose to
    replicate small outputs) unless ``gather=True``, which constrains the
    output back to replicated — use that when the next stage is the host
    entropy coder.
    """
    module, params = model.module, model.params
    repl = NamedSharding(mesh, P())
    sharded = frame_sharding(mesh, axis_name)
    n = mesh.devices.size

    def pin(leaf):
        if getattr(leaf, "ndim", 0) == 4 and leaf.shape[2] % n == 0:
            return jax.lax.with_sharding_constraint(leaf, sharded)
        return leaf

    def fn(p, v):
        out = module.apply({"params": p}, v, method=method)
        return out if gather else jax.tree.map(pin, out)

    fn = jax.jit(
        fn,
        in_shardings=(repl, sharded),
        out_shardings=repl if gather else None,
    )
    return fn(jax.device_put(params, repl), shard_frame(x, mesh, axis_name))
