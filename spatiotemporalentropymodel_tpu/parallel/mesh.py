"""Device-mesh helpers for SPMD data-parallel training.

The reference has no distributed layer (SURVEY.md §2.7); the TPU-native
equivalent is a 1-D data-parallel mesh over ICI: batch sharded on axis
"data", parameters replicated, gradient psums inserted by GSPMD when the
loss reduces over the sharded batch under jit.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host batch (leading dim = global batch) sharded over the mesh."""
    sharding = batch_sharded(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
