"""Device mesh and sharding helpers.

The reference is single-device (SURVEY.md §2.4); here data-parallelism is a
first-class citizen: a 1-D ``Mesh`` over the ``data`` axis, batch arrays
sharded along it, parameters replicated. XLA inserts the gradient ``psum``
over ICI automatically when the loss is computed under these shardings.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """Create a 1-D data-parallel mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Device-put a host batch with its leading axis sharded over the mesh."""
    sharding = data_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def jit_eval_step(step, mesh: Optional[Mesh], n_batch_inputs: int = 1):
    """jit an eval ``step(variables, *batch_inputs)`` with variables
    replicated and every batch input/output sharded over the mesh's 'data'
    axis. With ``mesh=None`` this is a plain jit. Sharding is a layout, not a
    semantics change: results are identical to single-device."""
    if mesh is None:
        return jax.jit(step)
    repl = replicated_sharding(mesh)
    data = data_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl,) + (data,) * n_batch_inputs,
        out_shardings=data,
    )
