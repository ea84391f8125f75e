"""Multi-host (multi-process) training support.

On a TPU pod each host sees only its local chips; training runs as one SPMD
program over the global mesh with every host feeding its own slice of the
global batch. The pieces:

- ``initialize_distributed``: idempotent wrapper over
  ``jax.distributed.initialize`` (env-driven on TPU pods, explicit args on
  CPU/GPU clusters).
- ``HostLoader(process_index=, process_count=)`` (data/loader.py): every host
  draws a disjoint stride of the same seeded global permutation — no
  cross-host communication needed — padded so all hosts run the same number
  of steps per epoch.
- ``make_global_batch``: assemble the host-local numpy batch into a global
  jax.Array laid out per the mesh sharding
  (``jax.make_array_from_process_local_data``).

The reference is strictly single-device (SURVEY.md §2.4); this is the
TPU-native scale-out path the blueprint calls for ("design data loading
per-host", SURVEY.md §5).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed once; returns this process's index.
    With no args, relies on the TPU-pod auto-detection; a no-op (returning 0)
    in single-process runs where no coordinator is configured."""
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return jax.process_index()
    if coordinator_address is None and num_processes is None:
        return jax.process_index()  # single process, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return jax.process_index()


def make_global_batch(
    mesh: Mesh, local: np.ndarray, sharding: NamedSharding
) -> jax.Array:
    """Host-local (B_local, ...) numpy -> global jax.Array sharded per
    ``sharding`` over ``mesh``. B_global = B_local * process_count; each
    host contributes exactly its addressable shards."""
    return jax.make_array_from_process_local_data(sharding, local)


def global_batch_dict(mesh: Mesh, batch: dict, image_sharding, batch_sharding) -> dict:
    """Assemble a HostLoader batch dict into global arrays: images laid out
    per ``image_sharding`` (N over data [, H over spatial]), labels/combos
    per ``batch_sharding``."""
    return {
        "image": make_global_batch(mesh, batch["image"], image_sharding),
        "label": make_global_batch(mesh, batch["label"], batch_sharding),
        "combo": make_global_batch(mesh, batch["combo"], batch_sharding),
    }
