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
from jax.sharding import NamedSharding

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed once; returns this process's index.

    With explicit args this MUST run before any other JAX call (the
    coordination service has to start before the backend initialises), so
    ``jax.distributed.initialize`` is invoked FIRST — no jax.process_count()
    probe, which would itself initialise the backend. With no args it is a
    no-op returning the current process index (single-process runs, or
    TPU-pod environments where the launcher already called initialize)."""
    global _initialized
    if not _initialized and (
        coordinator_address is not None or num_processes is not None
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    return jax.process_index()


def make_global_batch(local: np.ndarray, sharding: NamedSharding) -> jax.Array:
    """Host-local (B_local, ...) numpy -> global jax.Array laid out per
    ``sharding`` (the mesh is carried by the sharding itself).
    B_global = B_local * process_count; each host contributes exactly its
    addressable shards."""
    return jax.make_array_from_process_local_data(sharding, local)


def global_batch_dict(batch: dict, image_sharding, batch_sharding) -> dict:
    """Assemble a HostLoader batch dict into global arrays: images laid out
    per ``image_sharding`` (N over data [, H over spatial]), labels/combos
    per ``batch_sharding``."""
    return {
        "image": make_global_batch(batch["image"], image_sharding),
        "label": make_global_batch(batch["label"], batch_sharding),
        "combo": make_global_batch(batch["combo"], batch_sharding),
    }
