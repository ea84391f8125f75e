"""Distributed (per-shard) checkpoint IO for sharded training state.

The plain npz path (io.py) calls ``np.asarray`` on every leaf, which
all-gathers sharded arrays to one host — fine for replicated DP state on a
single host, wrong for ZeRO-1/FSDP state on a pod: on a multi-process run a
non-fully-addressable array cannot even be materialised host-side, and on a
big model you don't want O(P) host RAM or O(P) ICI/DCN gather traffic just
to checkpoint O(P/D) local bytes.

This module is the TPU-native equivalent of torch.distributed's sharded
checkpointing (the reference itself is single-GPU and has none —
SURVEY.md §2.4; this extends its E12 checkpoint component to the scale-out
path):

- ``save_sharded_pytree(tree, directory)`` — COLLECTIVE: every process
  calls it. Each process writes only the shards it owns (exactly one
  owner per shard globally: the device holding ``replica_id == 0``) into
  ``shards_pNNNNN.npz`` + a chunk manifest; after a cross-process barrier,
  process 0 commits the checkpoint by writing ``MANIFEST.json``. A torn
  save (crash before commit) is never loadable.
- ``load_sharded_pytree(directory, shardings=...)`` — rebuilds the pytree
  laid out per ``shardings`` via ``jax.make_array_from_callback``: each
  process reads ONLY the chunk bytes its addressable shards overlap. The
  target sharding is free to differ from the one saved under — chunks are
  reassembled per requested slice — so a run checkpointed on D devices
  resumes on D' (elastic resharding). ``shardings=None`` returns plain
  numpy (host inspection / conversion to the npz format).

Numerics: pure byte movement — values round-trip bit-identically under any
(save layout, load layout) pair (tests/test_sharded_checkpoint.py).
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from .io import _SEP, _flatten, _unflatten

_MANIFEST = "MANIFEST.json"


def _is_marker(key: str) -> bool:
    return key.endswith((".__none__", ".__empty_dict__", ".__empty_list__"))


def _np_dtype(name: str) -> np.dtype:
    """np.dtype by name, falling back to ml_dtypes (bfloat16 etc.)."""
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def _norm_index(index, shape) -> Tuple[List[int], List[int]]:
    """A shard's ``index`` (tuple of slices) -> explicit (start, stop)."""
    starts, stops = [], []
    for sl, dim in zip(index, shape):
        start, stop, step = sl.indices(dim)
        assert step == 1, "sharding slices are contiguous"
        starts.append(start)
        stops.append(stop)
    return starts, stops


def _atomic_write(directory: str, name: str, write_fn) -> None:
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            write_fn(f)
        os.replace(tmp, os.path.join(directory, name))
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


_barrier_seq = __import__("itertools").count()


def _barrier(tag: str, timeout_ms: int = 600_000) -> None:
    """Cross-process rendezvous via the coordination-service KV barrier —
    NOT a device collective, so it is safe from a background thread while
    the main thread runs training collectives on the same devices (the
    async writer depends on this; a psum-style barrier could interleave
    with training programs in different orders on different processes and
    deadlock). Barrier ids pair up because every process performs the same
    save sequence — the usual collective-ordering contract."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(f"hst:{tag}:{next(_barrier_seq)}", timeout_ms)
    else:  # pod runtimes without an exposed coordination client
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def save_sharded_pytree(tree: Any, directory: str) -> None:
    """Collective sharded save; see the module docstring. Every process
    must call this with the SAME tree (the usual SPMD training state)."""
    pi, pc = jax.process_index(), jax.process_count()
    os.makedirs(directory, exist_ok=True)
    # a previous MANIFEST must not make a half-overwritten save loadable
    if pi == 0 and os.path.exists(os.path.join(directory, _MANIFEST)):
        os.unlink(os.path.join(directory, _MANIFEST))
    _barrier("hst:sharded_save:clear")

    flat = _flatten(tree, coerce=lambda x: x)
    payload: Dict[str, np.ndarray] = {}
    leaves: Dict[str, dict] = {}
    n_chunks = 0
    for key, leaf in flat.items():
        if _is_marker(key):
            # structure markers carry no data; record in the manifest only
            # (from process 0, once)
            if pi == 0:
                leaves[key] = {"marker": True}
            continue
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            shape, dtype = tuple(leaf.shape), np.dtype(leaf.dtype).name
            chunks = []
            for shard in leaf.addressable_shards:
                if shard.replica_id != 0:
                    continue  # exactly one owner per shard index globally
                starts, stops = _norm_index(shard.index, shape)
                ck = f"c{n_chunks}"
                n_chunks += 1
                payload[ck] = np.asarray(shard.data)
                chunks.append({"key": ck, "start": starts, "stop": stops})
            if chunks or pi == 0:
                leaves[key] = {
                    "shape": list(shape), "dtype": dtype, "chunks": chunks,
                }
        else:
            # host-side leaf (plain numpy / python scalar): process 0 owns it
            if pi == 0:
                arr = np.asarray(leaf)
                ck = f"c{n_chunks}"
                n_chunks += 1
                payload[ck] = arr
                leaves[key] = {
                    "shape": list(arr.shape),
                    "dtype": arr.dtype.name,
                    "chunks": [{
                        "key": ck,
                        "start": [0] * arr.ndim,
                        "stop": list(arr.shape),
                    }],
                }

    shard_file = f"shards_p{pi:05d}.npz"
    _atomic_write(directory, shard_file, lambda f: np.savez(f, **payload))
    _atomic_write(
        directory,
        f"manifest_p{pi:05d}.json",
        lambda f: f.write(
            json.dumps({"file": shard_file, "leaves": leaves}).encode()
        ),
    )
    _barrier("hst:sharded_save:written")
    if pi == 0:
        manifest = {
            "format": 1,
            "process_count": pc,
            "manifests": [f"manifest_p{i:05d}.json" for i in range(pc)],
        }
        _atomic_write(
            directory, _MANIFEST,
            lambda f: f.write(json.dumps(manifest, indent=2).encode()),
        )
    _barrier("hst:sharded_save:committed")


class _Chunk:
    __slots__ = ("npz", "key", "start", "stop")

    def __init__(self, npz, key, start, stop):
        self.npz, self.key = npz, key
        self.start, self.stop = start, stop


def _read_slice(meta: dict, chunks: List[_Chunk], idx) -> np.ndarray:
    """Assemble the requested slice (tuple of slices over the global shape)
    from the saved chunks, reading only overlapping ones."""
    shape = meta["shape"]
    starts, stops = _norm_index(idx, shape)
    out_shape = [b - a for a, b in zip(starts, stops)]
    dtype = _np_dtype(meta["dtype"])

    def fetch(c):
        arr = c.npz[c.key]
        # ml_dtypes (bfloat16 etc.) round-trip npz as void bit patterns
        if arr.dtype != dtype and arr.dtype.itemsize == dtype.itemsize:
            arr = arr.view(dtype)
        return arr

    # fast path: one chunk covers the request exactly
    for c in chunks:
        if c.start == starts and c.stop == stops:
            return fetch(c)

    out = np.empty(out_shape, dtype)
    filled = 0
    for c in chunks:
        ov_start = [max(a, ca) for a, ca in zip(starts, c.start)]
        ov_stop = [min(b, cb) for b, cb in zip(stops, c.stop)]
        if any(a >= b for a, b in zip(ov_start, ov_stop)):
            continue
        src = fetch(c)[tuple(
            slice(a - ca, b - ca)
            for a, b, ca in zip(ov_start, ov_stop, c.start)
        )]
        out[tuple(
            slice(a - ra, b - ra)
            for a, b, ra in zip(ov_start, ov_stop, starts)
        )] = src
        filled += src.size
    want = int(np.prod(out_shape)) if out_shape else 1
    if filled != want:
        raise ValueError(
            f"sharded checkpoint is missing data for slice {idx} "
            f"(covered {filled}/{want} elements) — saved under a different "
            "replica layout or corrupted"
        )
    return out


def load_sharded_pytree(
    directory: str,
    shardings: Optional[Any] = None,
    as_jax: bool = True,
    like: Optional[Any] = None,
) -> Any:
    """Load a ``save_sharded_pytree`` checkpoint.

    ``shardings``: a pytree of NamedSharding matching the saved tree's
    structure (e.g. the tuple ``(v_shard, o_shard)`` the FSDP factory
    returns), or ONE sharding applied to every leaf, or None for plain
    numpy (``as_jax=True`` then converts replicated via jnp.asarray).
    The target layout may differ from the saved one — chunks are
    reassembled per requested slice (elastic resharding).

    ``like``: optional template tree (e.g. a fresh ``optimizer.init``) whose
    container STRUCTURE the result is re-hung on — NamedTuple containers
    (optax states) flatten to plain lists in the file format, the same
    convention as the npz path (train/kfold._restore_opt_state)."""
    with open(os.path.join(directory, _MANIFEST)) as f:
        top = json.load(f)
    metas: Dict[str, dict] = {}
    chunk_map: Dict[str, List[_Chunk]] = {}
    for mname in top["manifests"]:
        with open(os.path.join(directory, mname)) as f:
            m = json.load(f)
        npz = np.load(os.path.join(directory, m["file"]))
        for key, meta in m["leaves"].items():
            if meta.get("marker"):
                metas.setdefault(key, {"marker": True})
                continue
            if key not in metas:
                metas[key] = {"shape": meta["shape"], "dtype": meta["dtype"]}
            chunk_map.setdefault(key, []).extend(
                _Chunk(npz, c["key"], c["start"], c["stop"])
                for c in meta["chunks"]
            )

    shard_flat: Dict[str, Any] = {}
    if shardings is not None:
        from jax.sharding import Sharding

        if isinstance(shardings, Sharding):
            shard_flat = {k: shardings for k in metas}
        else:
            shard_flat = _flatten(shardings, coerce=lambda x: x)

    flat: Dict[str, Any] = {}
    for key, meta in metas.items():
        if meta.get("marker"):
            flat[key] = np.zeros(0)
            continue
        chunks = chunk_map.get(key, [])
        shape = tuple(meta["shape"])
        if shardings is None:
            full = _read_slice(meta, chunks, tuple(slice(0, d) for d in shape))
            flat[key] = np.asarray(full)
        else:
            sh = shard_flat.get(key)
            if sh is None:
                raise KeyError(
                    f"shardings tree has no leaf for saved key {key!r}"
                )
            # (_read_slice outputs are C-contiguous: whole npz chunks or
            # freshly assembled buffers; np.ascontiguousarray would promote
            # 0-d scalars to (1,) and break shard-shape validation)
            flat[key] = jax.make_array_from_callback(
                shape, sh,
                lambda idx, meta=meta, chunks=chunks: _read_slice(
                    meta, chunks, idx
                ),
            )

    tree = _unflatten(flat)
    if shardings is None and as_jax:
        import jax.numpy as jnp

        tree = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if x is not None else None, tree
        )
    if like is not None:
        tree = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(like),
            jax.tree_util.tree_leaves(tree),
        )
    return tree


def make_async_sharded_writer(max_pending: int = 2):
    """Asynchronous distributed checkpoints: an ``AsyncCheckpointWriter``
    whose worker runs ``save_sharded_pytree`` — ``submit(tree, directory)``
    takes the device-side snapshot (sharding-preserving copy, so donation
    of the live buffers is safe immediately) and the per-shard D2H + write
    + commit happen on the background thread, overlapped with training.

    Multi-process contract: every process drives the same writer with the
    same submission sequence (the commit barrier is coordination-service
    based — no device collectives — so it cannot deadlock against the main
    thread's training program). For rolling checkpoints alternate two
    directories: a resave into the SAME directory un-commits it first
    (MANIFEST removed), so a crash mid-resave loses that slot's previous
    checkpoint too."""
    from .async_io import AsyncCheckpointWriter

    return AsyncCheckpointWriter(max_pending, save_fn=save_sharded_pytree)
