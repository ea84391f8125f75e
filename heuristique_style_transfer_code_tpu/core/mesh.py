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


def _jit_batch_sharded(fn, mesh: Mesh, n_batch_inputs: int, batch_axis: int):
    """jit ``fn(variables, *batch_inputs)`` with variables replicated, batch
    inputs sharded on ``batch_axis`` over 'data', and per-output-leaf
    shardings chosen at first trace (``jax.eval_shape``): leaves deep enough
    to carry the batch axis are sharded there, lower-rank leaves (per-batch
    scalars/counters) are replicated. Cached per input aval signature."""
    repl = replicated_sharding(mesh)
    in_spec = P(*([None] * batch_axis + [DATA_AXIS]))
    in_sh = (repl,) + (NamedSharding(mesh, in_spec),) * n_batch_inputs
    compiled = {}

    def call(*args):
        key = tuple(
            (tuple(x.shape), str(getattr(x, "dtype", type(x))))
            for x in jax.tree_util.tree_leaves(args)
        )
        f = compiled.get(key)
        if f is None:
            outs = jax.eval_shape(fn, *args)
            out_sh = jax.tree_util.tree_map(
                lambda o: NamedSharding(
                    mesh, in_spec if o.ndim > batch_axis else P()
                ),
                outs,
            )
            f = compiled[key] = jax.jit(fn, in_shardings=in_sh, out_shardings=out_sh)
        return f(*args)

    return call


def jit_eval_step(step, mesh: Optional[Mesh], n_batch_inputs: int = 1):
    """jit an eval ``step(variables, *batch_inputs)`` with variables
    replicated and every batch input/output sharded over the mesh's 'data'
    axis (scalar outputs replicated). With ``mesh=None`` this is a plain
    jit. Sharding is a layout, not a semantics change: results are
    identical to single-device."""
    if mesh is None:
        return jax.jit(step)
    return _jit_batch_sharded(step, mesh, n_batch_inputs, batch_axis=0)


def jit_scanned_eval_step(step, mesh: Optional[Mesh], n_batch_inputs: int = 1):
    """K-batches-per-dispatch variant of :func:`jit_eval_step`: the returned
    function takes every batch input STACKED to ``(K, B, ...)`` and runs the
    per-batch ``step`` as an on-device ``lax.scan`` over the leading K axis,
    returning the stacked ``(K, ...)`` outputs — ONE dispatch and ONE fetch
    for K batches. Per-batch results are bit-identical to K separate
    :func:`jit_eval_step` calls (the scan body is the same program); only
    the dispatch granularity changes. Batch axis 1 is sharded over the
    mesh's 'data' axis when a mesh is given (axis 0 is sequential time;
    rank<2 outputs, e.g. per-batch scalars, are replicated)."""

    def scanned(variables, *stacked_inputs):
        def one(_, xs):
            return None, step(variables, *xs)

        _, out = jax.lax.scan(one, None, stacked_inputs)
        return out

    if mesh is None:
        return jax.jit(scanned)
    return _jit_batch_sharded(scanned, mesh, n_batch_inputs, batch_axis=1)


def scanned_eval_iter(
    step,
    variables,
    loader,
    mesh: Optional[Mesh] = None,
    *,
    input_keys: Sequence[str] = ("image",),
    steps_per_dispatch: int = 1,
):
    """Drive ``step(variables, *batch_inputs)`` over a loader, yielding
    ``(batch, out)`` with ``out`` already fetched to numpy — dispatching
    ``steps_per_dispatch`` loader batches per device call
    (:func:`jit_scanned_eval_step`) and the final remainder one at a time.
    Per-batch outputs are bit-identical to plain per-batch dispatch; only
    the dispatch/fetch granularity changes."""
    import jax.numpy as jnp

    k = max(1, int(steps_per_dispatch))
    one = jit_eval_step(step, mesh, n_batch_inputs=len(input_keys))
    many = (
        jit_scanned_eval_step(step, mesh, n_batch_inputs=len(input_keys))
        if k > 1
        else None
    )

    fetch = lambda out: jax.tree_util.tree_map(np.asarray, out)  # noqa: E731

    def flush(pending):
        if len(pending) == k and many is not None:
            stacked = [
                jnp.asarray(np.stack([b[key] for b in pending]))
                for key in input_keys
            ]
            outs = fetch(many(variables, *stacked))
            for t, b in enumerate(pending):
                yield b, jax.tree_util.tree_map(lambda x: x[t], outs)
        else:
            for b in pending:
                inputs = [jnp.asarray(b[key]) for key in input_keys]
                yield b, fetch(one(variables, *inputs))

    pending = []
    for batch in loader:
        pending.append(batch)
        if len(pending) == k:
            yield from flush(pending)
            pending = []
    if pending:
        yield from flush(pending)
