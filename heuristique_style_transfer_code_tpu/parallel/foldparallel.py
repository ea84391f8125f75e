"""Fold-parallel k-fold cross-validation: all K folds trained simultaneously
as ONE SPMD program.

The reference's CV driver trains folds strictly sequentially — the natural
eager-torch structure (train_best_RESNET50_Truncate.py:146-258: a Python
loop re-creating the model per fold). But the folds are embarrassingly
parallel: they share no state, only hardware. The TPU-native expression is
to make the fold index a *batch axis*: stack the K per-fold parameter trees
on a leading fold dimension, ``jax.vmap`` the shared train-step body over
it, and shard that dimension over a mesh axis. GSPMD then partitions every
batched op by fold, so each device group executes the ORIGINAL per-fold
program with ZERO cross-fold collectives — K-fold training wall time
becomes one fold's wall time on K-way hardware, without touching the model
or step code.

Trajectory equality with the sequential driver holds per fold by
construction: each fold consumes the same init key, the same per-step PRNG
subkeys, and the same batch sequence (HostLoader seeded ``seed + fold``) as
its sequential counterpart. Fold sizes can differ (N % K != 0, or the
augmentation product), so folds whose epoch ends early go *inactive*: their
stacked state passes through ``jnp.where`` unchanged rather than receiving
a zero-gradient step — which would still move SGD momentum and BatchNorm
running statistics (equality-tested in tests/test_foldparallel.py).

The speedup REQUIRES the fold axis to actually shard (local fold width 1).
Measured on one v5e chip (PERF.md): vmapping 4 folds that share a device is
0.76x the 4 sequential steps — the vmap turns per-fold-weight convolutions
into batched-kernel (grouped) convolutions the MXU runs less efficiently,
and the per-fold batch is too small to recover it. ``make_fold_mesh`` puts
``gcd(k_folds, n_devices)`` on the fold axis; pick a device count the fold
count divides.
"""
from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import DATA_AXIS

FOLD_AXIS = "fold"


def make_fold_mesh(
    k_folds: int,
    n_devices: Optional[int] = None,
    batch_size: Optional[int] = None,
) -> Mesh:
    """(fold, data) mesh. The fold axis takes the largest common factor of
    the fold count and the device count (each shard then holds K/F folds);
    the remaining devices shard every fold's batch over 'data'. The data
    axis is clamped to a divisor of ``batch_size`` so batches split evenly.
    """
    devices = jax.devices()
    n = min(n_devices or len(devices), len(devices))
    f = math.gcd(k_folds, n)
    d = n // f
    if batch_size is not None:
        while d > 1 and batch_size % d != 0:
            d -= 1
    grid = np.asarray(devices[: f * d]).reshape(f, d)
    return Mesh(grid, (FOLD_AXIS, DATA_AXIS))


def stack_fold_states(states: Sequence) -> object:
    """Stack per-fold pytrees on a new leading fold axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_fold_state(stacked, k_folds: int) -> List:
    """Split a fold-stacked pytree back into K per-fold host trees."""
    host = jax.tree_util.tree_map(np.asarray, stacked)
    return [
        jax.tree_util.tree_map(lambda x: x[k], host) for k in range(k_folds)
    ]


def make_foldwise_train_step(
    forward_train: Callable,
    optimizer,
    augment_fn: Callable,
    mesh: Mesh,
    label_smoothing: float = 0.0,
    mix_fn=None,
):
    """vmap the shared single-fold train-step body over a leading fold axis
    and shard that axis over the mesh's 'fold' dimension (each fold's batch
    over 'data').

    Returns jitted ``step(variables, opt_state, images_u8 (K,B,S,S,3),
    labels (K,B), combos (K,B), keys (K,2), active (K,)) -> (variables,
    opt_state, losses (K,))`` where every state leaf carries a leading K.
    ``active`` masks finished folds: their state is returned unchanged
    (a zero-grad step would still decay momentum and move BN stats).
    """
    from ..train.train_loop import make_train_step_body

    body = make_train_step_body(forward_train, optimizer, augment_fn,
                                 label_smoothing, mix_fn=mix_fn)

    def masked(variables, opt_state, images_u8, labels, combos, key, active):
        new_v, new_o, loss = body(
            variables, opt_state, images_u8, labels, combos, key
        )
        keep = lambda new, old: jnp.where(active, new, old)
        new_v = jax.tree_util.tree_map(keep, new_v, variables)
        new_o = jax.tree_util.tree_map(keep, new_o, opt_state)
        return new_v, new_o, loss

    vstep = jax.vmap(masked)

    # The fold axis goes through shard_map (manual), NOT plain GSPMD
    # annotations: jax 0.9.0's partitioner MISCOMPILES a vmapped 1x1
    # conv_general_dilated whose vmap axis is sharded (minimal repro: 40%
    # wrong values on the XLA:CPU mesh; 3x3 convs and batch-dim sharding are
    # unaffected). Inside shard_map each shard runs the ordinary vmapped
    # body over its local folds, so the partitioner never sees the grouped
    # conv. The 'data' axis stays AUTO (``axis_names={fold}``): GSPMD still
    # shards every fold's batch over it and inserts the cross-shard
    # reductions BatchNorm's batch statistics need.
    spec = P(FOLD_AXIS)
    sharded = jax.shard_map(
        vstep,
        mesh=mesh,
        in_specs=(spec,) * 7,
        out_specs=(spec, spec, spec),
        axis_names={FOLD_AXIS},
        check_vma=False,
    )

    fold = NamedSharding(mesh, spec)
    batch = NamedSharding(mesh, P(FOLD_AXIS, DATA_AXIS))
    return jax.jit(
        sharded,
        in_shardings=(fold, fold, batch, batch, batch, fold, fold),
        out_shardings=(fold, fold, fold),
        donate_argnums=(0, 1),
    )


def fold_state_sharding(mesh: Mesh) -> NamedSharding:
    """Placement for fold-stacked state trees (leading dim = fold)."""
    return NamedSharding(mesh, P(FOLD_AXIS))


def train_folds_parallel(
    step,
    states: Sequence[Tuple],
    loaders: Sequence,
    num_epochs: int,
    keys: Sequence[jax.Array],
    mesh: Mesh,
    log_fn: Callable[[str], None] = print,
    verbose_batches: bool = True,
    writer=None,
) -> List[Tuple]:
    """Host lockstep loop driving ``make_foldwise_train_step``.

    ``states``: per-fold (variables, opt_state); ``loaders``: per-fold
    HostLoaders; ``keys``: per-fold train keys — each fold's PRNG stream is
    split per *its own* step exactly as the sequential ``train_epochs`` loop
    would, so the per-fold trajectories match the sequential driver.

    Emits the reference's per-batch / per-epoch loss prints per fold
    (functions_RESNET50_Truncate.py:80-86) interleaved in fold order, and
    the per-fold TensorBoard train-loss scalar. Returns per-fold trained
    (variables, opt_state) host trees.
    """
    k_folds = len(loaders)
    assert len(states) == len(keys) == k_folds
    state_sh = fold_state_sharding(mesh)
    batch_sh = NamedSharding(mesh, P(FOLD_AXIS, DATA_AXIS))
    stacked_v = jax.device_put(
        stack_fold_states([v for v, _ in states]), state_sh
    )
    stacked_o = jax.device_put(
        stack_fold_states([o for _, o in states]), state_sh
    )
    keys = list(keys)
    n_batches = [len(l) for l in loaders]
    zero_key = jnp.zeros_like(jax.random.PRNGKey(0))

    for epoch in range(num_epochs):
        iters = [iter(l) for l in loaders]
        batch_idx = [0] * k_folds
        running = [0.0] * k_folds
        seen = [0] * k_folds
        dummy = None
        while True:
            raw, subs = [], []
            active = np.zeros(k_folds, dtype=bool)
            for k in range(k_folds):
                b = next(iters[k], None)
                raw.append(b)
                if b is None:
                    subs.append(zero_key)
                    continue
                keys[k], sub = jax.random.split(keys[k])
                subs.append(sub)
                active[k] = True
            if not active.any():
                break
            if dummy is None:
                first = next(b for b in raw if b is not None)
                dummy = {
                    "image": np.zeros_like(first["image"]),
                    "label": np.full_like(first["label"], -1),
                    "combo": np.zeros_like(first["combo"]),
                    "n_valid": 0,
                }
            batches = [b if b is not None else dummy for b in raw]
            images = jax.device_put(
                np.stack([b["image"] for b in batches]), batch_sh
            )
            labels = jax.device_put(
                np.stack([b["label"] for b in batches]), batch_sh
            )
            combos = jax.device_put(
                np.stack([b["combo"] for b in batches]), batch_sh
            )
            stacked_v, stacked_o, losses = step(
                stacked_v,
                stacked_o,
                images,
                labels,
                combos,
                jnp.stack(subs),
                np.asarray(active),
            )
            losses_np = np.asarray(losses)
            for k in range(k_folds):
                if not active[k]:
                    continue
                loss_f = float(losses_np[k])
                n = batches[k]["n_valid"]
                running[k] += loss_f * n
                seen[k] += n
                if verbose_batches:
                    log_fn(
                        f"Fold {k}, Epoch [{epoch + 1}/{num_epochs}], "
                        f"Batch [{batch_idx[k] + 1}/{n_batches[k]}], "
                        f"Loss: {loss_f:.4f}"
                    )
                batch_idx[k] += 1
        for k in range(k_folds):
            epoch_loss = running[k] / max(seen[k], 1)
            log_fn(
                f"Fold {k}, Epoch [{epoch + 1}/{num_epochs}], "
                f"Loss: {epoch_loss:.4f}"
            )
            if writer is not None:
                writer.add_scalar(f"Fold_{k}/Train/Loss", epoch_loss, epoch)

    trained_v = unstack_fold_state(stacked_v, k_folds)
    trained_o = unstack_fold_state(stacked_o, k_folds)
    return list(zip(trained_v, trained_o))
