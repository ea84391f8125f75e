"""Jitted train/eval steps + epoch loops (the engine collapsing the
reference's three copy-paste train/eval verticals, SURVEY.md §2.2 E1/E2).

TPU design:
- One compiled ``train_step``: on-device augmentation -> forward -> CE loss ->
  grads -> SGD update -> BN running-stat merge, with donated carry
  (variables, opt_state) so XLA updates parameters in place in HBM.
- Batches are fixed-shape (HostLoader pads); pad entries carry label -1 and
  are masked out of the loss/metrics, so there is exactly one compilation.
- Data parallelism: pass a ``Mesh`` — inputs get sharded along the batch axis,
  variables replicated; XLA inserts the gradient all-reduce over ICI.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.augment import eval_preprocess
from .optim import BN_STAT_KEYS, _leaf_name


def _merge_bn_stats(variables, new_variables):
    """Copy mean/var leaves from the forward's updated tree, keep the
    optimiser-updated values for everything else."""

    def pick(path, old_leaf, new_leaf):
        return new_leaf if _leaf_name(path) in BN_STAT_KEYS else old_leaf

    return jax.tree_util.tree_map_with_path(pick, variables, new_variables)


def _masked_nll_parts(logits: jax.Array, labels: jax.Array,
                      label_smoothing: float = 0.0):
    """(unnormalised masked NLL sum, valid count) — the two accumulable
    pieces of ``masked_cross_entropy``: summing each over micro-batches and
    dividing at the end reproduces the GLOBAL masked mean exactly, even when
    pad entries (-1) land unevenly across micro-batches.

    ``label_smoothing`` follows torch.nn.functional.cross_entropy semantics
    (target = (1-eps)*one_hot + eps/C): per-sample loss becomes
    (1-eps)*(-logp[y]) + eps*mean_c(-logp[c])."""
    ctype = jnp.float64 if logits.dtype == jnp.float64 else jnp.float32
    valid = (labels >= 0).astype(ctype)
    logp = jax.nn.log_softmax(logits.astype(ctype), axis=-1)
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    ll = jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    if label_smoothing:
        eps = float(label_smoothing)
        ll = (1.0 - eps) * ll + eps * jnp.mean(logp, axis=-1)
    return -jnp.sum(ll * valid), jnp.sum(valid)


def masked_cross_entropy(logits: jax.Array, labels: jax.Array,
                         label_smoothing: float = 0.0) -> jax.Array:
    """Mean CE over entries with label >= 0 (pad entries are -1).

    Computed in f32 (bf16 logits are upcast), except f64 logits stay f64 —
    the pipeline-parallel equality tests compare schedules at f64 exactness
    (tests/test_pipeline.py)."""
    nll, cnt = _masked_nll_parts(logits, labels, label_smoothing)
    return nll / jnp.maximum(cnt, 1.0)


def make_train_step_body(
    forward_train: Callable,
    optimizer: optax.GradientTransformation,
    augment_fn: Callable,
    label_smoothing: float = 0.0,
    mix_fn: Optional[Callable] = None,
) -> Callable:
    """The single-step training computation shared by make_train_step,
    make_train_step_multi, and bench.py's train measurement — one definition
    so the measured program IS the shipped program.

    ``mix_fn`` (train/mixing.make_mix_fn — Mixup/CutMix) mixes the augmented
    batch and the loss becomes ``lam * CE(y) + (1-lam) * CE(y_partner)``;
    its key is fold_in-derived so the augmentation stream is unchanged.

    body(variables, opt_state, images_u8, labels, combos, key) ->
    (variables, opt_state, loss)."""

    def body(variables, opt_state, images_u8, labels, combos, key):
        images = augment_fn(images_u8, combos, key)
        if mix_fn is not None:
            from .mixing import mix_key_from

            images, labels_a, labels_b, lam = mix_fn(
                images, labels, mix_key_from(key)
            )

        def loss_fn(v):
            logits, new_v = forward_train(v, images)
            if mix_fn is not None:
                loss = (
                    lam * masked_cross_entropy(logits, labels_a, label_smoothing)
                    + (1.0 - lam)
                    * masked_cross_entropy(logits, labels_b, label_smoothing)
                )
            else:
                loss = masked_cross_entropy(logits, labels, label_smoothing)
            return loss, new_v

        (loss, new_v), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        updates, opt_state = optimizer.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        if new_v is not None:
            variables = _merge_bn_stats(variables, new_v)
        return variables, opt_state, loss

    return body


def make_train_step(
    forward_train: Callable,
    optimizer: optax.GradientTransformation,
    augment_fn: Callable,
    mesh: Optional[Mesh] = None,
    opt_sharding=None,
    label_smoothing: float = 0.0,
    mix_fn: Optional[Callable] = None,
):
    """forward_train(variables, images) -> (logits, new_variables).

    ``opt_sharding`` (a sharding tree for the optimiser state, e.g. from
    ``parallel.sharding.zero1_state_shardings``) stores the state sharded —
    ZeRO-1 — instead of replicated; jit reshards the initial state on first
    call and keeps it sharded thereafter.

    Returns jitted step(variables, opt_state, images_u8, labels, combos, key)
    -> (variables, opt_state, loss).
    """
    step = make_train_step_body(forward_train, optimizer, augment_fn,
                                label_smoothing, mix_fn=mix_fn)

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        osh = repl if opt_sharding is None else opt_sharding
        return jax.jit(
            step,
            in_shardings=(repl, osh, data, data, data, repl),
            out_shardings=(repl, osh, repl),
            donate_argnums=(0, 1),
        )
    return jax.jit(step, donate_argnums=(0, 1))


def make_train_step_accum(
    forward_train: Callable,
    optimizer: optax.GradientTransformation,
    augment_fn: Callable,
    n_accum: int,
    mesh: Optional[Mesh] = None,
    opt_sharding=None,
    label_smoothing: float = 0.0,
    mix_fn: Optional[Callable] = None,
):
    """Gradient accumulation: one optimiser step from ``n_accum``
    sequentially-computed micro-batch gradients — the big-effective-batch
    step when activations for the full batch don't fit in HBM.

    Same signature/semantics surface as ``make_train_step`` with the batch
    axis B split into n_accum micro-batches of B/n_accum (B must divide):

    - the FULL batch is augmented up front with the same key stream as the
      plain step, so the pixels fed to the model are identical;
    - gradients of the unnormalised masked NLL and the valid counts are
      accumulated across micro-batches and normalised once at the end, so
      the loss/grads equal the plain full-batch step exactly up to f32
      reassociation for batch-stat-free models (tested at 1e-6);
    - BatchNorm models get micro-batch statistics (each micro-batch
      normalises by its own batch stats — the same ghost-BN semantics as
      the pipeline-parallel microbatch schedule, parallel/pipeline.py),
      with the running stats chained through the scan in sequence. Only
      the stat leaves ride the scan carry (params are loop constants —
      the pipeline-parallel lesson, PERF.md).

    Returns jitted step(variables, opt_state, images_u8, labels, combos,
    key) -> (variables, opt_state, loss).
    """
    n_accum = int(n_accum)

    def body(variables, opt_state, images_u8, labels, combos, key):
        images = augment_fn(images_u8, combos, key)  # full batch, plain keys
        # Mixup/CutMix on the FULL batch (same pixels as the plain step);
        # rolling makes the partner label multiset equal the batch's, so
        # both CE terms share ONE global valid count and the accumulated
        # unnormalised sum still reproduces the exact mixed masked mean
        labels_b, lam = labels, None
        if mix_fn is not None:
            from .mixing import mix_key_from

            images, labels, labels_b, lam = mix_fn(
                images, labels, mix_key_from(key)
            )
        b = images.shape[0]
        if b % n_accum:
            raise ValueError(f"batch {b} not divisible by n_accum {n_accum}")
        mb = b // n_accum
        imgs = images.reshape((n_accum, mb) + images.shape[1:])
        labs = labels.reshape(n_accum, mb)
        labs_b = labels_b.reshape(n_accum, mb)

        # stat leaves are carried; everything else is a scan constant
        flat, _ = jax.tree_util.tree_flatten_with_path(variables)
        stat_idx = [
            i for i, (p, _) in enumerate(flat)
            if _leaf_name(p) in BN_STAT_KEYS
        ]

        def insert_stats(tree, stat_leaves):
            leaves, treedef = jax.tree_util.tree_flatten(tree)
            for i, leaf in zip(stat_idx, stat_leaves):
                leaves[i] = leaf
            return jax.tree_util.tree_unflatten(treedef, leaves)

        def extract_stats(tree):
            leaves = jax.tree_util.tree_leaves(tree)
            return [leaves[i] for i in stat_idx]

        def micro(carry, xs):
            stats, g_acc, nll_acc, cnt_acc = carry
            im, lb, lb_b = xs

            def nll_fn(v):
                logits, new_v = forward_train(insert_stats(v, stats), im)
                nll, cnt = _masked_nll_parts(logits, lb, label_smoothing)
                if lam is not None:
                    nll_b, _ = _masked_nll_parts(logits, lb_b, label_smoothing)
                    nll = lam * nll + (1.0 - lam) * nll_b
                return nll, (cnt, new_v)

            (nll, (cnt, new_v)), g = jax.value_and_grad(
                nll_fn, has_aux=True
            )(variables)
            if new_v is not None and stat_idx:
                stats = extract_stats(new_v)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            return (stats, g_acc, nll_acc + nll, cnt_acc + cnt), None

        g0 = jax.tree_util.tree_map(jnp.zeros_like, variables)
        (stats, g_sum, nll, cnt), _ = jax.lax.scan(
            micro,
            (extract_stats(variables), g0, jnp.zeros(()), jnp.zeros(())),
            (imgs, labs, labs_b),
        )
        denom = jnp.maximum(cnt, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / denom, g_sum)
        loss = nll / denom
        updates, opt_state = optimizer.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        variables = insert_stats(variables, stats)
        return variables, opt_state, loss

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        osh = repl if opt_sharding is None else opt_sharding
        return jax.jit(
            body,
            in_shardings=(repl, osh, data, data, data, repl),
            out_shardings=(repl, osh, repl),
            donate_argnums=(0, 1),
        )
    return jax.jit(body, donate_argnums=(0, 1))


def make_train_step_multi(
    forward_train: Callable,
    optimizer: optax.GradientTransformation,
    augment_fn: Callable,
    mesh: Optional[Mesh] = None,
    opt_sharding=None,
    label_smoothing: float = 0.0,
    mix_fn: Optional[Callable] = None,
):
    """K train steps per dispatch: inputs stacked on a leading steps axis and
    scanned on-device, so per-dispatch host latency (a ~30 ms RTT when the
    TPU sits behind a network relay) is amortised over K steps.

    Semantics are identical to K single dispatches: ``keys`` is the (K, 2)
    stack of the per-batch PRNG keys the host loop would have passed, so the
    augmentation stream and losses match the one-step path bit for bit.

    Returns jitted multi(variables, opt_state, images_u8 (K,B,H,W,3),
    labels (K,B), combos (K,B), keys (K,2)) -> (variables, opt_state,
    losses (K,)). jit specialises on K from the input shape.
    """

    step = make_train_step_body(forward_train, optimizer, augment_fn,
                                label_smoothing, mix_fn=mix_fn)

    def body(carry, xs):
        variables, opt_state = carry
        images_u8, labels, combos, key = xs
        variables, opt_state, loss = step(
            variables, opt_state, images_u8, labels, combos, key
        )
        return (variables, opt_state), loss

    def multi(variables, opt_state, images_u8, labels, combos, keys):
        (variables, opt_state), losses = jax.lax.scan(
            body, (variables, opt_state), (images_u8, labels, combos, keys)
        )
        return variables, opt_state, losses

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(None, "data"))  # (steps, batch, ...)
        osh = repl if opt_sharding is None else opt_sharding
        return jax.jit(
            multi,
            in_shardings=(repl, osh, data, data, data, repl),
            out_shardings=(repl, osh, repl),
            donate_argnums=(0, 1),
        )
    return jax.jit(multi, donate_argnums=(0, 1))


def make_eval_step(
    forward_eval: Callable,
    mesh: Optional[Mesh] = None,
    crop: int = 224,
):
    """forward_eval(variables, images) -> logits. Returns jitted
    step(variables, images_u8, labels) -> (per_example_loss, probs, preds)."""

    def step(variables, images_u8, labels):
        images = eval_preprocess(images_u8, crop)
        logits = forward_eval(variables, images)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
        loss = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
        probs = jnp.exp(logp)
        preds = jnp.argmax(logits, axis=-1)
        return loss, probs, preds

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, data, data),
            out_shardings=(data, data, data),
        )
    return jax.jit(step)


def device_prefetch(loader, mesh: Optional[Mesh] = None, depth: int = 2):
    """Async-transfer batches ahead of consumption: jax.device_put is
    non-blocking, so the next batch's H2D overlaps the current step's compute
    (the jit transfer would otherwise serialise on the relay/PCIe)."""
    sharding = NamedSharding(mesh, P("data")) if mesh is not None else None

    def put(batch):
        out = dict(batch)
        for k in ("image", "label", "combo"):
            out[k] = (
                jax.device_put(batch[k], sharding)
                if sharding is not None
                else jax.device_put(batch[k])
            )
        return out

    pending = []
    for batch in loader:
        pending.append(put(batch))
        if len(pending) >= depth:
            yield pending.pop(0)
    yield from pending


def train_epochs(
    train_step,
    variables,
    opt_state,
    loader,
    num_epochs: int,
    key: jax.Array,
    fold: int = 0,
    log_fn: Callable[[str], None] = print,
    writer=None,
    verbose_batches: bool = True,
    mesh: Optional[Mesh] = None,
    train_step_multi: Optional[Callable] = None,
    steps_per_dispatch: int = 1,
    start_epoch: int = 0,
    on_epoch_end: Optional[Callable] = None,
    preemptible: bool = False,
):
    """Reference train loop semantics (functions_RESNET50_Truncate.py:63-87):
    per-batch loss prints, per-epoch mean loss (+ optional TB scalar).

    ``steps_per_dispatch`` > 1 (with ``train_step_multi``) stacks that many
    batches per device dispatch and scans them on-device — same RNG stream
    and losses, ~1/K the host/relay round trips. The tail chunk of an epoch
    compiles once at its own (smaller) K.

    Resume support: ``start_epoch`` skips already-completed epochs (the
    caller restores variables/opt_state/key from the checkpoint and seeks
    the loader with ``set_epoch``); ``on_epoch_end(epoch, variables,
    opt_state, key)`` fires after every epoch — the key passed is exactly
    the state the next epoch continues from, so a resumed run is
    bit-identical to an uninterrupted one. A truthy return from
    ``on_epoch_end`` stops the epoch loop (early stopping,
    train/early_stop.py); the current state is returned."""
    n_batches = len(loader)
    use_multi = train_step_multi is not None and steps_per_dispatch > 1
    sharding = NamedSharding(mesh, P(None, "data")) if mesh is not None else None
    for epoch in range(start_epoch, num_epochs):
        running, seen = 0.0, 0

        def emit(batch_idx, loss_f, n):
            nonlocal running, seen
            running += loss_f * n
            seen += n
            if verbose_batches:
                log_fn(
                    f"Fold {fold}, Epoch [{epoch + 1}/{num_epochs}], "
                    f"Batch [{batch_idx + 1}/{n_batches}], Loss: {loss_f:.4f}"
                )

        # preemption (SIGTERM on a preemptible fleet): stop BEFORE the next
        # dispatch — the partial epoch is discarded by design (resume is
        # epoch-granular and bit-identical), so the exit is immediate and
        # `epoch` epochs are durable on disk (train/preemption.py).
        # Only honoured when the caller actually writes resumable
        # checkpoints (preemptible=True, i.e. run_kfold(resume=True)) —
        # PreemptedError's "progress is checkpointed" promise would be a
        # lie in a non-resume run
        from .preemption import PreemptedError, preemption_requested

        def check_preempt():
            if preemptible and preemption_requested():
                raise PreemptedError(fold, epoch)

        if use_multi:
            chunk = []
            batch_idx = 0
            for batch in loader:
                key, sub = jax.random.split(key)
                chunk.append((batch, sub))
                if len(chunk) < steps_per_dispatch:
                    continue
                check_preempt()
                variables, opt_state, batch_idx = _dispatch_chunk(
                    train_step_multi, variables, opt_state, chunk,
                    batch_idx, emit, sharding,
                )
                chunk = []
            if chunk:
                check_preempt()
                variables, opt_state, batch_idx = _dispatch_chunk(
                    train_step_multi, variables, opt_state, chunk,
                    batch_idx, emit, sharding,
                )
        else:
            for batch_idx, batch in enumerate(device_prefetch(loader, mesh)):
                check_preempt()
                key, sub = jax.random.split(key)
                variables, opt_state, loss = train_step(
                    variables,
                    opt_state,
                    batch["image"],
                    batch["label"],
                    batch["combo"],
                    sub,
                )
                emit(batch_idx, float(loss), batch["n_valid"])
        epoch_loss = running / max(seen, 1)
        log_fn(f"Fold {fold}, Epoch [{epoch + 1}/{num_epochs}], Loss: {epoch_loss:.4f}")
        if writer is not None:
            writer.add_scalar(f"Fold_{fold}/Train/Loss", epoch_loss, epoch)
        if on_epoch_end is not None:
            if on_epoch_end(epoch, variables, opt_state, key):
                break
    return variables, opt_state


def _dispatch_chunk(train_step_multi, variables, opt_state, chunk,
                    batch_idx, emit, sharding):
    """Stack a chunk of host batches (each paired with its already-split
    PRNG key), ship once, scan on-device, emit the per-batch losses with the
    same prints as the one-step path."""
    batches = [b for b, _ in chunk]
    keys = jnp.stack([k for _, k in chunk])
    images = np.stack([b["image"] for b in batches])
    labels = np.stack([b["label"] for b in batches])
    combos = np.stack([b["combo"] for b in batches])
    if sharding is not None:
        images = jax.device_put(images, sharding)
        labels = jax.device_put(labels, sharding)
        combos = jax.device_put(combos, sharding)
    variables, opt_state, losses = train_step_multi(
        variables, opt_state, images, labels, combos, keys
    )
    for loss_f, b in zip(np.asarray(losses).tolist(), batches):
        emit(batch_idx, loss_f, b["n_valid"])
        batch_idx += 1
    return variables, opt_state, batch_idx


def evaluate(
    eval_step,
    variables,
    loader,
    num_classes: int,
    fold: int = 0,
    log_fn: Callable[[str], None] = print,
    writer=None,
    step: int = 0,
) -> Dict[str, float]:
    """Reference eval loop semantics (functions_RESNET50_Truncate.py:89-122).

    Deviation (deliberate, SURVEY §2.5): the reference's validation
    ``add_scalar`` calls omit the step argument
    (functions_RESNET50_Truncate.py:117-121) so TB collapses every write to
    step 0 — here the caller passes ``step`` (the final epoch index) and all
    five reference tags (Loss/Accuracy/Precision/Recall/F1) carry it."""
    from ..metrics.classification import classification_metrics

    losses, all_preds, all_labels = [], [], []
    for batch in loader:
        loss, probs, preds = eval_step(variables, batch["image"], batch["label"])
        n = batch["n_valid"]
        losses.append(np.asarray(loss)[:n])
        all_preds.append(np.asarray(preds)[:n])
        all_labels.append(batch["label"][:n])
    losses = np.concatenate(losses)
    preds = np.concatenate(all_preds)
    labels = np.concatenate(all_labels)
    m = classification_metrics(labels, preds, num_classes)
    out = {
        "val_loss": float(losses.mean()),
        "val_accuracy": float((preds == labels).mean()),
        "val_precision": float(m["precision"]),
        "val_recall": float(m["recall"]),
        "val_f1": float(m["f1"]),
    }
    log_fn(
        f"Fold {fold}, Validation Loss: {out['val_loss']:.4f}, "
        f"Accuracy: {out['val_accuracy']:.4f}, Precision: {out['val_precision']:.4f}, "
        f"Recall: {out['val_recall']:.4f}, F1 Score: {out['val_f1']:.4f}"
    )
    if writer is not None:
        writer.add_scalar(f"Fold_{fold}/Validation/Loss", out["val_loss"], step)
        writer.add_scalar(f"Fold_{fold}/Validation/Accuracy", out["val_accuracy"], step)
        writer.add_scalar(f"Fold_{fold}/Validation/Precision", out["val_precision"], step)
        writer.add_scalar(f"Fold_{fold}/Validation/Recall", out["val_recall"], step)
        writer.add_scalar(f"Fold_{fold}/Validation/F1", out["val_f1"], step)
    return out
