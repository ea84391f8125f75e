"""Fast (feed-forward) style transfer: train once per style, stylise in one
forward pass.

Beyond parity. The reference stylises by per-image pixel optimisation only
(functions/functions_RESNET50_Turncate_Gram_Attention — see
tasks/style_transfer.py for the faithful rebuild); this module trains a
small residual conv net (nn/transformer_net.py) against the SAME loss the
iterative content+style loop minimises — Gram MSE on the truncated encoder's
stages + content-feature MSE + optional TV — so a trained net replaces ~500
Adam iterations per image with one forward (~3 orders of magnitude serving
throughput for a fixed style; measured numbers in PERF.md).

TPU shape:
- ONE jitted donated-carry train step: on-device eval_preprocess (uint8
  batches over the wire), transformer net forward, frozen-encoder
  feature/Gram extraction for both the stylised output and the content
  target, Adam update. The encoder is the same `extract_fn` the iterative
  loop uses (`make_extract_fn_gram_attention`) — one builder, three
  consumers.
- `mesh=` batch-shards the step over 'data' (net params replicated, grads
  all-reduced by GSPMD) — the standard DP recipe shared with the train CLIs.
- bf16 via the extract_fn's / net's `compute_dtype` (losses and Adam f32).
"""
from __future__ import annotations

import time
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nn.transformer_net import net_n_styles, transformer_net_apply
from .style_transfer import total_variation


def _make_optimizer(learning_rate, clip_norm=None):
    """Adam whose ``learning_rate`` may be a float OR an optax schedule
    (train/schedules.make_lr_schedule — the count lives in the optimiser
    state, so a resumed run continues the curve bit-identically); optional
    global-norm gradient clipping chained before it, same semantics as the
    family train CLIs' ``--clip_grad_norm``."""
    tx = optax.adam(learning_rate)
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(float(clip_norm)), tx)
    return tx


def make_fast_style_train_step(
    extract_fn: Callable,
    *,
    style_weight: float = 1.0,
    content_weight: float = 1.0,
    tv_weight: float = 0.0,
    learning_rate: float = 1e-3,
    crop: int = 224,
    compute_dtype=None,
    mesh=None,
    clip_norm=None,
) -> Tuple[Callable, Callable]:
    """Build (init_opt_state, step).

    ``step(params, opt_state, images_u8, style_grams) ->
    (params, opt_state, loss)`` — params/opt_state donated, images uint8
    (B, H, W, 3) staged crops, ``style_grams`` the per-layer target list
    from the style image (leading dim 1, broadcast against the batch).
    """
    from ..data.augment import eval_preprocess

    adam = _make_optimizer(learning_rate, clip_norm)
    sw, cw, tw = float(style_weight), float(content_weight), float(tv_weight)

    def loss_fn(params, images, style_grams):
        content_feats = jax.lax.stop_gradient(
            extract_fn(images)[0].astype(jnp.float32)
        )
        # the gradient path: always the XLA composition (the pallas IN
        # kernel is forward-only — no VJP), immune to HST_NET_IN_BACKEND
        stylised = transformer_net_apply(params, images, compute_dtype,
                                         in_backend="xla")
        feats, grams = extract_fn(stylised)
        style = 0.0
        for g, t in zip(grams, style_grams):
            style = style + jnp.mean(
                jnp.square(g.astype(jnp.float32) - t.astype(jnp.float32))
            )
        content = jnp.mean(
            jnp.square(feats.astype(jnp.float32) - content_feats)
        )
        loss = sw * style + cw * content
        if tw != 0.0:
            loss = loss + tw * jnp.mean(total_variation(stylised))
        return loss

    def step(params, opt_state, images_u8, style_grams):
        images = eval_preprocess(images_u8, crop)
        loss, grads = jax.value_and_grad(loss_fn)(params, images, style_grams)
        updates, opt_state = adam.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        jit_step = jax.jit(
            step,
            in_shardings=(repl, repl, data, repl),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )
    else:
        jit_step = jax.jit(step, donate_argnums=(0, 1))
    return adam.init, jit_step


def encode_style_grams(
    extract_fn: Callable, style_u8: np.ndarray, crop: int = 224
) -> List[jax.Array]:
    """Per-layer f32 target Grams of one style image, leading dim 1."""
    from ..data.augment import eval_preprocess
    from .style_service import _to_canvas

    canvas = _to_canvas(np.asarray(style_u8), crop)[None]

    def encode(u8):
        return [g.astype(jnp.float32) for g in extract_fn(eval_preprocess(u8, crop))[1]]

    return [jnp.asarray(g) for g in jax.jit(encode)(canvas)]


def encode_style_gram_stacks(
    extract_fn: Callable, styles_u8, crop: int = 224
) -> List[jax.Array]:
    """Per-layer f32 (S, ...) target-Gram stacks for a style gallery
    (sequence of uint8 images) — ONE encoder dispatch, device-resident; the
    same shape the style service keeps (tasks/style_service.py)."""
    from ..data.augment import eval_preprocess
    from .style_service import _to_canvas

    canvas = np.stack([_to_canvas(np.asarray(s), crop) for s in styles_u8])

    def encode(u8):
        return [g.astype(jnp.float32) for g in extract_fn(eval_preprocess(u8, crop))[1]]

    return [jnp.asarray(g) for g in jax.jit(encode)(canvas)]


def make_multi_style_train_step(
    extract_fn: Callable,
    *,
    style_weight: float = 1.0,
    content_weight: float = 1.0,
    tv_weight: float = 0.0,
    learning_rate: float = 1e-3,
    crop: int = 224,
    compute_dtype=None,
    mesh=None,
    clip_norm=None,
) -> Tuple[Callable, Callable]:
    """Conditional-net counterpart of :func:`make_fast_style_train_step`.

    ``step(params, opt_state, images_u8, style_w, gram_stacks) ->
    (params, opt_state, loss)`` — ``style_w`` is the per-image (B, S)
    one-hot (or blend) row selecting both the net's conditional
    instance-norm affines AND the target Grams (``style_w @ stack`` per
    layer, one contraction); ``gram_stacks`` the device-resident (S, ...)
    list from :func:`encode_style_gram_stacks`."""
    from ..data.augment import eval_preprocess

    adam = _make_optimizer(learning_rate, clip_norm)
    sw_, cw, tw = float(style_weight), float(content_weight), float(tv_weight)

    def loss_fn(params, images, style_w, gram_stacks):
        content_feats = jax.lax.stop_gradient(
            extract_fn(images)[0].astype(jnp.float32)
        )
        stylised = transformer_net_apply(
            params, images, compute_dtype, style_weights=style_w,
            in_backend="xla",  # gradient path: pallas IN has no VJP
        )
        feats, grams = extract_fn(stylised)
        style = 0.0
        for g, stack in zip(grams, gram_stacks):
            target = jnp.einsum(
                "bk,k...->b...", style_w.astype(jnp.float32),
                stack.astype(jnp.float32),
            )
            style = style + jnp.mean(
                jnp.square(g.astype(jnp.float32) - target)
            )
        content = jnp.mean(
            jnp.square(feats.astype(jnp.float32) - content_feats)
        )
        loss = sw_ * style + cw * content
        if tw != 0.0:
            loss = loss + tw * jnp.mean(total_variation(stylised))
        return loss

    def step(params, opt_state, images_u8, style_w, gram_stacks):
        images = eval_preprocess(images_u8, crop)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, images, style_w, gram_stacks
        )
        updates, opt_state = adam.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        jit_step = jax.jit(
            step,
            in_shardings=(repl, repl, data, data, repl),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )
    else:
        jit_step = jax.jit(step, donate_argnums=(0, 1))
    return adam.init, jit_step


_INPROGRESS_NET = "_inprogress_style_net.npz"


def style_net_signature(hyperparameters: dict) -> str:
    """Identity of a style-net fit (resume safety): resuming under different
    styles/weights/net shape would silently stitch old state into a new
    run, so the full hyperparameter dict is the signature (same recipe as
    train/kfold._run_signature)."""
    import json

    return json.dumps(hyperparameters, sort_keys=True, default=str)


def _save_net_inprogress(save_dir, params, opt_state, epoch, step_in_epoch,
                         seen, history, signature, async_writer=None):
    """ONE atomic artifact per checkpoint: net params + flattened optimiser
    leaves + the exact position (epoch, batches consumed within it, global
    step) + the loss history so far + the run signature. Position and state
    in the same file — no crash window pairs step-N weights with a step-M
    position."""
    import os

    from ..checkpoint.io import save_pytree_npz

    tree = {
        "params": params,
        "opt_leaves": list(jax.tree_util.tree_leaves(opt_state)),
        "epoch": int(epoch),
        "step_in_epoch": int(step_in_epoch),
        "seen": int(seen),
        "history": np.asarray(history, np.float64),
        "signature": np.asarray(signature),
    }
    path = os.path.join(save_dir, _INPROGRESS_NET)
    if async_writer is not None:
        async_writer.submit(tree, path)  # device snapshot; write overlapped
    else:
        save_pytree_npz(tree, path)


def _load_net_inprogress(save_dir, signature):
    import os

    from ..checkpoint.io import load_pytree_npz

    path = os.path.join(save_dir, _INPROGRESS_NET)
    if not os.path.exists(path):
        return None
    st = load_pytree_npz(path, as_jax=False)
    found = str(np.asarray(st["signature"]))
    if found != signature:
        raise ValueError(
            "--resume: this run's configuration does not match the "
            "interrupted run's (styles/weights/net shape/epochs differ).\n"
            f"  was: {found}\n  now: {signature}"
        )
    return st


def clear_net_inprogress(save_dir) -> None:
    import os

    p = os.path.join(save_dir, _INPROGRESS_NET)
    if os.path.exists(p):
        os.unlink(p)


def _drive_net_training(
    dispatch: Callable,
    init_opt: Callable,
    net_params: dict,
    loader,
    *,
    epochs: int,
    log_fn,
    log_every: int,
    label: str,
    save_dir=None,
    resume: bool = False,
    checkpoint_every: int = 200,
    async_checkpoint: bool = False,
    signature=None,
) -> Tuple[dict, List[float]]:
    """Shared resilient loop behind train_fast_style / train_multi_style.

    ``dispatch(params, opt_state, images_u8, seen)`` runs ONE jitted step.
    With ``resume=True`` (requires ``save_dir``): a SIGTERM is honoured at
    the next batch boundary — the exact position is checkpointed and
    PreemptedError raised (the CLI exits 0 with the resume hint) — and an
    in-progress checkpoint is written every ``checkpoint_every`` steps and
    at each epoch end; rerunning with the same configuration continues
    BIT-IDENTICALLY (the loader replays the interrupted epoch's order and
    skips the consumed batches without decoding them —
    HostLoader.set_position). ``async_checkpoint`` overlaps the writes with
    training (checkpoint/async_io; snapshot at submit, donation-safe)."""
    from ..train.preemption import (
        PreemptedError,
        clear_preemption,
        install_sigterm_handler,
        preemption_requested,
    )

    acw = None
    clear_preemption()  # stale flag from an earlier run in this process
    if resume:
        if save_dir is None:
            raise ValueError("resume=True requires save_dir")
        install_sigterm_handler()
        if async_checkpoint:
            from ..checkpoint.async_io import AsyncCheckpointWriter

            acw = AsyncCheckpointWriter()

    opt_state = init_opt(net_params)
    params = net_params
    history: List[float] = []
    start_epoch = start_step = seen = 0
    if resume:
        st = _load_net_inprogress(save_dir, signature)
        if st is not None:
            params = st["params"]
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(opt_state), st["opt_leaves"]
            )
            start_epoch = int(st["epoch"])
            start_step = int(st["step_in_epoch"])
            seen = int(st["seen"])
            history = [float(x) for x in np.asarray(st["history"]).ravel()]
            log_fn(
                f"{label}: reprise à l'epoch {start_epoch + 1} "
                f"(step {seen}, {start_step} batch(s) déjà consommés)"
            )

    def save(epoch, step_in_epoch):
        _save_net_inprogress(
            save_dir, params, opt_state, epoch, step_in_epoch, seen,
            history, signature, async_writer=acw,
        )

    loss = None
    t0 = time.perf_counter()
    try:
        for epoch in range(start_epoch, int(epochs)):
            k = start_step if epoch == start_epoch else 0
            if k:
                if not hasattr(loader, "set_position"):
                    # replaying from batch 0 would apply the consumed
                    # batches twice — fail loudly instead of silently
                    # breaking the bit-identical contract
                    raise ValueError(
                        "mid-epoch resume (step_in_epoch="
                        f"{k}) needs a loader with set_position(epoch, "
                        "skip_batches) — HostLoader has it; wrap custom "
                        f"loaders, got {type(loader).__name__}"
                    )
                loader.set_position(epoch, k)
            elif hasattr(loader, "set_epoch"):
                loader.set_epoch(epoch)
            for batch in loader:
                if resume and preemption_requested():
                    if acw is not None:
                        acw.wait()
                    save(epoch, k)
                    if acw is not None:
                        acw.wait()
                    raise PreemptedError(
                        0, epoch,
                        message=(
                            f"preempted: progress through step {seen} "
                            f"(epoch {epoch + 1}, batch {k}) is "
                            "checkpointed; rerun with --resume to continue"
                        ),
                    )
                images_u8 = (
                    batch["image"] if isinstance(batch, dict) else batch[0]
                )
                params, opt_state, loss = dispatch(
                    params, opt_state, images_u8, seen
                )
                seen += 1
                k += 1
                if seen % int(log_every) == 0 or seen == 1:
                    lv = float(loss)
                    history.append(lv)
                    log_fn(
                        f"{label} epoch {epoch + 1}/{epochs} step {seen} "
                        f"loss {lv:.6f} ({time.perf_counter() - t0:.1f}s)"
                    )
                if (
                    resume and checkpoint_every
                    and seen % int(checkpoint_every) == 0
                ):
                    save(epoch, k)
            if resume:
                save(epoch + 1, 0)
    finally:
        if acw is not None:
            acw.close()
    if seen and loss is not None:
        # one final fetch so the history always carries the end state
        history.append(float(jax.device_get(loss)))
    return params, history


def balanced_style_indices(n: int, n_styles: int, rng) -> np.ndarray:
    """Style draw for one batch: every style appears ``floor(n/S)`` or
    ``ceil(n/S)`` times, order shuffled (``rng``: numpy Generator or
    RandomState). Uniform per-image draws leave styles under-trained on
    short fits — measured r5: the weaker of two gallery styles priced 5x
    below the single-style standard partly from draw imbalance; balanced
    batches remove that variance at zero cost."""
    idx = np.tile(np.arange(n_styles), n // n_styles)
    rem = n % n_styles
    if rem:
        # the ceil-count slots go to rng-CHOSEN styles, not always the
        # low indices — truncating a tile would hand style 0.. the extra
        # draw in every batch, a systematic per-style training bias
        extra = rng.permutation(n_styles)[:rem]
        idx = np.concatenate([idx, extra])
    rng.shuffle(idx)
    return idx


def train_multi_style(
    net_params: dict,
    extract_fn: Callable,
    loader,
    styles_u8,
    *,
    epochs: int = 2,
    style_weight: float = 1.0,
    content_weight: float = 1.0,
    tv_weight: float = 0.0,
    learning_rate: float = 1e-3,
    crop: int = 224,
    compute_dtype=None,
    mesh=None,
    seed: int = 0,
    log_fn=print,
    log_every: int = 50,
    clip_norm=None,
    save_dir=None,
    resume: bool = False,
    checkpoint_every: int = 200,
    async_checkpoint: bool = False,
    signature=None,
    style_sampling: str = "balanced",
) -> Tuple[dict, List[float]]:
    """Train ONE conditional net on a gallery (``styles_u8``: sequence of
    uint8 style images, index-aligned with the net's style axis). Each
    content image trains against a style drawn per image from a host RNG
    seeded by (seed, global step) — counter-based so a resumed run draws
    the SAME styles a fresh run would have (bit-identical resume) — the
    classic CIN recipe: shared convs learn generic rendering, the
    per-style affines specialise. ``style_sampling``: ``"balanced"``
    (default — every batch covers the gallery as evenly as possible,
    shuffled; see :func:`balanced_style_indices`) or ``"uniform"`` (the
    r4 per-image uniform draw). Carry donation as in
    :func:`train_fast_style`; resume/preemption semantics in
    :func:`_drive_net_training`."""
    if style_sampling not in ("balanced", "uniform"):
        raise ValueError(
            f"style_sampling must be 'balanced' or 'uniform', got "
            f"{style_sampling!r}"
        )
    n_styles = net_n_styles(net_params)
    if n_styles is None:
        raise ValueError("train_multi_style needs a conditional net "
                         "(transformer_net_init(n_styles=S))")
    if len(styles_u8) != n_styles:
        raise ValueError(
            f"{len(styles_u8)} style images for a {n_styles}-style net"
        )
    init_opt, step = make_multi_style_train_step(
        extract_fn,
        style_weight=style_weight,
        content_weight=content_weight,
        tv_weight=tv_weight,
        learning_rate=learning_rate,
        crop=crop,
        compute_dtype=compute_dtype,
        mesh=mesh,
        clip_norm=clip_norm,
    )
    gram_stacks = encode_style_gram_stacks(extract_fn, styles_u8, crop)

    def dispatch(params, opt_state, images_u8, seen):
        rng = np.random.default_rng([seed, seen])
        n = images_u8.shape[0]
        onehot = np.zeros((n, n_styles), np.float32)
        if style_sampling == "balanced":
            idx = balanced_style_indices(n, n_styles, rng)
        else:
            idx = rng.integers(0, n_styles, size=n)
        onehot[np.arange(n), idx] = 1.0
        return step(
            params, opt_state, jnp.asarray(images_u8),
            jnp.asarray(onehot), gram_stacks,
        )

    return _drive_net_training(
        dispatch, init_opt, net_params, loader,
        epochs=epochs, log_fn=log_fn, log_every=log_every,
        label=f"fast-style ({n_styles} styles)",
        save_dir=save_dir, resume=resume,
        checkpoint_every=checkpoint_every,
        async_checkpoint=async_checkpoint, signature=signature,
    )


def train_fast_style(
    net_params: dict,
    extract_fn: Callable,
    loader,
    style_u8: np.ndarray,
    *,
    epochs: int = 2,
    style_weight: float = 1.0,
    content_weight: float = 1.0,
    tv_weight: float = 0.0,
    learning_rate: float = 1e-3,
    crop: int = 224,
    compute_dtype=None,
    mesh=None,
    log_fn=print,
    log_every: int = 50,
    clip_norm=None,
    save_dir=None,
    resume: bool = False,
    checkpoint_every: int = 200,
    async_checkpoint: bool = False,
    signature=None,
) -> Tuple[dict, List[float]]:
    """Drive the step over a content loader for ``epochs``. ``loader``
    yields HostLoader batch dicts (the "image" entry is used; labels are
    ignored — content images are unlabelled here) or plain tuples with the
    uint8 images first. Returns
    (params, per-log loss history). The step donates its carry:
    ``net_params``' buffers are consumed (keep a copy if you need the
    init). Resume/preemption semantics in :func:`_drive_net_training`."""
    init_opt, step = make_fast_style_train_step(
        extract_fn,
        style_weight=style_weight,
        content_weight=content_weight,
        tv_weight=tv_weight,
        learning_rate=learning_rate,
        crop=crop,
        compute_dtype=compute_dtype,
        mesh=mesh,
        clip_norm=clip_norm,
    )
    style_grams = encode_style_grams(extract_fn, style_u8, crop)

    def dispatch(params, opt_state, images_u8, seen):
        del seen
        return step(params, opt_state, jnp.asarray(images_u8), style_grams)

    return _drive_net_training(
        dispatch, init_opt, net_params, loader,
        epochs=epochs, log_fn=log_fn, log_every=log_every,
        label="fast-style",
        save_dir=save_dir, resume=resume,
        checkpoint_every=checkpoint_every,
        async_checkpoint=async_checkpoint, signature=signature,
    )


def _stylize_body(net_params, images_u8, crop: int, compute_dtype,
                  style_weights=None, in_backend=None):
    """uint8 staged crops -> stylised uint8, untraced (callers jit)."""
    from ..data.augment import eval_preprocess
    from ..ops.resize import IMAGENET_MEAN, IMAGENET_STD

    mean = jnp.asarray(np.asarray(IMAGENET_MEAN).reshape(1, 1, 1, 3))
    std = jnp.asarray(np.asarray(IMAGENET_STD).reshape(1, 1, 1, 3))
    images = eval_preprocess(images_u8, crop)
    out = transformer_net_apply(net_params, images, compute_dtype,
                                style_weights=style_weights,
                                in_backend=in_backend)
    canvas = jnp.clip(out.astype(jnp.float32) * std + mean, 0.0, 1.0)
    return jnp.round(canvas * 255.0).astype(jnp.uint8)


def make_stylize_fn(
    net_params: dict,
    *,
    crop: int = 224,
    compute_dtype=None,
    mesh=None,
    style_weights=None,
    in_backend=None,
) -> Callable:
    """jitted ``images_u8 (B, H, W, 3) -> stylised uint8`` single forward —
    the serving-side program (plugs into StyleTransferService as a job_fn
    via make_net_job_fn below, or is exported as an AOT artifact). For a
    conditional net ``style_weights`` ((S,) or (B, S)) fixes the style mix
    baked into this program. ``in_backend='pallas'`` selects the fused
    instance-norm kernel (forward-only; PERF.md measured it 0.83× — a
    validated alternative, not a default)."""

    def stylize(images_u8):
        return _stylize_body(net_params, images_u8, crop, compute_dtype,
                             style_weights, in_backend)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data"))
        return jax.jit(stylize, in_shardings=(data,), out_shardings=data)
    return jax.jit(stylize)


def net_quality_per_image(
    extract_fn: Callable,
    net_params: dict,
    images_u8,
    style_grams,
    *,
    crop: int = 224,
    style_weight: float = 1.0,
    content_weight: float = 1.0,
    tv_weight: float = 0.0,
    compute_dtype=None,
    style_weights=None,
) -> jax.Array:
    """Per-image achieved content+style loss of the net's ONE-pass output,
    scored by the iterative loop's exact objective
    (style_transfer.make_per_image_content_style_loss — one definition,
    both consumers). ``(B,)`` f32; compare against the loop's
    ``final_per_image_loss`` at the same weights/extract_fn to price the
    net in loop iterations."""
    from ..data.augment import eval_preprocess
    from .style_transfer import make_per_image_content_style_loss

    loss_fn = make_per_image_content_style_loss(
        extract_fn, style_weight, content_weight, tv_weight
    )
    images = eval_preprocess(images_u8, crop)
    content_feats = jax.lax.stop_gradient(
        extract_fn(images)[0].astype(jnp.float32)
    )
    stylised = transformer_net_apply(
        net_params, images, compute_dtype, style_weights=style_weights
    )
    return loss_fn(stylised, style_grams, content_feats)


def compare_net_to_loop(
    extract_fn: Callable,
    net_params: dict,
    images_u8,
    style_grams,
    *,
    crop: int = 224,
    iteration_grid=(100, 300, 500),
    style_weight: float = 1.0,
    content_weight: float = 1.0,
    tv_weight: float = 0.0,
    learning_rates=(0.01, 0.05),
    compute_dtype=None,
    style_weights=None,
    optimizer_cache: Optional[dict] = None,
) -> dict:
    """Price the one-pass net in ITERATIONS of the loop it approximates.

    On held-out content ``images_u8``, computes the net's achieved
    per-image content+style loss and the iterative loop's
    (content-initialised, full ``k`` iterations — threshold 0 disables
    early stop) at each ``k`` in ``iteration_grid``, for EVERY Adam lr in
    ``learning_rates``; both sides score the SAME objective (one shared
    loss definition). The denominator at each ``k`` is the STRONGEST loop
    in the sweep (min mean loss over lrs) — pricing against the serve
    default alone flattered the net by ~1 grid step at some lrs (PERF.md
    r4 sensitivity run). Returns::

        {"net_loss_mean", "net_loss_per_image",
         "loop_loss_mean": {k: float},           # best-of-sweep per k
         "loop_loss_per_image": {k: array},      # from the winning lr
         "loop_loss_mean_by_lr": {lr: {k: float}},
         "loop_best_lr": {k: lr},
         "learning_rates": tuple,
         "worth_iterations"}

    ``worth_iterations`` is the largest grid ``k`` whose best-of-sweep
    mean loop loss is still >= the net's mean (the net is "worth" at least
    that many iterations); 0 if even the smallest ``k`` beats the net, and
    ``max(grid)`` means the net matched or beat the deepest loop measured.

    ``optimizer_cache``: pass ONE dict across repeated calls that share
    ``extract_fn``/weights/shapes (the per-style pricing loop in
    tools/bench_fast_style_quality.py) — the len(lrs)·len(grid) jitted
    while_loop programs are then compiled once, not once per call (axon
    remote compile is 1.6 s–10 min per program; CLAUDE.md "compile once,
    reuse").
    """
    from ..data.augment import eval_preprocess
    from .style_transfer import make_content_style_optimizer

    net_per = np.asarray(
        jax.jit(
            lambda p, u8: net_quality_per_image(
                extract_fn, p, u8, style_grams,
                crop=crop, style_weight=style_weight,
                content_weight=content_weight, tv_weight=tv_weight,
                compute_dtype=compute_dtype, style_weights=style_weights,
            )
        )(net_params, jnp.asarray(images_u8))
    )

    images = jax.jit(lambda u8: eval_preprocess(u8, crop))(
        jnp.asarray(images_u8)
    )
    content_feats = jax.jit(
        lambda im: extract_fn(im)[0].astype(jnp.float32)
    )(images)
    pixels0 = images.astype(jnp.float32)
    bcast = [
        jnp.broadcast_to(g, (images.shape[0],) + g.shape[1:])
        if g.shape[0] == 1 else g
        for g in style_grams
    ]
    lrs = tuple(float(lr) for lr in learning_rates)
    by_lr = {lr: {} for lr in lrs}
    per_by_lr = {lr: {} for lr in lrs}
    for lr in lrs:
        for k in iteration_grid:
            cache_key = (lr, int(k))
            if optimizer_cache is not None and cache_key in optimizer_cache:
                optimise = optimizer_cache[cache_key]
            else:
                optimise = make_content_style_optimizer(
                    extract_fn, style_weight, content_weight, lr,
                    int(k), 0.0, tv_weight=tv_weight,
                )
                if optimizer_cache is not None:
                    optimizer_cache[cache_key] = optimise
            _, iters, per = optimise(pixels0, bcast, content_feats)
            if int(iters) != int(k):
                # threshold 0.0 can never early-stop (per >= 0); this also
                # forces the dispatch before timing-free consumers read per
                raise RuntimeError(
                    f"loop ran {int(iters)} iterations, expected the full "
                    f"cap {int(k)} (threshold-0 early stop should be "
                    "impossible — loop semantics changed?)"
                )
            per_by_lr[lr][int(k)] = np.asarray(per)
            by_lr[lr][int(k)] = float(np.mean(per_by_lr[lr][int(k)]))
    # strongest loop per k across the sweep — the honest denominator
    loop_mean, loop_per, best_lr = {}, {}, {}
    for k in (int(k) for k in iteration_grid):
        lr_star = min(lrs, key=lambda lr: by_lr[lr][k])
        best_lr[k] = lr_star
        loop_mean[k] = by_lr[lr_star][k]
        loop_per[k] = per_by_lr[lr_star][k]
    net_mean = float(np.mean(net_per))
    worth = 0
    for k in sorted(loop_mean):
        if loop_mean[k] >= net_mean:
            worth = k
    return {
        "net_loss_mean": net_mean,
        "net_loss_per_image": net_per,
        "loop_loss_mean": loop_mean,
        "loop_loss_per_image": loop_per,
        "loop_loss_mean_by_lr": by_lr,
        "loop_best_lr": best_lr,
        "learning_rates": lrs,
        "worth_iterations": worth,
    }


def make_net_job_fn(
    net_params: dict, *, crop: int = 224, compute_dtype=None,
    in_backend=None,
) -> Callable:
    """Adapt the single-forward program to StyleTransferService's job
    contract ``(images_u8, style_w, job_ids) -> (u8, iters, per_loss)``:
    iters is 1 (one forward), per-image loss 0 (nothing optimised). On a
    conditional net the service's per-job ``style_w`` row drives the
    conditional instance-norm affines — X-Style name picks and blends work
    exactly as in the iterative gallery mode, but each job costs one
    forward. The service jits and (under mesh=) shards the returned
    function itself, so this body stays untraced."""
    n_styles = net_n_styles(net_params)

    def job(images_u8, style_w, job_ids):
        del job_ids
        if n_styles is None:
            sw = None
        else:
            if style_w.shape[-1] != n_styles:
                raise ValueError(
                    f"service gallery width {style_w.shape[-1]} != the "
                    f"net's {n_styles} styles"
                )
            sw = style_w
        out = _stylize_body(net_params, images_u8, crop, compute_dtype, sw,
                            in_backend)
        b = out.shape[0]
        return out, jnp.asarray(1), jnp.zeros((b,), jnp.float32)

    return job
