"""Heuristic style transfer — the repo's namesake — fully jit-compiled.

Reference semantics (functions/functions_RESNET50_Truncate_Gram_Attention.py:
218-285): per test image, (1) target Gram of the truncated encoder's output,
(2) Adam(lr) on the pixels of a randn(1,3,224,224) noise image minimising
MSE(gram(noise), gram(target)), (3) early stop when loss < threshold, cap
``num_iterations``, (4) denormalise and save [original | stylised] PNG into
``style_transfer_<date>/<class>/``.

TPU-first redesign:
- The reference re-launches Python per optimisation step (~500 host round
  trips per image). Here the *entire* Adam loop is ONE compiled
  ``lax.while_loop``; compile once per (layers, shape), reuse for every image.
- Images are optimised in BATCHES: each image carries its own target Gram and
  its own convergence flag; converged images stop receiving updates (the
  reference's per-image early break, vectorised) and the loop exits when all
  are done or the iteration cap hits.
- ``compute_dtype=bfloat16`` runs the encoder forward/backward (the loop's
  HBM traffic) in bf16 while the pixels, Adam state and loss stay f32:
  measured +63% img-iters/s at batch 64 and +128% at batch 128 on a v5e
  (identical final losses; the loop is at the HBM roofline — PERF.md).

The PatchGAN variant (functions/functions_Multi_PatchGAN.py:211-306) matches
the reference's *working* path: grams of the model's embedding vectors
(outer(e, e)/ndf per image; the reference's ``layers`` truncation path is
broken upstream — Sequential over a ModuleDict — and is rejected here with a
clear error instead of being reproduced).
"""
from __future__ import annotations

import os
import time
from datetime import datetime
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.resize import IMAGENET_MEAN, IMAGENET_STD


def make_style_transfer_optimizer(
    gram_fn: Callable[[jax.Array], Sequence[jax.Array]],
    learning_rate: float = 0.01,
    num_iterations: int = 500,
    threshold: float = 1e-4,
    mesh=None,
):
    """Build the jitted batched optimiser.

    ``gram_fn(images_nhwc)`` -> list of per-image Gram tensors, each with
    leading batch dim. Returns fn(noise0, target_grams) ->
    (final_noise, iterations_run, final_per_image_loss).

    ``mesh``: a jax Mesh with a 'data' axis — each image's pixels, Adam
    state and target Grams are batch-sharded over it (the per-image
    optimisations are independent, so the only collective is the tiny
    ``any(active)`` early-stop reduction). If the mesh also carries a
    'spatial' axis (``parallel.sharding.make_mesh_spatial``), each canvas's
    H rows — pixels, grads and Adam moments alike — are additionally sharded
    over it: GSPMD inserts the conv halo exchanges in the encoder
    forward/backward and an all-reduce for the Gram's H·W contraction. That
    is the big-canvas path: ONE image whose activation working set exceeds a
    chip's HBM optimises across the spatial group (the reference is capped
    by single-GPU memory here). Numerics identical to single-device (tested
    on the virtual CPU mesh at both shardings)."""
    adam = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)

    def per_image_loss(noise, targets):
        grams = gram_fn(noise)
        total = 0.0
        for g, t in zip(grams, targets):
            axes = tuple(range(1, g.ndim))
            total = total + jnp.mean(
                jnp.square(g.astype(jnp.float32) - t.astype(jnp.float32)), axis=axes
            )
        return total  # (B,)

    def run(noise0, targets):
        opt_state0 = adam.init(noise0)
        b = noise0.shape[0]
        active0 = jnp.ones((b,), dtype=bool)

        def cond(carry):
            i, _, _, active, _ = carry
            return jnp.logical_and(i < num_iterations, jnp.any(active))

        def body(carry):
            i, noise, opt_state, active, _ = carry

            def total_loss(n):
                per = per_image_loss(n, targets)
                return jnp.sum(per * active.astype(per.dtype)), per

            (_, per), grads = jax.value_and_grad(total_loss, has_aux=True)(noise)
            updates, opt_state = adam.update(grads, opt_state)
            mask = active.reshape((b,) + (1,) * (noise.ndim - 1))
            noise = optax.apply_updates(noise, jax.tree_util.tree_map(lambda u: u * mask, updates))
            # reference order: loss -> step -> threshold check (:257-272)
            active = jnp.logical_and(active, per >= threshold)
            return i + 1, noise, opt_state, active, per

        init = (jnp.asarray(0), noise0, opt_state0, active0,
                jnp.full((b,), jnp.inf, dtype=jnp.float32))
        i, noise, _, _, per = jax.lax.while_loop(cond, body, init)
        return noise, i, per

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharding import SPATIAL_AXIS

        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        # pixels (and, by propagation, grads + Adam moments): batch over
        # 'data', H rows over 'spatial' when the mesh has that axis
        pix = (
            NamedSharding(mesh, P("data", SPATIAL_AXIS))
            if SPATIAL_AXIS in mesh.axis_names
            else data
        )
        # `data` is a pytree prefix for the targets list (every target Gram
        # carries the batch dim first)
        return jax.jit(
            run, in_shardings=(pix, data), out_shardings=(pix, repl, data)
        )
    return jax.jit(run)


def _quantize_conv_kernels(enc: dict) -> dict:
    """Symmetric per-output-channel int8 quantization of every 4-D conv
    kernel in an encoder tree (``nn/resnet_int8._quantize_kernel``'s
    scheme); BN/bias/1-D leaves untouched. Each kernel leaf becomes a
    ``{"int8": int8 HWIO, "scale": f32 (O,)}`` marker dict that
    ``_dequantize_conv_kernels`` reverses inside a traced program."""
    from ..nn.resnet_int8 import _quantize_kernel

    def q(leaf):
        arr = np.asarray(leaf)
        if arr.ndim == 4:
            qk, s = _quantize_kernel(arr.astype(np.float32))
            return {"int8": jnp.asarray(qk), "scale": jnp.asarray(s)}
        return leaf

    return jax.tree_util.tree_map(q, enc)


def _dequantize_conv_kernels(enc_q: dict, dtype) -> dict:
    """Traced inverse of ``_quantize_conv_kernels``: int8 * scale -> dtype.
    Weights enter the loop as 1-byte tensors; whether that halves the
    per-iteration weight HBM traffic depends on XLA keeping the dequantise
    fused (it is loop-invariant, so LICM may hoist and materialise the
    dequantised copy once) — measured on-chip either way, PERF.md."""
    is_marker = lambda l: isinstance(l, dict) and "int8" in l  # noqa: E731

    def deq(leaf):
        if is_marker(leaf):
            k = leaf["int8"].astype(jnp.float32) * leaf["scale"]
            return k.astype(dtype) if dtype is not None else k
        return leaf

    return jax.tree_util.tree_map(deq, enc_q, is_leaf=is_marker)


def make_feature_fn_gram_attention(
    variables: dict,
    truncate_layer: int = 8,
    layers: Optional[int] = None,
    compute_dtype=None,
    remat: bool = False,
    weights_int8: bool = False,
) -> Callable:
    """Family-2 truncated-encoder feature program: ``images (B,H,W,3) ->
    feats (B,h,w,C)``. The Gram builder below and the content+style loss
    both ride on it (one encoder pass serves both terms). ``remat``
    checkpoints each bottleneck — inside the style while_loop that shrinks
    the per-iteration activation footprint, raising the single-chip canvas
    ceiling (the differentiable counterpart of the train CLIs' --remat).

    ``weights_int8``: store the conv kernels as per-channel int8 + scale
    and dequantise at use — the loop optimises PIXELS only, so dequantised
    convs pass the pixel gradients exactly and no weight gradient exists to
    quantise. An HBM-traffic lever for the weight re-reads every
    iteration; approximate (int8 weight rounding shifts the encoder
    features ~1e-3 relative)."""
    from ..nn.resnet import resnet50_apply

    truncate = min(
        layers if layers is not None else truncate_layer, truncate_layer, 8
    )
    enc = variables["encoder"]
    if compute_dtype is not None:
        from ..core.dtypes import Policy

        enc = Policy(compute_dtype=compute_dtype).cast_to_compute(enc)
    enc_q = _quantize_conv_kernels(enc) if weights_int8 else None

    def feature_fn(images):
        if compute_dtype is not None:
            images = images.astype(compute_dtype)
        use = (
            _dequantize_conv_kernels(enc_q, compute_dtype)
            if weights_int8 else enc
        )
        feats, _, _ = resnet50_apply(
            use, images, truncate=truncate, remat=remat
        )
        return feats

    return feature_fn


def make_extract_fn_gram_attention(
    variables: dict,
    truncate_layer: int = 8,
    layers: Optional[int] = None,
    compute_dtype=None,
    style_layers: str = "last",
    remat: bool = False,
    weights_int8: bool = False,
) -> Callable:
    """Content+style extraction program: ``images (B,H,W,3) -> (feats,
    [style Grams])``, one encoder pass.

    ``style_layers='last'``: a single Gram at the truncation point (cheap).
    ``'all'``: one Gram per executed ResNet stage (layer1..layer<truncate-4>)
    — the classic Gatys multi-depth style statistics, which capture texture
    at several receptive-field scales; the stage activations are computed by
    the same pass either way, so the extra cost is only the Gram
    contractions. Both reuse `nn/resnet.resnet50_apply`'s stage-Gram hook
    (the gram-attention model's own mechanism,
    Models_RESNET50_TRUNCATE_GRAM_with_Attention.py:43-46)."""
    from ..nn.resnet import resnet50_apply
    from ..ops.gram import gram_matrix_nhwc

    if style_layers not in ("last", "all"):
        raise ValueError(
            f"style_layers must be 'last' or 'all', got {style_layers!r}"
        )
    truncate = min(
        layers if layers is not None else truncate_layer, truncate_layer, 8
    )
    enc = variables["encoder"]
    if compute_dtype is not None:
        from ..core.dtypes import Policy

        enc = Policy(compute_dtype=compute_dtype).cast_to_compute(enc)
    enc_q = _quantize_conv_kernels(enc) if weights_int8 else None

    def extract_fn(images):
        if compute_dtype is not None:
            images = images.astype(compute_dtype)
        use = (
            _dequantize_conv_kernels(enc_q, compute_dtype)
            if weights_int8 else enc
        )
        feats, grams, _ = resnet50_apply(
            use, images, truncate=truncate,
            collect_grams=(style_layers == "all"), remat=remat,
        )
        if style_layers != "all" or not grams:
            grams = [gram_matrix_nhwc(feats)]
        return feats, grams

    return extract_fn


def make_gram_fn_gram_attention(
    variables: dict,
    truncate_layer: int = 8,
    layers: Optional[int] = None,
    compute_dtype=None,
    remat: bool = False,
    weights_int8: bool = False,
) -> Callable:
    """Family-2 per-image target-Gram program (shared by the batch task
    below and the style service, tasks/style_service.py): truncated encoder
    features -> one spatial Gram per image. ``compute_dtype=bfloat16`` runs
    the encoder in bf16 (Grams are computed f32 either way)."""
    from ..ops.gram import gram_matrix_nhwc

    feature_fn = make_feature_fn_gram_attention(
        variables, truncate_layer, layers=layers,
        compute_dtype=compute_dtype, remat=remat, weights_int8=weights_int8,
    )

    def gram_fn(images):
        return [gram_matrix_nhwc(feature_fn(images))]

    return gram_fn


def total_variation(pixels: jax.Array) -> jax.Array:
    """Per-image anisotropic total variation: mean squared difference of
    horizontally and vertically adjacent pixels, ``(B, H, W, C) -> (B,)``.
    The classic Gatys-style smoothness regulariser (the reference has no TV
    term — beyond parity)."""
    p = pixels.astype(jnp.float32)
    dh = jnp.square(p[:, 1:, :, :] - p[:, :-1, :, :])
    dw = jnp.square(p[:, :, 1:, :] - p[:, :, :-1, :])
    axes = (1, 2, 3)
    return jnp.mean(dh, axis=axes) + jnp.mean(dw, axis=axes)


def make_per_image_content_style_loss(
    extract_fn: Callable,
    style_weight: float = 1.0,
    content_weight: float = 1.0,
    tv_weight: float = 0.0,
) -> Callable:
    """The content+style objective, ONE definition for every consumer:
    ``loss(pixels, style_grams, content_feats) -> (B,)`` =
    ``style_weight * sum_l MSE(gram_l, style_gram_l) +
    content_weight * MSE(feats, content_feats) [+ tv_weight * TV]``.
    Used by the iterative loop (:func:`make_content_style_optimizer`) and
    by the fast-style quality evaluation (tasks/fast_style.py) — the
    net-vs-loop comparison is only meaningful because both sides score
    against this exact function."""
    sw, cw, tw = float(style_weight), float(content_weight), float(tv_weight)

    def per_image_loss(pixels, style_grams, content_feats):
        feats, grams = extract_fn(pixels)
        style = 0.0
        for g, t in zip(grams, style_grams):
            axes_g = tuple(range(1, g.ndim))
            style = style + jnp.mean(
                jnp.square(g.astype(jnp.float32) - t.astype(jnp.float32)),
                axis=axes_g,
            )
        axes_f = tuple(range(1, feats.ndim))
        content = jnp.mean(
            jnp.square(
                feats.astype(jnp.float32) - content_feats.astype(jnp.float32)
            ),
            axis=axes_f,
        )
        loss = sw * style + cw * content  # (B,)
        if tw != 0.0:
            loss = loss + tw * total_variation(pixels)
        return loss

    return per_image_loss


def make_content_style_optimizer(
    extract_fn: Callable,
    style_weight: float = 1.0,
    content_weight: float = 1.0,
    learning_rate: float = 0.01,
    num_iterations: int = 500,
    threshold: float = 1e-4,
    tv_weight: float = 0.0,
    mesh=None,
):
    """Classic content+style transfer (Gatys et al.), batched like the
    texture loop above — a beyond-parity extension: the reference only
    synthesises texture from the image's own Gram
    (functions_RESNET50_Truncate_Gram_Attention.py:218-285, no content
    term).

    ``extract_fn(pixels) -> (feats, [style Grams])``
    (``make_extract_fn_gram_attention``). Per image:
    ``style_weight * sum_l MSE(gram_l, style_gram_l) +
    content_weight * MSE(feats, content_feats) [+ tv_weight * TV(pixels)]``
    with everything from ONE encoder pass per iteration (the layer Grams are
    hooks on that pass — no second forward). Same per-image early stop /
    iteration cap / masked Adam updates as the texture loop, so converged
    images freeze bit-exactly.

    Returns fn(init_pixels, style_grams_list, content_feats) ->
    (pixels, iterations_run, final_per_image_loss). ``init_pixels`` is the
    classic knob: the (normalised) content image converges fastest; noise
    reproduces the texture loop's start."""
    adam = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    per_image_loss = make_per_image_content_style_loss(
        extract_fn, style_weight, content_weight, tv_weight
    )

    def run(pixels0, style_grams, content_feats):
        opt_state0 = adam.init(pixels0)
        b = pixels0.shape[0]
        active0 = jnp.ones((b,), dtype=bool)

        def cond(carry):
            i, _, _, active, _ = carry
            return jnp.logical_and(i < num_iterations, jnp.any(active))

        def body(carry):
            i, pixels, opt_state, active, _ = carry

            def total_loss(p):
                per = per_image_loss(p, style_grams, content_feats)
                return jnp.sum(per * active.astype(per.dtype)), per

            (_, per), grads = jax.value_and_grad(total_loss, has_aux=True)(pixels)
            updates, opt_state = adam.update(grads, opt_state)
            mask = active.reshape((b,) + (1,) * (pixels.ndim - 1))
            pixels = optax.apply_updates(
                pixels, jax.tree_util.tree_map(lambda u: u * mask, updates)
            )
            active = jnp.logical_and(active, per >= threshold)
            return i + 1, pixels, opt_state, active, per

        init = (jnp.asarray(0), pixels0, opt_state0, active0,
                jnp.full((b,), jnp.inf, dtype=jnp.float32))
        i, pixels, _, _, per = jax.lax.while_loop(cond, body, init)
        return pixels, i, per

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharding import SPATIAL_AXIS

        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        pix = (
            NamedSharding(mesh, P("data", SPATIAL_AXIS))
            if SPATIAL_AXIS in mesh.axis_names
            else data
        )
        return jax.jit(
            run, in_shardings=(pix, data, data), out_shardings=(pix, repl, data)
        )
    return jax.jit(run)


def make_gram_fn_patches(
    variables: dict,
    gram_matrix_dim: int,
    norm: str = "batch",
    compute_dtype=None,
) -> Callable:
    """Family-3 per-image target-Gram program (embedding outer products,
    functions_Multi_PatchGAN.py:144-148) — shared by the batch task and the
    style service."""
    from ..models.multi_patchgan import multiscale_test_apply

    v = variables
    if compute_dtype is not None:
        from ..core.dtypes import Policy

        v = Policy(compute_dtype=compute_dtype).cast_to_compute(v)

    def gram_fn(images):
        if compute_dtype is not None:
            images = images.astype(compute_dtype)
        emb, _, _ = multiscale_test_apply(v, images, gram_matrix_dim, norm=norm)
        # gram_matrix on a 1-D vector: outer product / dim (:144-148);
        # f32 PET only for f32 operands (ops/conv.py:_pet rule)
        pet = jnp.float32 if emb.dtype == jnp.float32 else None
        g = jnp.einsum("bi,bj->bij", emb, emb, preferred_element_type=pet)
        return [g.astype(jnp.float32) / emb.shape[-1]]

    return gram_fn


def denormalize_to_uint8(img_nhwc: np.ndarray) -> np.ndarray:
    """Invert ImageNet normalisation, clamp to [0,1], return float in [0,1]
    (functions_RESNET50_Truncate_Gram_Attention.py:212-217,274-279)."""
    img = np.asarray(img_nhwc, dtype=np.float32) * IMAGENET_STD + IMAGENET_MEAN
    return np.clip(img, 0.0, 1.0)


def _save_side_by_side(original, stylised, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    combined = np.hstack((original, stylised))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    plt.imsave(path, combined)


def style_transfer_gram_attention(
    variables: dict,
    loader,
    save_dir: str,
    *,
    layers: Optional[int] = None,
    threshold: float = 1e-4,
    num_iterations: int = 500,
    learning_rate: float = 0.01,
    truncate_layer: int = 8,
    key: Optional[jax.Array] = None,
    log_fn=print,
    compute_dtype=None,
    mesh=None,
    remat: bool = False,
) -> List[str]:
    """Family-2 style transfer. ``layers`` truncates the encoder's child list
    exactly like the reference's Sequential slice (:239-241). Returns saved
    paths. ``compute_dtype=bfloat16`` runs the encoder fwd/bwd in bf16
    (pixels/Adam/loss stay f32 — module docstring); ``mesh`` batch-shards
    the per-image optimisations over its 'data' axis; ``remat`` checkpoints
    encoder bottlenecks inside the loop (bigger canvases per chip)."""
    from ..data.augment import eval_preprocess

    if key is None:
        key = jax.random.PRNGKey(0)

    gram_fn = make_gram_fn_gram_attention(
        variables, truncate_layer, layers=layers,
        compute_dtype=compute_dtype, remat=remat,
    )
    optimise = make_style_transfer_optimizer(
        gram_fn, learning_rate, num_iterations, threshold, mesh=mesh
    )
    # one compiled program for the per-batch target Grams (an unjitted
    # gram_fn would dispatch the encoder op-by-op); the device arrays feed
    # the jitted optimise directly — no host round trip
    gram_target = jax.jit(gram_fn)

    current_date = datetime.now().strftime("%Y-%m-%d")
    out_dir = os.path.join(save_dir, f"style_transfer_{current_date}")
    os.makedirs(out_dir, exist_ok=True)

    saved = []
    img_counter = 0
    for batch in loader:
        n = batch["n_valid"]
        images = eval_preprocess(jnp.asarray(batch["image"]))  # (B,224,224,3)
        targets = gram_target(images)
        key, sub = jax.random.split(key)
        noise0 = jax.random.normal(sub, images.shape, dtype=jnp.float32)
        noise, iters, per_loss = optimise(noise0, targets)
        log_fn(
            f"Batch optimised in {int(iters)} iterations, "
            f"final losses: {np.asarray(per_loss)[:n].round(6).tolist()}"
        )
        noise = np.asarray(noise)
        originals = np.asarray(images)
        for j in range(n):
            label = int(batch["label"][j])
            class_dir = os.path.join(out_dir, str(label))
            path = os.path.join(class_dir, f"style_transfer_{img_counter}.png")
            _save_side_by_side(
                denormalize_to_uint8(originals[j]), denormalize_to_uint8(noise[j]), path
            )
            saved.append(path)
            log_fn(f"Style transferred for image {img_counter}, saved to {path}")
            img_counter += 1
    return saved


def content_style_transfer_gram_attention(
    variables: dict,
    loader,
    style_image_u8: np.ndarray,
    save_dir: str,
    *,
    layers: Optional[int] = None,
    truncate_layer: int = 8,
    style_weight: float = 1.0,
    content_weight: float = 1.0,
    tv_weight: float = 0.0,
    style_layers: str = "last",
    threshold: float = 1e-4,
    num_iterations: int = 500,
    learning_rate: float = 0.01,
    init: str = "content",
    key: Optional[jax.Array] = None,
    log_fn=print,
    compute_dtype=None,
    mesh=None,
    remat: bool = False,
) -> List[str]:
    """Classic content+style transfer (beyond parity — the reference's loop
    has no content term): every content image in ``loader`` is re-rendered
    in the style of ONE style image. ``init='content'`` starts the pixels at
    the content image (classic, converges fastest); ``'noise'`` starts from
    randn like the texture loop. ``style_layers='all'`` matches style Grams
    at every executed ResNet stage (multi-scale texture) instead of only the
    truncation point. Saves [content | stylised] PNGs and returns their
    paths."""
    from ..data.augment import eval_preprocess

    if init not in ("content", "noise"):
        raise ValueError(f"init must be 'content' or 'noise', got {init!r}")
    if key is None:
        key = jax.random.PRNGKey(0)

    extract_fn = make_extract_fn_gram_attention(
        variables, truncate_layer, layers=layers,
        compute_dtype=compute_dtype, style_layers=style_layers, remat=remat,
    )
    optimise = make_content_style_optimizer(
        extract_fn, style_weight, content_weight,
        learning_rate, num_iterations, threshold,
        tv_weight=tv_weight, mesh=mesh,
    )
    extract = jax.jit(extract_fn)  # one program for the target passes

    style_pre = eval_preprocess(jnp.asarray(style_image_u8)[None])
    style_grams = [
        np.asarray(g)[0] for g in extract(style_pre)[1]
    ]

    current_date = datetime.now().strftime("%Y-%m-%d")
    out_dir = os.path.join(save_dir, f"style_transfer_{current_date}")
    os.makedirs(out_dir, exist_ok=True)

    saved = []
    img_counter = 0
    for batch in loader:
        n = batch["n_valid"]
        images = eval_preprocess(jnp.asarray(batch["image"]))
        content_feats = extract(images)[0].astype(jnp.float32)
        grams = [
            jnp.broadcast_to(
                jnp.asarray(g)[None], (images.shape[0],) + g.shape
            )
            for g in style_grams
        ]
        if init == "content":
            pixels0 = images.astype(jnp.float32)
        else:
            key, sub = jax.random.split(key)
            pixels0 = jax.random.normal(sub, images.shape, dtype=jnp.float32)
        pixels, iters, per_loss = optimise(pixels0, grams, content_feats)
        log_fn(
            f"Batch optimised in {int(iters)} iterations, "
            f"final losses: {np.asarray(per_loss)[:n].round(6).tolist()}"
        )
        pixels = np.asarray(pixels)
        originals = np.asarray(images)
        for j in range(n):
            label = int(batch["label"][j])
            class_dir = os.path.join(out_dir, str(label))
            path = os.path.join(class_dir, f"content_style_{img_counter}.png")
            _save_side_by_side(
                denormalize_to_uint8(originals[j]),
                denormalize_to_uint8(pixels[j]), path,
            )
            saved.append(path)
            log_fn(
                f"Content+style transferred for image {img_counter}, "
                f"saved to {path}"
            )
            img_counter += 1
    return saved


def style_transfer_patches(
    variables: dict,
    loader,
    save_dir: str,
    *,
    gram_matrix_dim: int,
    norm: str = "batch",
    layers: Optional[int] = None,
    threshold: float = 1e-4,
    num_iterations: int = 500,
    learning_rate: float = 0.01,
    max_images: Optional[int] = None,
    key: Optional[jax.Array] = None,
    log_fn=print,
    compute_dtype=None,
    mesh=None,
) -> List[str]:
    """Family-3 style transfer over embedding outer-product grams
    (functions/functions_Multi_PatchGAN.py:211-306, working ``layers=None``
    path; the reference's layers-slicing crashes upstream and is rejected).

    ``mesh``: as for the family-2 task — 'data' shards the batch, a
    'spatial' axis shards each canvas's H rows (this family runs the
    reference's one-image-at-a-time loop, so spatial is the axis that
    matters here)."""
    from ..data.augment import eval_preprocess

    if layers is not None:
        raise ValueError(
            "The reference's --layers truncation for PatchGAN style transfer is "
            "non-functional upstream (nn.Sequential over a ModuleDict, "
            "functions_Multi_PatchGAN.py:242); run without --layers."
        )
    if key is None:
        key = jax.random.PRNGKey(0)

    gram_fn = make_gram_fn_patches(
        variables, gram_matrix_dim, norm=norm, compute_dtype=compute_dtype
    )
    optimise = make_style_transfer_optimizer(
        gram_fn, learning_rate, num_iterations, threshold, mesh=mesh
    )
    gram_target = jax.jit(gram_fn)  # one program, not op-by-op dispatch

    current_date = datetime.now().strftime("%Y-%m-%d")
    out_dir = os.path.join(save_dir, f"style_transfer_{current_date}")
    os.makedirs(out_dir, exist_ok=True)

    saved = []
    img_counter = 0
    for batch in loader:
        n = batch["n_valid"]
        if max_images is not None:
            n = min(n, max_images - img_counter)
            if n <= 0:
                log_fn(f"Maximum number of images ({max_images}) reached.")
                return saved
        images = eval_preprocess(jnp.asarray(batch["image"]))
        targets = gram_target(images)
        key, sub = jax.random.split(key)
        noise0 = jax.random.normal(sub, images.shape, dtype=jnp.float32)
        noise, iters, per_loss = optimise(noise0, targets)
        noise = np.asarray(noise)
        originals = np.asarray(images)
        for j in range(n):
            label = int(batch["label"][j])
            class_dir = os.path.join(out_dir, str(label))
            timestamp = int(time.time() * 1000)
            path = os.path.join(
                class_dir, f"style_transfer_{label}_{img_counter}_{timestamp}.png"
            )
            _save_side_by_side(
                denormalize_to_uint8(originals[j]), denormalize_to_uint8(noise[j]), path
            )
            saved.append(path)
            img_counter += 1
        if max_images is not None and img_counter >= max_images:
            log_fn(f"Maximum number of images ({max_images}) reached.")
            return saved
    return saved
