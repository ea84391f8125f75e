"""Per-family assembly: variables + optimiser + jitted train/eval steps.

One factory per model family replaces the reference's three copy-pasted
train CLIs' model-construction blocks (e.g. train_best_RESNET50_Truncate.py:
179-194)."""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax

from ..config.schema import GramAttentionConfig, MultiPatchGANConfig, TruncatedResNetConfig
from ..data.augment import make_augment_fn
from ..models.gram_attention import gram_attention_apply, gram_attention_init
from ..models.multi_patchgan import multiscale_apply, multiscale_init
from ..models.truncated_resnet50 import (
    classifier_init,
    combined_apply,
    truncated_moco_init,
)
from .optim import sgd_momentum
from .train_loop import make_eval_step, make_train_step


def _cast_inputs(forward, compute_dtype):
    """bf16 policy: activations in the MXU's native type, params f32 (ops
    cast kernels at the boundary), logits back in f32 via the loss."""
    if compute_dtype is None:
        return forward

    def wrapped(v, images):
        return forward(v, images.astype(compute_dtype))

    return wrapped


def _steps(variables, forward_train, forward_eval, lr, combos, mesh,
           frozen_fn=None, compute_dtype=None):
    optimizer = sgd_momentum(lr, variables, frozen_fn=frozen_fn)
    opt_state = optimizer.init(variables)
    augment = make_augment_fn(combos)
    train_step = make_train_step(
        _cast_inputs(forward_train, compute_dtype), optimizer, augment, mesh=mesh
    )
    eval_step = make_eval_step(_cast_inputs(forward_eval, compute_dtype), mesh=mesh)
    return opt_state, train_step, eval_step


def make_truncated_resnet50(
    key: jax.Array,
    config: TruncatedResNetConfig,
    num_classes: int,
    combos: Sequence,
    mesh=None,
    pretrained: Optional[Dict] = None,
    compute_dtype=None,
):
    k1, k2 = jax.random.split(key)
    variables = {
        "moco": truncated_moco_init(k1, config.truncate_layer, dim=config.dim),
        "classifier": classifier_init(k2, config.dim, num_classes),
    }
    if pretrained is not None:
        variables = pretrained
    t = config.truncate_layer

    def forward_train(v, images):
        logits, new_moco = combined_apply(v["moco"], v["classifier"], images, t, train=True)
        return logits, {"moco": new_moco, "classifier": v["classifier"]}

    def forward_eval(v, images):
        logits, _ = combined_apply(v["moco"], v["classifier"], images, t, train=False)
        return logits

    opt_state, train_step, eval_step = _steps(
        variables, forward_train, forward_eval, config.lr, combos, mesh,
        compute_dtype=compute_dtype,
    )
    return variables, opt_state, train_step, eval_step, forward_eval


def make_gram_attention(
    key: jax.Array,
    config: GramAttentionConfig,
    num_classes: int,
    combos: Sequence,
    mesh=None,
    pretrained: Optional[Dict] = None,
    freeze_encoder: bool = False,
    compute_dtype=None,
):
    variables = gram_attention_init(
        key, config.truncate_layer, num_classes, config.gram_matrix_size
    )
    if pretrained is not None:
        from ..checkpoint.pth_converter import shape_filtered_update

        variables = shape_filtered_update(variables, pretrained)
    t, s = config.truncate_layer, config.gram_matrix_size

    def forward_train(v, images):
        _, logits, new_v = gram_attention_apply(
            v, images, t, s, num_classes, train=True
        )
        return logits, new_v

    def forward_eval(v, images):
        _, logits, _ = gram_attention_apply(v, images, t, s, num_classes, train=False)
        return logits

    frozen_fn = None
    if freeze_encoder:
        # reference set_parameter_requires_grad: freeze all but classifier+attention
        frozen_fn = lambda path: not (
            path.startswith("classifier") or path.startswith("attention")
        )
    opt_state, train_step, eval_step = _steps(
        variables, forward_train, forward_eval, config.lr, combos, mesh, frozen_fn,
        compute_dtype=compute_dtype,
    )
    return variables, opt_state, train_step, eval_step, forward_eval


def make_multi_patchgan(
    key: jax.Array,
    config: MultiPatchGANConfig,
    num_classes: int,
    combos: Sequence,
    mesh=None,
    pretrained: Optional[Dict] = None,
    compute_dtype=None,
):
    variables = multiscale_init(
        key,
        config.patch_sizes,
        ndf=config.ndf,
        num_classes=num_classes,
        norm=config.norm,
    )
    if pretrained is not None:
        from ..checkpoint.pth_converter import shape_filtered_update

        variables = shape_filtered_update(variables, pretrained)
    norm = config.norm

    def forward_train(v, images):
        return multiscale_apply(v, images, norm=norm, train=True)

    def forward_eval(v, images):
        logits, _ = multiscale_apply(v, images, norm=norm, train=False)
        return logits

    opt_state, train_step, eval_step = _steps(
        variables, forward_train, forward_eval, config.lr, combos, mesh,
        compute_dtype=compute_dtype,
    )
    return variables, opt_state, train_step, eval_step, forward_eval
