"""Per-family assembly: variables + optimiser + jitted train/eval steps.

One factory per model family replaces the reference's three copy-pasted
train CLIs' model-construction blocks (e.g. train_best_RESNET50_Truncate.py:
179-194)."""
from __future__ import annotations

from typing import Dict, Optional, Sequence

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
from .train_loop import make_eval_step, make_train_step, make_train_step_multi


def _fresh_copy(tree):
    """Deep-copy array leaves: the train step donates its input buffers, so
    per-fold variables must never alias the shared pretrained tree."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: jnp.array(x) if hasattr(x, "shape") else x, tree
    )


def _cast_inputs(forward, compute_dtype):
    """bf16 policy: activations in the MXU's native type, params f32 (ops
    cast kernels at the boundary), logits back in f32 via the loss."""
    if compute_dtype is None:
        return forward

    def wrapped(v, images):
        return forward(v, images.astype(compute_dtype))

    return wrapped


class FamilySetup:
    """Steps compiled ONCE, variables re-initialisable per fold.

    The reference re-creates the model every fold (fine in eager torch); under
    jit, rebuilding the step closures would force a full recompile per fold —
    this wrapper shares one compiled train/eval step across all folds."""

    def __init__(self, init_variables, optimizer, train_step, eval_step,
                 forward_eval, train_step_multi=None, forward_train=None,
                 augment=None, mesh=None, opt_sharding=None,
                 label_smoothing=0.0, mix_fn=None):
        self._init_variables = init_variables
        self._optimizer = optimizer
        self.train_step = train_step
        self.eval_step = eval_step
        self.forward_eval = forward_eval
        # K-steps-per-dispatch variant (jit-lazy: costs nothing unless used)
        self.train_step_multi = train_step_multi
        # raw step ingredients, for step variants built on demand
        self._forward_train = forward_train
        self._augment = augment
        self._mesh = mesh
        self._opt_sharding = opt_sharding
        self._label_smoothing = label_smoothing
        self._mix_fn = mix_fn

    def init(self, key: jax.Array):
        variables = self._init_variables(key)
        return variables, self._optimizer.init(variables)

    def foldwise_step(self, fold_mesh):
        """Fold-parallel train step (all CV folds as one SPMD program —
        parallel.foldparallel) over a (fold, data) mesh."""
        from ..parallel.foldparallel import make_foldwise_train_step

        return make_foldwise_train_step(
            self._forward_train, self._optimizer, self._augment, fold_mesh,
            label_smoothing=self._label_smoothing, mix_fn=self._mix_fn,
        )

    def accum_step(self, n_accum: int):
        """Gradient-accumulation train step (train_loop.make_train_step_accum):
        the configured batch runs as n_accum sequential micro-batches with
        one optimiser update — for effective batches whose activations
        exceed HBM."""
        from .train_loop import make_train_step_accum

        return make_train_step_accum(
            self._forward_train, self._optimizer, self._augment, n_accum,
            mesh=self._mesh, opt_sharding=self._opt_sharding,
            label_smoothing=self._label_smoothing, mix_fn=self._mix_fn,
        )


def _setup(init_variables, forward_train, forward_eval, lr, combos, mesh,
           frozen_fn=None, compute_dtype=None, zero1=False,
           template_init=None, clip_norm=None,
           label_smoothing=0.0, ema_decay=None, mix_fn=None) -> FamilySetup:
    # ``lr`` may be a float (the reference's fixed SGD rate) or an optax
    # schedule (train/schedules.py); ``clip_norm`` adds global-norm gradient
    # clipping — both additive, defaults keep reference semantics exactly
    # the optimiser/sharding templates need only shapes+paths: derive them
    # from the FRESH-init function (identical tree structure/shapes), never
    # from a closure over a concrete pretrained tree — eval_shape would
    # execute _fresh_copy's per-leaf device copies for real (one dispatch
    # per leaf through a remote-attached device, review finding)
    template = jax.eval_shape(template_init or init_variables, jax.random.PRNGKey(0))
    optimizer = sgd_momentum(lr, template, frozen_fn=frozen_fn,
                             clip_norm=clip_norm, ema_decay=ema_decay)
    augment = make_augment_fn(combos)
    opt_sharding = None
    if zero1 and mesh is not None:
        # ZeRO-1: momentum stored 1/D over the data axis — jit reshards the
        # init state on the first step and keeps it sharded thereafter
        from ..parallel.sharding import zero1_state_shardings

        opt_template = jax.eval_shape(optimizer.init, template)
        opt_sharding = zero1_state_shardings(opt_template, mesh)
    forward_train_cast = _cast_inputs(forward_train, compute_dtype)
    train_step = make_train_step(
        forward_train_cast, optimizer, augment, mesh=mesh,
        opt_sharding=opt_sharding, label_smoothing=label_smoothing,
        mix_fn=mix_fn,
    )
    train_step_multi = make_train_step_multi(
        forward_train_cast, optimizer, augment, mesh=mesh,
        opt_sharding=opt_sharding, label_smoothing=label_smoothing,
        mix_fn=mix_fn,
    )
    eval_step = make_eval_step(_cast_inputs(forward_eval, compute_dtype), mesh=mesh)
    return FamilySetup(init_variables, optimizer, train_step, eval_step,
                       forward_eval, train_step_multi,
                       forward_train=forward_train_cast, augment=augment,
                       mesh=mesh, opt_sharding=opt_sharding,
                       label_smoothing=label_smoothing, mix_fn=mix_fn)


def setup_truncated_resnet50(
    config: TruncatedResNetConfig,
    num_classes: int,
    combos: Sequence,
    mesh=None,
    pretrained: Optional[Dict] = None,
    compute_dtype=None,
    zero1: bool = False,
    remat: bool = False,
    freeze_encoder: bool = False,
    lr_schedule=None,
    clip_norm=None,
    label_smoothing: float = 0.0,
    ema_decay=None,
    mix_fn=None,
) -> FamilySetup:
    t = config.truncate_layer

    def fresh_init(key):
        k1, k2 = jax.random.split(key)
        return {
            "moco": truncated_moco_init(k1, t, dim=config.dim),
            "classifier": classifier_init(k2, config.dim, num_classes),
        }

    def init_variables(key):
        if pretrained is not None:
            if "classifier" in pretrained:
                return _fresh_copy(pretrained)
            # encoder-only load (the CLI dropped a shape-mismatched or
            # absent classifier, reference train_best_RESNET50_Truncate.py:
            # 160-176): checkpoint moco + a freshly initialised classifier
            _, k2 = jax.random.split(key)
            return {
                "moco": _fresh_copy(pretrained["moco"]),
                "classifier": classifier_init(k2, config.dim, num_classes),
            }
        return fresh_init(key)

    def forward_train(v, images):
        logits, new_moco = combined_apply(v["moco"], v["classifier"], images, t,
                                          train=True, remat=remat)
        return logits, {"moco": new_moco, "classifier": v["classifier"]}

    def forward_eval(v, images):
        logits, _ = combined_apply(v["moco"], v["classifier"], images, t, train=False)
        return logits

    frozen_fn = None
    if freeze_encoder:
        # reference --freeze_encoder (train_best_RESNET50_Truncate.py:45,180):
        # requires_grad=False on every moco_model param — only the classifier
        # trains. BN running stats still evolve (torch train() mode updates
        # them regardless of requires_grad; here they merge through the
        # forward, outside the optimiser, so the semantics match for free).
        frozen_fn = lambda path: path.startswith("moco")
    return _setup(init_variables, forward_train, forward_eval,
                  lr_schedule if lr_schedule is not None else config.lr,
                  combos, mesh, frozen_fn=frozen_fn,
                  compute_dtype=compute_dtype, zero1=zero1,
                  template_init=fresh_init, clip_norm=clip_norm,
                  label_smoothing=label_smoothing, ema_decay=ema_decay,
                  mix_fn=mix_fn)


def make_truncated_resnet50(
    key: jax.Array,
    config: TruncatedResNetConfig,
    num_classes: int,
    combos: Sequence,
    mesh=None,
    pretrained: Optional[Dict] = None,
    compute_dtype=None,
):
    setup = setup_truncated_resnet50(
        config, num_classes, combos, mesh, pretrained, compute_dtype
    )
    variables, opt_state = setup.init(key)
    return variables, opt_state, setup.train_step, setup.eval_step, setup.forward_eval


def setup_gram_attention(
    config: GramAttentionConfig,
    num_classes: int,
    combos: Sequence,
    mesh=None,
    pretrained: Optional[Dict] = None,
    freeze_encoder: bool = False,
    compute_dtype=None,
    zero1: bool = False,
    remat: bool = False,
    lr_schedule=None,
    clip_norm=None,
    label_smoothing: float = 0.0,
    ema_decay=None,
    mix_fn=None,
) -> FamilySetup:
    t, s = config.truncate_layer, config.gram_matrix_size

    def fresh_init(key):
        return gram_attention_init(key, t, num_classes, s)

    def init_variables(key):
        variables = fresh_init(key)
        if pretrained is not None:
            from ..checkpoint.pth_converter import shape_filtered_update

            variables = _fresh_copy(shape_filtered_update(variables, pretrained))
        return variables

    def forward_train(v, images):
        _, logits, new_v = gram_attention_apply(
            v, images, t, s, num_classes, train=True, remat=remat
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
    return _setup(init_variables, forward_train, forward_eval,
                  lr_schedule if lr_schedule is not None else config.lr,
                  combos, mesh, frozen_fn, compute_dtype, zero1=zero1,
                  template_init=fresh_init, clip_norm=clip_norm,
                  label_smoothing=label_smoothing, ema_decay=ema_decay,
                  mix_fn=mix_fn)


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
    setup = setup_gram_attention(
        config, num_classes, combos, mesh, pretrained, freeze_encoder, compute_dtype
    )
    variables, opt_state = setup.init(key)
    return variables, opt_state, setup.train_step, setup.eval_step, setup.forward_eval


def setup_multi_patchgan(
    config: MultiPatchGANConfig,
    num_classes: int,
    combos: Sequence,
    mesh=None,
    pretrained: Optional[Dict] = None,
    compute_dtype=None,
    zero1: bool = False,
    remat: bool = False,
    lr_schedule=None,
    clip_norm=None,
    label_smoothing: float = 0.0,
    ema_decay=None,
    mix_fn=None,
) -> FamilySetup:
    norm = config.norm

    def fresh_init(key):
        return multiscale_init(
            key, config.patch_sizes, ndf=config.ndf,
            num_classes=num_classes, norm=norm,
        )

    def init_variables(key):
        variables = fresh_init(key)
        if pretrained is not None:
            from ..checkpoint.pth_converter import shape_filtered_update

            variables = _fresh_copy(shape_filtered_update(variables, pretrained))
        return variables

    def forward_train(v, images):
        return multiscale_apply(v, images, norm=norm, train=True, remat=remat)

    def forward_eval(v, images):
        logits, _ = multiscale_apply(v, images, norm=norm, train=False)
        return logits

    return _setup(init_variables, forward_train, forward_eval,
                  lr_schedule if lr_schedule is not None else config.lr,
                  combos, mesh, compute_dtype=compute_dtype, zero1=zero1,
                  template_init=fresh_init, clip_norm=clip_norm,
                  label_smoothing=label_smoothing, ema_decay=ema_decay,
                  mix_fn=mix_fn)


def make_multi_patchgan(
    key: jax.Array,
    config: MultiPatchGANConfig,
    num_classes: int,
    combos: Sequence,
    mesh=None,
    pretrained: Optional[Dict] = None,
    compute_dtype=None,
):
    setup = setup_multi_patchgan(
        config, num_classes, combos, mesh, pretrained, compute_dtype
    )
    variables, opt_state = setup.init(key)
    return variables, opt_state, setup.train_step, setup.eval_step, setup.forward_eval
