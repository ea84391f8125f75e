"""Optimisers with torch-equivalent semantics + trainability masking.

The reference trains with ``optim.SGD(..., momentum=0.9)`` over
``filter(requires_grad, params)`` (train_best_RESNET50_Truncate.py:191-194).
Here the same thing is expressed functionally: BN running stats (and any
user-frozen subtrees, e.g. --freeze_layers on the gram-attention CLI,
functions_RESNET50_Truncate_Gram_Attention.py:197-207) are labelled 'freeze'
and routed to ``optax.set_to_zero``.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

BN_STAT_KEYS = ("mean", "var")


def _leaf_name(path) -> str:
    last = path[-1]
    if hasattr(last, "key"):
        return str(last.key)
    return str(getattr(last, "idx", last))


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(getattr(p, "idx", p)))
    return ".".join(parts)


def label_tree(variables, frozen_fn: Optional[Callable[[str], bool]] = None):
    """'train' / 'freeze' label pytree. BN running stats are always frozen;
    ``frozen_fn`` receives the dotted path for additional freezing."""

    def label(path, leaf):
        if _leaf_name(path) in BN_STAT_KEYS:
            return "freeze"
        if frozen_fn is not None and frozen_fn(_path_str(path)):
            return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, variables)


def _masked(inner, variables, frozen_fn):
    labels = label_tree(variables, frozen_fn)
    return optax.multi_transform({"train": inner, "freeze": optax.set_to_zero()}, labels)


class ParamEmaState(NamedTuple):
    """EMA of the post-update parameters (``param_ema``)."""

    ema: dict


def param_ema(decay: float) -> optax.GradientTransformation:
    """Track an exponential moving average of the POST-update parameters as
    optimiser state, leaving the updates untouched.

    Appended after the (masked) optimiser in a chain, its ``update`` sees the
    final updates and the pre-update params, so ``params + updates`` is
    exactly the tree ``optax.apply_updates`` will produce — the EMA is of the
    weights the next step trains from (timm ModelEmaV2 semantics, no debias:
    early steps lean toward the init, as is standard). Riding the optimiser
    state means every step variant, checkpoint and resume path carries the
    EMA for free. Extraction for evaluation: ``extract_ema_variables``."""
    decay = float(decay)
    if not 0.0 < decay < 1.0:
        raise ValueError(f"ema decay must be in (0, 1), got {decay}")

    def init_fn(params):
        # a REAL copy: jnp.asarray would alias the param buffers and the
        # donated train step would then donate the same buffer twice
        return ParamEmaState(
            ema=jax.tree_util.tree_map(
                lambda p: jnp.array(p, copy=True), params
            )
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("param_ema requires params")
        new_ema = jax.tree_util.tree_map(
            lambda e, p, u: decay * e + (1.0 - decay) * (p + u),
            state.ema, params, updates,
        )
        return updates, ParamEmaState(ema=new_ema)

    return optax.GradientTransformation(init_fn, update_fn)


def find_ema_state(opt_state) -> Optional[ParamEmaState]:
    """The ParamEmaState inside a (possibly nested/chained) optimiser state,
    or None. Works on the live state and on a structure-restored one."""
    found = []

    def visit(node):
        if isinstance(node, ParamEmaState):
            found.append(node)
            return
        if isinstance(node, tuple):
            for child in node:
                visit(child)

    visit(opt_state)
    return found[0] if found else None


def extract_ema_variables(variables, opt_state):
    """The evaluation tree for an EMA run: trainable leaves from the EMA,
    BN running statistics from the live variables (they evolve through the
    forward's stat merge, outside the optimiser — their EMA slots are stale
    by construction). Returns ``variables`` unchanged when the optimiser
    carries no EMA."""
    state = find_ema_state(opt_state)
    if state is None:
        return variables

    def pick(path, live, ema):
        return live if _leaf_name(path) in BN_STAT_KEYS else ema

    return jax.tree_util.tree_map_with_path(pick, variables, state.ema)


def sgd_momentum(lr, variables, momentum: float = 0.9, frozen_fn=None,
                 clip_norm: Optional[float] = None,
                 ema_decay: Optional[float] = None):
    """torch.optim.SGD(momentum=0.9, dampening=0, nesterov=False) equivalent.

    Additive extras (defaults preserve exact reference semantics and the
    optimiser-state structure): ``lr`` may be an optax schedule callable
    (train/schedules.py — evaluated from the state's step count inside the
    jitted step), ``clip_norm`` prepends global-norm gradient clipping
    (optax.clip_by_global_norm) over the trainable leaves, and ``ema_decay``
    appends ``param_ema`` (an EMA of the post-update weights carried in the
    optimiser state, for evaluation via ``extract_ema_variables``)."""
    inner = optax.sgd(lr, momentum=momentum)
    if clip_norm is not None:
        inner = optax.chain(optax.clip_by_global_norm(float(clip_norm)), inner)
    opt = _masked(inner, variables, frozen_fn)
    if ema_decay is not None:
        opt = optax.chain(opt, param_ema(ema_decay))
    return opt


def adam(lr: float, variables=None, frozen_fn=None):
    """torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8) — used by the
    style-transfer pixel optimisation (functions_RESNET50_Truncate_Gram_Attention.py:255)."""
    inner = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if variables is None:
        return inner
    return _masked(inner, variables, frozen_fn)
