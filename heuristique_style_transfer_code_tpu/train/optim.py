"""Optimisers with torch-equivalent semantics + trainability masking.

The reference trains with ``optim.SGD(..., momentum=0.9)`` over
``filter(requires_grad, params)`` (train_best_RESNET50_Truncate.py:191-194).
Here the same thing is expressed functionally: BN running stats (and any
user-frozen subtrees, e.g. --freeze_layers on the gram-attention CLI,
functions_RESNET50_Truncate_Gram_Attention.py:197-207) are labelled 'freeze'
and routed to ``optax.set_to_zero``.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
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


def sgd_momentum(lr, variables, momentum: float = 0.9, frozen_fn=None,
                 clip_norm: Optional[float] = None):
    """torch.optim.SGD(momentum=0.9, dampening=0, nesterov=False) equivalent.

    Additive extras (defaults preserve exact reference semantics and the
    optimiser-state structure): ``lr`` may be an optax schedule callable
    (train/schedules.py — evaluated from the state's step count inside the
    jitted step), and ``clip_norm`` prepends global-norm gradient clipping
    (optax.clip_by_global_norm) over the trainable leaves."""
    inner = optax.sgd(lr, momentum=momentum)
    if clip_norm is not None:
        inner = optax.chain(optax.clip_by_global_norm(float(clip_norm)), inner)
    return _masked(inner, variables, frozen_fn)


def adam(lr: float, variables=None, frozen_fn=None):
    """torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8) — used by the
    style-transfer pixel optimisation (functions_RESNET50_Truncate_Gram_Attention.py:255)."""
    inner = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if variables is None:
        return inner
    return _masked(inner, variables, frozen_fn)
