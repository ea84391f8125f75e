"""Learning-rate schedules for the train CLIs (additive TPU extra).

The reference trains at a fixed SGD learning rate
(train_best_RESNET50_Truncate.py:191-194); that stays the default
(``--lr_schedule constant`` with no warmup is EXACTLY the plain float path
— the optimiser state and resume signature are unchanged unless a schedule
is requested). Schedules are optax callables evaluated from the optimiser's
step count inside the jitted train step — no host round-trip, no recompile:
one compiled step serves the whole decay curve.

Step accounting: the count lives in the optimiser state, so it restarts at
each CV fold's fresh ``init`` (every fold sees the full curve) and rides
the elastic-resume checkpoint like any other state leaf (a resumed run
continues the curve bit-identically). With ``--grad_accum K`` one update ==
one schedule step (the K micro-batches form one logical batch).
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import optax

SCHEDULE_NAMES = ("constant", "cosine", "linear")


def make_lr_schedule(
    name: str,
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    min_lr_ratio: float = 0.0,
) -> Optional[Callable]:
    """An optax schedule: linear warmup 0 -> base_lr over ``warmup_steps``,
    then the named decay from base_lr to ``base_lr * min_lr_ratio`` at
    ``total_steps``. Returns None for the identity case (constant, no
    warmup) so callers can keep the plain-float optimiser path."""
    if name not in SCHEDULE_NAMES:
        raise ValueError(f"unknown lr schedule {name!r}; choose from {SCHEDULE_NAMES}")
    warmup_steps = int(warmup_steps)
    total_steps = int(total_steps)
    if warmup_steps < 0 or total_steps < 1:
        raise ValueError("warmup_steps must be >= 0 and total_steps >= 1")
    if not 0.0 <= min_lr_ratio <= 1.0:
        raise ValueError("min_lr_ratio must be in [0, 1]")
    if name == "constant" and warmup_steps == 0:
        return None
    end = base_lr * min_lr_ratio
    decay_steps = max(1, total_steps - warmup_steps)
    if name == "constant":
        decay = optax.constant_schedule(base_lr)
    elif name == "cosine":
        decay = optax.cosine_decay_schedule(
            base_lr, decay_steps, alpha=min_lr_ratio
        )
    else:  # linear
        decay = optax.linear_schedule(base_lr, end, decay_steps)
    if warmup_steps == 0:
        return decay
    warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
    return optax.join_schedules([warmup, decay], [warmup_steps])


def steps_per_fold(
    n_samples: int, k_folds: int, batch_size: int, epochs: int
) -> int:
    """Total optimiser steps one CV fold runs: the k-fold train split keeps
    (k-1)/k of the samples (KFold semantics, train/kfold.py) and the loader
    rounds partial batches up."""
    train_size = n_samples - n_samples // int(k_folds) if k_folds > 1 else n_samples
    per_epoch = max(1, math.ceil(train_size / int(batch_size)))
    return max(1, per_epoch * int(epochs))
