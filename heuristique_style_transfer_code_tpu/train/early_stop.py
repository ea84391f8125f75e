"""Early stopping with best-epoch weight restoration (additive TPU extra).

The reference trains every fold for the full epoch budget and evaluates once
at the fold end (train_best_RESNET50_Truncate.py:205-233); that stays the
default. With ``--early_stop PATIENCE`` the k-fold driver validates after
every epoch, stops the fold once ``PATIENCE`` consecutive epochs fail to
improve the validation loss, and restores the best epoch's weights before
the fold-end evaluation/artifacts — so ``best_model_fold_<k>`` is the best
epoch, not the last.

Snapshots are host copies (``jax.device_get``): the train step donates its
input buffers, so a device-array snapshot would be invalidated by the next
epoch's dispatch. Counters and the best snapshot ride the elastic-resume
checkpoint (train/kfold.py) so a resumed run stops at the identical epoch.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np


class EarlyStopper:
    """Per-fold early-stopping state: strict-improvement tracking with a
    host-side snapshot of the best epoch's variables.

    ``update`` returns True when training should stop (``patience``
    consecutive epochs without a new best validation loss)."""

    def __init__(self, patience: int):
        patience = int(patience)
        if patience < 1:
            raise ValueError("early-stop patience must be >= 1")
        self.patience = patience
        self.best_loss = float("inf")
        self.since = 0  # epochs since the last improvement
        self.best_epoch: Optional[int] = None
        self.best_variables = None  # host (numpy) tree
        self.improved_last = False  # did the most recent update() improve?

    def update(self, val_loss: float, variables, epoch: int) -> bool:
        val_loss = float(val_loss)
        if val_loss < self.best_loss:
            self.best_loss = val_loss
            self.since = 0
            self.best_epoch = int(epoch)
            self.best_variables = jax.device_get(variables)
            self.improved_last = True
            return False
        self.improved_last = False
        self.since += 1
        return self.since >= self.patience

    # --- elastic-resume round trip (train/kfold.py in-progress artifacts) ---

    def state_leaves(self) -> dict:
        """Counter leaves for the in-progress checkpoint npz (the best
        variables go to their own side file — they are a full model)."""
        return {
            "es_best_loss": np.asarray(self.best_loss, np.float64),
            "es_since": np.asarray(self.since, np.int64),
            "es_best_epoch": np.asarray(
                -1 if self.best_epoch is None else self.best_epoch, np.int64
            ),
        }

    def restore(self, leaves: dict, best_variables) -> None:
        self.best_loss = float(np.asarray(leaves["es_best_loss"]))
        self.since = int(np.asarray(leaves["es_since"]))
        be = int(np.asarray(leaves["es_best_epoch"]))
        self.best_epoch = None if be < 0 else be
        self.best_variables = best_variables
        self.improved_last = False
