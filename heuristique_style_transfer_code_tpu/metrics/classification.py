"""Classification metrics + timers.

The reference computes metrics with sklearn (weighted precision/recall/F1,
confusion matrix, weighted ovr AUC — functions/functions_RESNET50_Truncate.py:
112-114,824-852); we call the same sklearn entry points host-side for exact
artifact parity, with an -1 = "Unknown" masking convention for the
probability-threshold path (:738-744,828-838).
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np


def classification_metrics(
    targets: np.ndarray,
    preds: np.ndarray,
    num_classes: int,
) -> Dict[str, object]:
    """Weighted P/R/F1 + confusion matrix over non-Unknown predictions
    (preds == -1 are excluded, like the reference's threshold handling)."""
    from sklearn.metrics import (
        confusion_matrix,
        f1_score,
        precision_score,
        recall_score,
    )

    targets = np.asarray(targets)
    preds = np.asarray(preds)
    known = preds != -1
    if known.any():
        precision = precision_score(
            targets[known], preds[known], average="weighted", zero_division=0
        )
        recall = recall_score(
            targets[known], preds[known], average="weighted", zero_division=0
        )
        f1 = f1_score(targets[known], preds[known], average="weighted", zero_division=0)
        cm = confusion_matrix(targets[known], preds[known], labels=list(range(num_classes)))
    else:
        precision = recall = f1 = 0
        cm = np.zeros((num_classes, num_classes), dtype=int)
    return {"precision": precision, "recall": recall, "f1": f1, "confusion_matrix": cm}


def confusion_matrix_np(targets, preds, num_classes: int) -> np.ndarray:
    """sklearn-free confusion matrix. Pairs where EITHER index is outside
    [0, num_classes) are skipped — both -1 "Unknown" predictions and -1
    padded targets (the HostLoader pad label), which numpy negative
    indexing would otherwise silently count into the last class."""
    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    for t, p in zip(np.asarray(targets), np.asarray(preds)):
        if 0 <= p < num_classes and 0 <= t < num_classes:
            cm[t, p] += 1
    return cm


def weighted_auc_ovr(targets, probs, num_classes: int) -> Optional[float]:
    """Weighted one-vs-rest AUC (reference --compute_auc path, :840-852).
    Returns None on failure, like the reference's try/except."""
    from sklearn.metrics import roc_auc_score

    try:
        if num_classes > 2:
            # TPU bf16 matmuls can leave softmax rows summing to 1 +- 1e-3,
            # which sklearn's multiclass validation rejects; renormalise
            probs = np.asarray(probs, dtype=np.float64)
            probs = probs / np.maximum(probs.sum(axis=1, keepdims=True), 1e-12)
            return float(
                roc_auc_score(targets, probs, multi_class="ovr", average="weighted")
            )
        return float(roc_auc_score(targets, np.asarray(probs)[:, 1]))
    except ValueError:
        return None


class Timer:
    """Per-item wall-clock spans, dumped to the reference's times_*.json
    format (a bare JSON list of seconds)."""

    def __init__(self):
        self.times: List[float] = []
        self._start = None

    def start(self):
        self._start = time.perf_counter()

    def stop(self):
        if self._start is None:
            raise RuntimeError("Timer.stop() before start()")
        self.times.append(time.perf_counter() - self._start)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            raise ValueError("Timer recorded no spans")
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "total_s": float(arr.sum()),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
        }

    def dump(self, path: str):
        import json
        import os

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.times, f, indent=4)
