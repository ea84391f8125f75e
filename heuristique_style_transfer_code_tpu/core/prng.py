"""Seeding / reproducibility.

Mirrors the reference's seed handling (train_best_RESNET50_Truncate.py:58-70):
seed resolution order is config > CLI > random, and the chosen seed is written
back into the hyperparameter dict so reruns are repeatable.
"""
from __future__ import annotations

import random
from typing import Iterator, Optional

import jax
import numpy as np


def seed_everything(seed: Optional[int]) -> tuple[int, jax.Array]:
    """Seed python/numpy RNGs and return (seed, jax PRNG key).

    If ``seed`` is None, draws a fresh one (like the reference's
    ``random.randint(0, 1000000)`` fallback).
    """
    if seed is None:
        seed = random.randint(0, 1_000_000)
    random.seed(seed)
    np.random.seed(seed)
    return seed, jax.random.PRNGKey(seed)


def key_iter(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of fresh PRNG keys."""
    while True:
        key, sub = jax.random.split(key)
        yield sub
