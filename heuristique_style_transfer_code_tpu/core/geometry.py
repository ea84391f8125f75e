"""Canonical host-side resize/crop geometry (pure Python, no jax/numpy).

One definition of the reference transform's integer arithmetic
(torchvision ``Resize(shorter)`` target + ``center_crop`` offsets,
train_best_RESNET50_Truncate.py:126-132), shared by every consumer —
the PIL staging loader, the native C++ decoder's Python driver, and the
on-device resize — so the bit-parity contract between them cannot drift.

Integer rules, each pinned by tests/test_ops_golden.py::TestResize:
``resize_target`` TRUNCATES the scaled long side (torchvision's
``int(size * long / short)``); ``center_crop_offsets`` uses Python round()
(banker's) on the half-gap. Mixing them up breaks torchvision parity.
"""
from __future__ import annotations

from typing import Tuple


def resize_target(h: int, w: int, shorter: int) -> Tuple[int, int]:
    """torchvision Resize(int): scale the shorter side to ``shorter``,
    keep aspect ratio. Returns (target_h, target_w).

    The long side TRUNCATES (torchvision F_pil.resize /
    _compute_resized_output_size both compute ``int(size * long / short)``)
    — round() deviated on every image whose scaled long side has fractional
    part >= 0.5 (review finding; e.g. 333x499 @256 is (256, 383), not 384)."""
    if h <= w:
        return shorter, max(1, int(w * shorter / h))
    return max(1, int(h * shorter / w)), shorter


def center_crop_offsets(h: int, w: int, size: int) -> Tuple[int, int]:
    """torchvision F.center_crop offset rule: round((in - out) / 2),
    clamped at 0. Returns (top, left)."""
    top = int(round((h - size) / 2.0)) if h > size else 0
    left = int(round((w - size) / 2.0)) if w > size else 0
    return top, left


def staging_geometry(w: int, h: int, staging: int) -> Tuple[int, int, int, int]:
    """Full staged-decode plan for an (w, h) source: resize so the shorter
    side is ``staging``, center-crop (staging, staging).
    Returns (target_w, target_h, left, top)."""
    th, tw = resize_target(h, w, staging)
    top, left = center_crop_offsets(th, tw, staging)
    return tw, th, left, top
