"""Mixup / CutMix batch mixing (additive TPU extras: ``--mixup`` /
``--cutmix`` on the train CLIs; no reference counterpart — the reference
trains with per-image torchvision augmentations only,
train_best_RESNET50_Truncate.py:72-88).

Semantics follow timm's Mixup in its default batch mode: one lambda ~
Beta(alpha, alpha) per batch, CutMix box area = (1 - lambda) with lambda
corrected to the exact clipped-box pixel ratio, and — when both knobs are
on — a fair per-batch coin choosing which of the two applies. The loss is
``lam * CE(y) + (1 - lam) * CE(y_partner)``.

TPU-first deviation (documented in ARCHITECTURE.md): the mixing partner is
the batch ROLLED by a random offset, not a random permutation. A gather by
a traced permutation along the batch axis would become an all-to-all under
data sharding; a roll is a collective-permute riding the ICI ring, and the
loader already shuffles, so the pairing is still uniform at the batch level.
Rolling also keeps the pad bookkeeping exact: the partner label multiset
equals the batch's, so both CE terms share one valid count (the grad-accum
step relies on this).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

# fold_in tag deriving the mixing key from the step key, so switching the
# knob on leaves the augmentation stream untouched
_MIX_TAG = 0x6D6978  # "mix"


def mix_key_from(key: jax.Array) -> jax.Array:
    return jax.random.fold_in(key, _MIX_TAG)


def _roll_partner(images: jax.Array, labels: jax.Array, key: jax.Array):
    b = images.shape[0]
    shift = jax.random.randint(key, (), 1, max(b, 2))
    return (
        jnp.roll(images, shift, axis=0),
        jnp.roll(labels, shift, axis=0),
    )


def _mixup_images(images, partner, lam):
    lam = lam.astype(images.dtype)
    return lam * images + (1.0 - lam) * partner


def cutmix_box(key: jax.Array, h: int, w: int, lam: jax.Array):
    """timm rand_bbox: a box centred uniformly with side ratio
    sqrt(1 - lam), clipped to the image — returns (y1, x1, y2, x2) and the
    CORRECTED lambda = 1 - box_area / (H * W)."""
    ky, kx = jax.random.split(key)
    ratio = jnp.sqrt(1.0 - lam)
    rh = jnp.floor(h * ratio).astype(jnp.int32)
    rw = jnp.floor(w * ratio).astype(jnp.int32)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y1 = jnp.clip(cy - rh // 2, 0, h)
    y2 = jnp.clip(cy + rh // 2, 0, h)
    x1 = jnp.clip(cx - rw // 2, 0, w)
    x2 = jnp.clip(cx + rw // 2, 0, w)
    lam_adj = 1.0 - ((y2 - y1) * (x2 - x1)).astype(jnp.float32) / float(h * w)
    return (y1, x1, y2, x2), lam_adj


def _cutmix_images(images, partner, box):
    """Paste the partner's box region (static shapes: a broadcasted-iota
    mask, no dynamic slicing)."""
    y1, x1, y2, x2 = box
    h, w = images.shape[1], images.shape[2]
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    inbox = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
    return jnp.where(inbox[None, :, :, None], partner, images)


def make_mix_fn(
    mixup_alpha: Optional[float] = None,
    cutmix_alpha: Optional[float] = None,
    switch_prob: float = 0.5,
) -> Optional[Callable]:
    """``mix(images, labels, key) -> (images, labels_a, labels_b, lam)`` —
    fully jittable, applied to the augmented float batch inside the train
    step. None when both alphas are off (the train step then compiles the
    exact unmixed program)."""
    use_mixup = mixup_alpha is not None and mixup_alpha > 0
    use_cutmix = cutmix_alpha is not None and cutmix_alpha > 0
    if not (use_mixup or use_cutmix):
        return None

    def mix(images: jax.Array, labels: jax.Array, key: jax.Array
            ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        k_lam, k_roll, k_box, k_switch = jax.random.split(key, 4)
        partner, labels_b = _roll_partner(images, labels, k_roll)
        h, w = images.shape[1], images.shape[2]

        def do_mixup(_):
            lam = jax.random.beta(k_lam, mixup_alpha, mixup_alpha)
            lam = lam.astype(jnp.float32)
            return _mixup_images(images, partner, lam), lam

        def do_cutmix(_):
            lam = jax.random.beta(k_lam, cutmix_alpha, cutmix_alpha)
            box, lam_adj = cutmix_box(k_box, h, w, lam.astype(jnp.float32))
            return _cutmix_images(images, partner, box), lam_adj

        if use_mixup and use_cutmix:
            coin = jax.random.bernoulli(k_switch, switch_prob)
            mixed, lam = jax.lax.cond(coin, do_cutmix, do_mixup, None)
        elif use_cutmix:
            mixed, lam = do_cutmix(None)
        else:
            mixed, lam = do_mixup(None)
        return mixed, labels, labels_b, lam

    return mix
