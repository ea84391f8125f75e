"""Model family 3: multi-scale PatchGAN discriminators.

Reference: Models/Models_Multi_PatchGAN.py
- MultiScaleDiscriminator (:68-111, train): three patch discriminators
  (small/medium/large patch sizes), the input is AvgPool2d(3,2,1,
  count_include_pad=False)-downsampled between scales, logits mean-stacked.
- MultiScaleDiscriminator_test (:266-321): three test discriminators fed the
  *same* input (no downsampling — reference quirk, kept for parity),
  embeddings/logits averaged, gram norms concatenated.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..nn.patch_discriminator import (
    patch_discriminator_apply,
    patch_discriminator_init,
    patch_discriminator_test_apply,
    patch_discriminator_test_init,
)
from ..ops.conv import avg_pool2d

SCALES = ("small", "medium", "large")


def multiscale_init(
    key: jax.Array,
    patch_sizes: Dict[str, int],
    ndf: int = 64,
    input_nc: int = 3,
    num_classes: int = 10,
    norm: str = "batch",
):
    keys = jax.random.split(key, len(SCALES))
    return {
        scale: patch_discriminator_init(
            keys[i], patch_sizes.get(scale, 70), ndf, input_nc, num_classes, norm
        )
        for i, scale in enumerate(SCALES)
    }


def multiscale_apply(params, x: jax.Array, norm: str = "batch", train: bool = False,
                     remat: bool = False):
    outs = []
    new_params = {} if train else None
    for scale in SCALES:
        logits, np_ = patch_discriminator_apply(params[scale], x, norm=norm, train=train,
                                                remat=remat)
        outs.append(logits)
        if train:
            new_params[scale] = np_
        x = avg_pool2d(x, 3, 2, 1, count_include_pad=False)
    combined = jnp.mean(jnp.stack(outs, axis=0), axis=0)
    return (combined, new_params) if train else (combined, None)


def multiscale_test_init(
    key: jax.Array,
    patch_sizes: Dict[str, int],
    ndf: int = 64,
    input_nc: int = 3,
    num_classes: int = 10,
    gram_matrix_dim: int = 64,
    norm: str = "batch",
):
    keys = jax.random.split(key, len(SCALES))
    return {
        scale: patch_discriminator_test_init(
            keys[i],
            patch_sizes.get(scale, 70),
            ndf,
            input_nc,
            num_classes,
            gram_matrix_dim,
            norm,
        )
        for i, scale in enumerate(SCALES)
    }


def multiscale_test_apply(
    params, x: jax.Array, gram_matrix_dim: int, norm: str = "batch"
) -> Tuple[jax.Array, jax.Array, List[jax.Array]]:
    """Returns (embeddings, logits, gram_norms) — all scales see the same x."""
    embs, outs, norms = [], [], []
    for scale in SCALES:
        e, o, gn = patch_discriminator_test_apply(
            params[scale], x, gram_matrix_dim, norm=norm
        )
        embs.append(e)
        outs.append(o)
        norms.extend(gn)
    emb = jnp.mean(jnp.stack(embs, axis=0), axis=0)
    logits = jnp.mean(jnp.stack(outs, axis=0), axis=0)
    return emb, logits, norms
