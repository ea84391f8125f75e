"""Embedding extraction over a loader (reference
functions/functions_RESNET50_Truncate.py:391-420, with the Subset img_paths
bug of functions_RESNET50_Truncate_Gram_Attention.py:191-194 fixed: paths are
taken from the loader's own sample order, once each)."""
from __future__ import annotations

from typing import Callable, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.augment import eval_preprocess


def compute_embeddings_with_paths(
    embed_fn: Callable,
    variables,
    loader,
    samples,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """embed_fn(variables, images) -> embeddings. Returns
    (embeddings (N, D), labels (N,), img_paths). ``mesh``: optional
    data-parallel mesh (--devices) sharding the batch over 'data'."""
    from ..core.mesh import jit_eval_step

    def step(v, images_u8):
        return embed_fn(v, eval_preprocess(images_u8))

    step = jit_eval_step(step, mesh, n_batch_inputs=1)

    all_emb, all_labels, img_paths = [], [], []
    for batch in loader:
        emb = step(variables, jnp.asarray(batch["image"]))
        n = batch["n_valid"]
        all_emb.append(np.asarray(emb)[:n])
        all_labels.append(batch["label"][:n])
        img_paths.extend(samples[i][0] for i in batch["indices"][:n])
    return np.concatenate(all_emb), np.concatenate(all_labels), img_paths
