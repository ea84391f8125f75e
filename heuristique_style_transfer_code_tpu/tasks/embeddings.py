"""Embedding extraction over a loader (reference
functions/functions_RESNET50_Truncate.py:391-420, with the Subset img_paths
bug of functions_RESNET50_Truncate_Gram_Attention.py:191-194 fixed: paths are
taken from the loader's own sample order, once each)."""
from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np

from ..data.augment import eval_preprocess


def compute_embeddings_with_paths(
    embed_fn: Callable,
    variables,
    loader,
    samples,
    mesh=None,
    steps_per_dispatch: int = 1,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """embed_fn(variables, images) -> embeddings. Returns
    (embeddings (N, D), labels (N,), img_paths). ``mesh``: optional
    data-parallel mesh (--devices) sharding the batch over 'data'.
    ``steps_per_dispatch``: extract K loader batches per device dispatch
    (bit-identical results, (K-1)/K less per-batch round-trip overhead)."""
    from ..core.mesh import scanned_eval_iter

    def step(v, images_u8):
        return embed_fn(v, eval_preprocess(images_u8))

    all_emb, all_labels, img_paths = [], [], []
    for batch, emb in scanned_eval_iter(
        step, variables, loader, mesh,
        input_keys=("image",), steps_per_dispatch=steps_per_dispatch,
    ):
        n = batch["n_valid"]
        all_emb.append(emb[:n])
        all_labels.append(batch["label"][:n])
        img_paths.extend(samples[i][0] for i in batch["indices"][:n])
    return np.concatenate(all_emb), np.concatenate(all_labels), img_paths
