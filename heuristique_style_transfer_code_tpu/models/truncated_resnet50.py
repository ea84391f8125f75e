"""Model family 1: TruncatedMoCoV3 + Classifier (+ combined).

Reference: Models/Models_RESNET50_TRUNCATE.py
- TruncatedMoCoV3 (:5-33): resnet50 children [:-1][:truncate] ->
  AdaptiveAvgPool2d(1,1) -> Flatten -> Linear(feat, dim=256)
- Classifier (:37-43): Linear(256, num_classes)
- CombinedModel (:45-54): classifier(moco(x))

The reference discovers the feature dim with a dummy forward (:18-23); here
it is static shape inference (nn.resnet.truncated_feature_channels).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.resnet import (
    RESNET50_CHILDREN,
    resnet50_apply,
    resnet50_init,
    truncated_feature_channels,
)
from ..ops.linear import linear, linear_init
from ..ops.pooling import global_avg_pool


def _prune_encoder(full: Dict[str, Any], truncate: int) -> Dict[str, Any]:
    """Keep only the children the truncation actually uses (mirrors what a
    torch state_dict of the truncated Sequential would contain)."""
    keep = {}
    for i, name in enumerate(RESNET50_CHILDREN[: min(truncate, 8)]):
        if name in full:
            keep[name] = full[name]
    return keep


def truncated_moco_init(
    key: jax.Array, truncate_layer: int, dim: int = 256, dtype=jnp.float32
) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    encoder = _prune_encoder(resnet50_init(k1, dtype=dtype), truncate_layer)
    feat = truncated_feature_channels(truncate_layer)
    return {"encoder": encoder, "fc": linear_init(k2, feat, dim, dtype)}


def truncated_moco_apply(
    params: Dict[str, Any],
    x: jax.Array,
    truncate: int,
    train: bool = False,
    remat: bool = False,
) -> Tuple[jax.Array, Optional[Dict[str, Any]]]:
    """x: (N, H, W, 3) NHWC -> embeddings (N, dim)."""
    feats, _, new_enc = resnet50_apply(
        params["encoder"], x, truncate=min(truncate, 9), train=train, remat=remat
    )
    if truncate <= 8:
        feats = global_avg_pool(feats)
    emb = linear(params["fc"], feats)
    if train:
        return emb, {"encoder": new_enc, "fc": params["fc"]}
    return emb, None


def classifier_init(key: jax.Array, input_dim: int, num_classes: int, dtype=jnp.float32):
    return {"fc": linear_init(key, input_dim, num_classes, dtype)}


def classifier_apply(params, x: jax.Array) -> jax.Array:
    return linear(params["fc"], x)


def combined_apply(
    moco_params, clf_params, x: jax.Array, truncate: int, train: bool = False,
    remat: bool = False,
):
    emb, new_moco = truncated_moco_apply(moco_params, x, truncate, train=train,
                                         remat=remat)
    logits = classifier_apply(clf_params, emb)
    if train:
        return logits, new_moco
    return logits, None


def prepare_combined_int8(moco_params, truncate: int, calibration_batches):
    """PTQ the encoder (truncate must be in [4, 8]); the avgpool + MoCo fc +
    classifier heads are tiny and stay in float. Returns the quantised
    encoder tree for ``combined_apply_int8``."""
    from ..nn.resnet_int8 import prepare_int8_resnet

    return prepare_int8_resnet(moco_params["encoder"], calibration_batches, truncate)


def combined_apply_qat(moco_params, clf_params, act_scales, x: jax.Array,
                       truncate: int):
    """QAT fine-tune forward: fake-quant encoder (differentiable simulation
    of the int8 deploy graph, nn/resnet_qat.py) + float heads — the training
    twin of ``combined_apply_int8``. Returns logits."""
    from ..nn.resnet_qat import qat_resnet50_apply

    feats = qat_resnet50_apply(moco_params["encoder"], act_scales, x, truncate)
    emb = linear(moco_params["fc"], global_avg_pool(feats))
    return linear(clf_params["fc"], emb)


def combined_apply_int8(q_encoder, moco_params, clf_params, x: jax.Array):
    """int8 inference forward: quantised encoder + float heads. Same
    signature contract as the eval-mode combined_apply (returns (logits, None))."""
    from ..nn.resnet_int8 import resnet50_apply_int8

    feats = resnet50_apply_int8(q_encoder, x)
    emb = linear(moco_params["fc"], global_avg_pool(feats))
    return linear(clf_params["fc"], emb), None
