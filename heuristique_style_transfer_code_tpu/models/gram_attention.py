"""Model family 2: Truncated ResNet50 + per-stage Gram matrices + attention.

Reference: Models/Models_RESNET50_TRUNCATE_GRAM_with_Attention.py:13-114.
Forward: stem (children 0-3), then per remaining child (layer1..layer4 up to
``truncate``) collect Gram = f f^T / (h*w), adaptive-avg-pool each Gram to
(S, S), stack along a sequence axis, 1-head self-attention over the stack,
mean over the sequence, Linear(S^2, num_classes).

The train variant returns logits; the test variant additionally returns the
post-attention embeddings (:113-114). Here one apply returns both — callers
pick. The Gram+pool uses the exact projected-first identity (ops/gram.py),
turning the 2048x2048 layer4 Gram into an (S x S) one.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.resnet import resnet50_apply, resnet50_init
from ..ops.attention import multihead_attention, multihead_attention_init
from ..ops.linear import linear, linear_init
from .truncated_resnet50 import _prune_encoder


def gram_attention_init(
    key: jax.Array,
    truncate_layer: int,
    num_classes: int,
    gram_matrix_size: int,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    s2 = gram_matrix_size ** 2
    return {
        "encoder": _prune_encoder(resnet50_init(k1, dtype=dtype), truncate_layer),
        "classifier": linear_init(k2, s2, num_classes, dtype),
        "attention": multihead_attention_init(k3, s2, 1, dtype),
    }


def gram_attention_apply(
    params: Dict[str, Any],
    x: jax.Array,
    truncate: int,
    gram_matrix_size: int,
    num_classes: int,
    train: bool = False,
    remat: bool = False,
) -> Tuple[jax.Array, jax.Array, Optional[Dict[str, Any]]]:
    """x: (N, H, W, 3) -> (embeddings (N, S^2), logits (N, classes))."""
    s = gram_matrix_size
    _, grams, new_enc = resnet50_apply(
        params["encoder"],
        x,
        truncate=min(truncate, 8),
        train=train,
        collect_grams=True,
        gram_pool_size=s,
        remat=remat,
    )
    new_params = (
        {"encoder": new_enc, "classifier": params["classifier"], "attention": params["attention"]}
        if train
        else None
    )
    emb, logits = _gram_head(params, grams, x, s, num_classes)
    return emb, logits, new_params


def _gram_head(params, grams, x, s: int, num_classes: int):
    """Shared tail of the float and int8 forwards: stage Grams -> attention
    sequence -> mean-pooled embedding -> logits (zeros when no Grams were
    collected — reference behaviour, :48-49)."""
    if not grams:
        z = jnp.zeros((x.shape[0], num_classes), dtype=x.dtype)
        return jnp.zeros((x.shape[0], s * s), dtype=x.dtype), z

    # (L, N, S^2): stack stage grams as the attention sequence
    seq = jnp.stack([g.reshape(g.shape[0], s * s) for g in grams], axis=0)
    att = multihead_attention(params["attention"], seq, num_heads=1)
    emb = jnp.mean(att, axis=0)  # (N, S^2)
    logits = linear(params["classifier"], emb)
    return emb, logits


def prepare_gram_attention_int8(params, truncate: int, calibration_batches):
    """PTQ the encoder (truncate in [4, 8]); grams/attention/classifier stay
    float. Returns the quantised encoder for gram_attention_apply_int8."""
    from ..nn.resnet_int8 import prepare_int8_resnet

    return prepare_int8_resnet(params["encoder"], calibration_batches,
                               min(truncate, 8))


def gram_attention_apply_int8(
    q_encoder,
    params: Dict[str, Any],
    x: jax.Array,
    gram_matrix_size: int,
    num_classes: int,
) -> Tuple[jax.Array, jax.Array, None]:
    """int8 inference forward: quantised encoder, per-stage pooled Grams from
    the dequantised stage outputs, float attention + classifier. Same return
    contract as the eval-mode gram_attention_apply."""
    from ..nn.resnet_int8 import resnet50_apply_int8

    s = gram_matrix_size
    _, grams = resnet50_apply_int8(
        q_encoder, x, collect_grams=True, gram_pool_size=s
    )
    emb, logits = _gram_head(params, grams, x, s, num_classes)
    return emb, logits, None


def gram_attention_apply_qat(
    params: Dict[str, Any],
    act_scales,
    x: jax.Array,
    truncate: int,
    gram_matrix_size: int,
    num_classes: int,
) -> Tuple[jax.Array, jax.Array]:
    """QAT fine-tune forward: fake-quant encoder (nn/resnet_qat.py) with the
    per-stage pooled Grams computed on the fake-quantised stage outputs —
    the differentiable twin of ``gram_attention_apply_int8``. Returns
    (embeddings, logits)."""
    from ..nn.resnet_qat import qat_resnet50_apply

    s = gram_matrix_size
    _, grams = qat_resnet50_apply(
        params["encoder"], act_scales, x, min(truncate, 8),
        collect_grams=True, gram_pool_size=s,
    )
    return _gram_head(params, grams, x, s, num_classes)
