"""Functional ResNet50 (bottleneck v1), truncatable at any torchvision
"child" boundary — the truncation unit of the reference models
(Models/Models_RESNET50_TRUNCATE.py:9-14, list(children())[:truncate]).

Child index map (torchvision resnet50.children() order):
    0 conv1   1 bn1   2 relu   3 maxpool
    4 layer1  5 layer2  6 layer3  7 layer4
    8 avgpool 9 fc

Param tree mirrors torchvision's module nesting so the .pth converter is a
key-for-key relabelling: params["layer2"][1]["conv3"]["kernel"] etc. BN
running stats live in the same tree ("mean"/"var" leaves); trainability is
expressed with a leaf-path mask (see train/optim.py), matching how torch
excludes buffers from the optimiser.

All activations NHWC; convs are bias-free as in torchvision.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, max_pool2d
from ..ops.norm import batch_norm, batch_norm_init
from ..ops.pooling import global_avg_pool
from ..ops.linear import linear_init
from ..ops.gram import gram_matrix_nhwc, pooled_gram_nhwc

RESNET50_CHILDREN = (
    "conv1", "bn1", "relu", "maxpool",
    "layer1", "layer2", "layer3", "layer4",
    "avgpool", "fc",
)

# (num_blocks, bottleneck width, first-block stride) per stage
_STAGES = (("layer1", 3, 64, 1), ("layer2", 4, 128, 2),
           ("layer3", 6, 256, 2), ("layer4", 3, 512, 2))

EXPANSION = 4


def resnet50_stage_channels() -> Dict[str, int]:
    return {name: width * EXPANSION for name, _, width, _ in _STAGES}


def truncated_feature_channels(truncate: int) -> int:
    """Static shape inference replacing the reference's dummy forward
    (Models/Models_RESNET50_TRUNCATE.py:18-23)."""
    if truncate <= 0:
        return 3
    c = 64
    for i, (name, _, width, _) in enumerate(_STAGES):
        if truncate > 4 + i:
            c = width * EXPANSION
    return c


def _he_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    """torchvision resnet init: kaiming_normal(fan_out, relu)."""
    fan_out = kh * kw * cout
    std = (2.0 / fan_out) ** 0.5
    return {"kernel": jax.random.normal(key, (kh, kw, cin, cout), dtype) * std}


def _bottleneck_init(key, cin, width, stride, dtype=jnp.float32):
    cout = width * EXPANSION
    keys = jax.random.split(key, 4)
    block = {
        "conv1": _he_conv(keys[0], 1, 1, cin, width, dtype),
        "bn1": batch_norm_init(width, dtype),
        "conv2": _he_conv(keys[1], 3, 3, width, width, dtype),
        "bn2": batch_norm_init(width, dtype),
        "conv3": _he_conv(keys[2], 1, 1, width, cout, dtype),
        "bn3": batch_norm_init(cout, dtype),
    }
    if stride != 1 or cin != cout:
        block["downsample"] = {
            "conv": _he_conv(keys[3], 1, 1, cin, cout, dtype),
            "bn": batch_norm_init(cout, dtype),
        }
    return block


def resnet50_init(key: jax.Array, num_classes: int = 1000, dtype=jnp.float32) -> Dict[str, Any]:
    keys = jax.random.split(key, 6)
    params: Dict[str, Any] = {
        "conv1": _he_conv(keys[0], 7, 7, 3, 64, dtype),
        "bn1": batch_norm_init(64, dtype),
    }
    cin = 64
    for i, (name, blocks, width, stride) in enumerate(_STAGES):
        bkeys = jax.random.split(keys[1 + i], blocks)
        stage: List[Dict[str, Any]] = []
        for b in range(blocks):
            stage.append(_bottleneck_init(bkeys[b], cin, width, stride if b == 0 else 1, dtype))
            cin = width * EXPANSION
        params[name] = stage
    params["fc"] = linear_init(keys[5], cin, num_classes, dtype)
    return params


def _bottleneck_apply(block, x, stride, train=False):
    new_block = dict(block) if train else None

    def bn(name, h):
        nonlocal new_block
        if train:
            y, nb = batch_norm(block[name], h, train=True)
            new_block[name] = nb
            return y
        return batch_norm(block[name], h, train=False)

    identity = x
    h = jax.nn.relu(bn("bn1", conv2d(block["conv1"], x)))
    h = jax.nn.relu(bn("bn2", conv2d(block["conv2"], h, stride=stride, padding=1)))
    h = conv2d(block["conv3"], h)
    h = bn("bn3", h)
    if "downsample" in block:
        identity = conv2d(block["downsample"]["conv"], x, stride=stride)
        if train:
            identity, nb = batch_norm(block["downsample"]["bn"], identity, train=True)
            new_block["downsample"] = dict(block["downsample"], bn=nb)
        else:
            identity = batch_norm(block["downsample"]["bn"], identity, train=False)
    out = jax.nn.relu(h + identity)
    return (out, new_block) if train else (out, None)


# Rematerialised bottleneck: under autodiff only the block's INPUT is saved
# and the three conv/BN/relu intermediates are recomputed in the backward —
# trading ~one extra forward of FLOPs per block for the dominant share of
# activation HBM. stride/train are Python-static.
_bottleneck_apply_remat = jax.checkpoint(_bottleneck_apply, static_argnums=(2, 3))


def _stage_apply(stage, x, first_stride, train=False, remat=False):
    apply_fn = _bottleneck_apply_remat if remat else _bottleneck_apply
    new_stage = [] if train else None
    for b, block in enumerate(stage):
        x, nb = apply_fn(block, x, first_stride if b == 0 else 1, train)
        if train:
            new_stage.append(nb)
    return x, new_stage


def resnet50_stem(params, x, train=False):
    """Children 0..3: conv1 -> bn1 -> relu -> maxpool."""
    new = dict(params) if train else None
    h = conv2d(params["conv1"], x, stride=2, padding=3)
    if train:
        h, nb = batch_norm(params["bn1"], h, train=True)
        new["bn1"] = nb
    else:
        h = batch_norm(params["bn1"], h, train=False)
    h = jax.nn.relu(h)
    h = max_pool2d(h, 3, 2, 1)
    return h, new


def resnet50_apply(
    params: Dict[str, Any],
    x: jax.Array,
    truncate: int = 10,
    train: bool = False,
    collect_grams: bool = False,
    gram_pool_size: Optional[int] = None,
    remat: bool = False,
) -> Tuple[jax.Array, List[jax.Array], Optional[Dict[str, Any]]]:
    """Run children [0:truncate].

    Returns (features, grams, new_params_or_None).

    - ``collect_grams``: one Gram per executed stage (layer1..layer4), the
      gram-attention model's hook (Models_RESNET50_TRUNCATE_GRAM_with_Attention.py:43-46).
    - ``gram_pool_size``: if set, grams are the adaptively pooled (S, S)
      version, computed with the projected-first fast path (ops/gram.py).
    - ``remat``: checkpoint each bottleneck (``jax.checkpoint``) so the
      backward recomputes block-internal activations instead of keeping them
      resident — raises the trainable batch ceiling at ~+1/3 forward FLOPs.
      Stage outputs (the Gram hook points) are block boundaries, so they are
      saved either way. No effect on eval (no backward to feed).
    - child 8 (avgpool) maps to global average pooling + flatten; child 9 (fc)
      applies the classification head.
    """
    grams: List[jax.Array] = []
    new_params = dict(params) if train else None

    stem_depth = min(truncate, 4)
    if stem_depth >= 1:
        h = conv2d(params["conv1"], x, stride=2, padding=3)
    else:
        return x, grams, new_params
    if stem_depth >= 2:
        if train:
            h, nb = batch_norm(params["bn1"], h, train=True)
            new_params["bn1"] = nb
        else:
            h = batch_norm(params["bn1"], h, train=False)
    if stem_depth >= 3:
        h = jax.nn.relu(h)
    if stem_depth >= 4:
        h = max_pool2d(h, 3, 2, 1)

    for i, (name, _, _, stride) in enumerate(_STAGES):
        if truncate <= 4 + i:
            break
        h, ns = _stage_apply(params[name], h, stride, train=train, remat=remat)
        if train:
            new_params[name] = ns
        if collect_grams:
            if gram_pool_size is not None:
                grams.append(pooled_gram_nhwc(h, gram_pool_size))
            else:
                grams.append(gram_matrix_nhwc(h))

    if truncate >= 9:
        h = global_avg_pool(h)
    if truncate >= 10:
        from ..ops.linear import linear

        h = linear(params["fc"], h)
    return h, grams, new_params
