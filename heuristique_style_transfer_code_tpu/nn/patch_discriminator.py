"""PatchGAN-style discriminators (the Multi_PatchGAN model family).

Architecture rules follow the reference exactly — depth is derived from the
patch size by the halving loop
``while receptive_field > 4 and num_filters <= 512``
(Models/Models_Multi_PatchGAN.py:40-46 train, :143-151 test) — but resolved
*statically* here via ``discriminator_layer_plan`` so each config compiles to
one fixed XLA graph.

Two variants:
- train (:17-65): conv(4,s2,p1)+norm+LeakyReLU(0.2) stack, final convs, spatial
  mean -> logits.
- test (:113-264): conv stack with ReLU, per-conv 1x1 projections to
  ``gram_matrix_dim`` channels + tail layer-norm, 4x4-pooled per-layer Gram
  matrices (+ Frobenius norms), Gram->ndf projection, two stacked 8-head
  attentions, mean aggregate, linear head. Returns (embeddings, logits,
  gram_norms).

All NHWC. Norm choice 'instance' (no affine) / 'batch' (affine + running
stats) matches the torch defaults.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, conv2d_init
from ..ops.norm import batch_norm, batch_norm_init, instance_norm, layer_norm_tail
from ..ops.pooling import adaptive_avg_pool2d
from ..ops.linear import linear, linear_init
from ..ops.attention import multihead_attention, multihead_attention_init

# patch-size validity ranges per scale (Models/Models_Multi_PatchGAN.py:11-15)
PATCH_TYPES = {"small": (4, 30), "medium": (31, 80), "large": (81, 150)}

GRAM_EPS = 1e-6


def discriminator_layer_plan(patch_size: int, ndf: int = 64, input_nc: int = 3):
    """Static unroll of the reference's depth loop.

    Returns (strided, final_in, final_out): ``strided`` is a list of
    (cin, cout) for the stride-2 convs; the final conv maps final_in->final_out
    at stride 1.
    """
    strided: List[Tuple[int, int]] = []
    num_filters = ndf
    cin = input_nc
    receptive = float(patch_size)
    while receptive > 4 and num_filters <= 512:
        strided.append((cin, num_filters))
        cin = num_filters
        num_filters *= 2
        receptive /= 2.0
    return strided, cin, num_filters


def _norm_init(norm: str, channels: int):
    if norm == "batch":
        return batch_norm_init(channels)
    return None  # instance norm: no parameters (affine=False)


def _apply_norm(norm: str, norm_params, x, train: bool):
    if norm == "batch":
        if train:
            return batch_norm(norm_params, x, train=True)
        return batch_norm(norm_params, x, train=False), norm_params
    return instance_norm(x), norm_params


# ---------------------------------------------------------------- train variant


def patch_discriminator_init(
    key: jax.Array,
    patch_size: int = 70,
    ndf: int = 64,
    input_nc: int = 3,
    num_classes: int = 10,
    norm: str = "instance",
):
    strided, final_in, final_out = discriminator_layer_plan(patch_size, ndf, input_nc)
    n_keys = len(strided) + 2
    keys = jax.random.split(key, n_keys)
    params: Dict[str, Any] = {
        "convs": [
            {"conv": conv2d_init(keys[i], cin, cout, 4), "norm": _norm_init(norm, cout)}
            for i, (cin, cout) in enumerate(strided)
        ],
        "final": {
            "conv": conv2d_init(keys[-2], final_in, final_out, 4),
            "norm": _norm_init(norm, final_out),
        },
        "out_conv": conv2d_init(keys[-1], final_out, num_classes, 4),
    }
    return params


def _strided_layer(entry, x, norm, train):
    """One stride-2 conv + norm + LeakyReLU unit of the train variant."""
    x = conv2d(entry["conv"], x, stride=2, padding=1)
    x, n_norm = _apply_norm(norm, entry["norm"], x, train)
    return jax.nn.leaky_relu(x, 0.2), n_norm


_strided_layer_remat = jax.checkpoint(_strided_layer, static_argnums=(2, 3))


def patch_discriminator_apply(params, x: jax.Array, norm: str = "instance", train: bool = False,
                              remat: bool = False):
    """x: (N, H, W, C) -> logits (N, num_classes) = spatial mean of patch map
    (Models/Models_Multi_PatchGAN.py:56-61). ``remat`` checkpoints each
    strided unit (see nn/resnet.py) — the early full-resolution layers
    dominate activation HBM."""
    new_params = {"convs": [], "final": None, "out_conv": params["out_conv"]} if train else None

    layer_fn = _strided_layer_remat if remat else _strided_layer
    for entry in params["convs"]:
        x, n_norm = layer_fn(entry, x, norm, train)
        if train:
            new_params["convs"].append({"conv": entry["conv"], "norm": n_norm})
    x = conv2d(params["final"]["conv"], x, stride=1, padding=1)
    x, n_norm = _apply_norm(norm, params["final"]["norm"], x, train)
    if train:
        new_params["final"] = {"conv": params["final"]["conv"], "norm": n_norm}
    x = jax.nn.leaky_relu(x, 0.2)
    x = conv2d(params["out_conv"], x, stride=1, padding=1)
    logits = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
    return (logits, new_params) if train else (logits, None)


# ----------------------------------------------------------------- test variant


def patch_discriminator_test_init(
    key: jax.Array,
    patch_size: int = 70,
    ndf: int = 64,
    input_nc: int = 3,
    num_classes: int = 10,
    gram_matrix_dim: int = 64,
    norm: str = "instance",
):
    strided, final_in, final_out = discriminator_layer_plan(patch_size, ndf, input_nc)
    # conv entries in order: strided convs, final_conv, final_conv_ndf
    conv_outs = [cout for _, cout in strided] + [final_out, ndf]
    n = len(strided)
    keys = jax.random.split(key, n + 2 + len(conv_outs) + 4)
    ki = iter(keys)
    features = [
        {"conv": conv2d_init(next(ki), cin, cout, 4), "norm": _norm_init(norm, cout)}
        for (cin, cout) in strided
    ]
    features.append(
        {"conv": conv2d_init(next(ki), final_in, final_out, 4), "norm": _norm_init(norm, final_out)}
    )
    features.append({"conv": conv2d_init(next(ki), final_out, ndf, 4), "norm": None})
    return {
        "features": features,
        "projections": [conv2d_init(next(ki), c, gram_matrix_dim, 1) for c in conv_outs],
        "attention_per_layer": multihead_attention_init(next(ki), ndf, 8),
        "attention_per_patch": multihead_attention_init(next(ki), ndf, 8),
        "classifier": linear_init(next(ki), ndf, num_classes),
        "feature_projection": linear_init(next(ki), gram_matrix_dim * gram_matrix_dim, ndf),
    }


def patch_discriminator_test_apply(
    params,
    x: jax.Array,
    gram_matrix_dim: int,
    norm: str = "instance",
) -> Tuple[jax.Array, jax.Array, List[jax.Array]]:
    """Returns (embeddings (N, ndf), logits (N, classes), gram_norms list).

    Mirrors Models/Models_Multi_PatchGAN.py:177-258 (inference semantics: the
    NaN scrubs are identity on clean data and are intentionally not
    reproduced; jnp.nan_to_num would block XLA fusion for no benefit).
    """
    n_strided = len(params["features"]) - 2
    feature_maps = []
    for i, entry in enumerate(params["features"]):
        stride = 2 if i < n_strided else 1
        x = conv2d(entry["conv"], x, stride=stride, padding=1)
        proj = conv2d(params["projections"][i], x)  # 1x1 projection of conv output
        proj = layer_norm_tail(proj)
        feature_maps.append(proj)
        if i != len(params["features"]) - 1:  # final_conv_ndf has no norm/relu
            if norm == "batch":
                x = batch_norm(entry["norm"], x, train=False)
            else:
                x = instance_norm(x)
            x = jax.nn.relu(x)
    # NOTE: in the torch Sequential the projection taps the *conv* output
    # before norm/relu (forward loop :186-200 checks isinstance Conv2d), and
    # the final_conv_ndf output gets a projection but no norm/relu — matched
    # above.

    per_layer = []
    gram_norms = []
    S = 4
    for fm in feature_maps:
        pooled = adaptive_avg_pool2d(fm.transpose(0, 3, 1, 2), S)  # (N, C, 4, 4)
        pooled = layer_norm_tail(pooled)
        f = pooled.reshape(pooled.shape[0], gram_matrix_dim, -1)  # (N, C, 16)
        # PET rule (CLAUDE.md / ops/conv.py:_pet): explicit f32 PET only for
        # f32 operands — bf16 f flows through here on the --precision bf16
        # style-transfer grad path
        pet = jnp.float32 if f.dtype == jnp.float32 else None
        g = jnp.einsum("ncl,ndl->ncd", f, f, preferred_element_type=pet) / (
            f.shape[-1] + GRAM_EPS
        )
        gram_norms.append(jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2))))
        flat = g.reshape(g.shape[0], -1).astype(x.dtype)
        per_layer.append(linear(params["feature_projection"], flat))

    stacked = jnp.stack(per_layer, axis=0)  # (L, N, ndf)
    att = multihead_attention(params["attention_per_layer"], stacked, num_heads=8)
    att = multihead_attention(params["attention_per_patch"], att, num_heads=8)
    embeddings = jnp.mean(att, axis=0)
    logits = linear(params["classifier"], embeddings)
    return embeddings, logits, gram_norms
