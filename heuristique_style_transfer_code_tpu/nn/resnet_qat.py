"""Quantization-aware training (QAT) for the int8 ResNet50 path (opt-in).

PTQ (nn/resnet_int8.py) quantises a trained f32 model after the fact; its
accuracy floor is set by whatever error the calibrated scales leave. QAT
recovers that error by fine-tuning the f32 weights THROUGH a fake-quant
forward that simulates the int8 deploy graph node for node:

- same dataflow as ``resnet50_apply_int8`` (BN folded into convs, quant
  points at the stem input, post-ReLU tensors and block outputs);
- BN folded on the fly from the CURRENT f32 params with eval-mode running
  stats (stats frozen during the fine-tune, the standard short-QAT recipe),
  so folding stays exact and gradients flow to conv kernels and BN affine
  params;
- weights fake-quantised symmetric per-output-channel with the scale
  recomputed from the live folded kernel (maxabs/127 — the same derivation
  ``quantize_resnet50`` bakes at export, so training simulates exactly what
  export ships);
- activations fake-quantised per-tensor with the FIXED calibrated scales
  (deploy constants);
- rounding passes gradients by the clipped straight-through estimator:
  identity inside [-127, 127] x scale, zero outside.

Because the parameter tree is the UNCHANGED f32 encoder tree, export after
QAT is just ``quantize_resnet50(params, scales, truncate)`` — there is no
separate QAT checkpoint format. The key contract (tested): the fake-quant
eval forward equals the int8 forward's dequantised output to f32 rounding.

This is an additive TPU-native capability: the reference has no quantised
path. CLI surface: ``--qat_steps N`` next to ``--precision int8`` on the
family-1/2 eval CLIs (fine-tunes on the calibration split before export).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.conv import max_pool2d
from ..ops.norm import EPS
from .resnet import _STAGES

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def fake_quant(x: jax.Array, scale, axis: Optional[int] = None) -> jax.Array:
    """Clipped-STE symmetric int8 fake-quantisation.

    Forward: round(clip(x/s, -127, 127)) * s — the exact value the int8
    graph dequantises to. Backward: identity where |x/s| <= 127, zero
    outside (clip is differentiable-as-zero there; the round is bridged by
    the straight-through estimator)."""
    y = jnp.clip(x / scale, -127.0, 127.0)
    yq = y + lax.stop_gradient(jnp.round(y) - y)
    return yq * scale


def _fold_bn(conv: Dict, bn: Dict) -> Tuple[jax.Array, jax.Array]:
    """Differentiable eval-mode BN fold: running stats are constants
    (stop_gradient — frozen during QAT), scale/bias/kernel carry grads."""
    inv = bn["scale"] / jnp.sqrt(lax.stop_gradient(bn["var"]) + EPS)
    k = conv["kernel"].astype(jnp.float32) * inv[None, None, None, :]
    b = bn["bias"] - lax.stop_gradient(bn["mean"]) * inv
    return k, b


def _fq_weight(k: jax.Array) -> jax.Array:
    """Per-output-channel weight fake-quant; the scale (maxabs/127, the
    export derivation) is treated as a constant each step."""
    maxabs = jnp.max(jnp.abs(k), axis=(0, 1, 2))
    s = lax.stop_gradient(jnp.where(maxabs > 0, maxabs / 127.0, 1.0))
    return fake_quant(k, s[None, None, None, :])


def _conv_fq(x, conv, bn, stride: int = 1, padding: int = 0):
    """Fake-quant twin of resnet_int8._conv_i8: fq(folded kernel) applied to
    an already-fake-quantised input, plus the folded bias."""
    k, b = _fold_bn(conv, bn)
    y = lax.conv_general_dilated(
        x,
        _fq_weight(k),
        (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=_DIMNUMS,
    )
    return y + b


def qat_resnet50_apply(
    params: Dict[str, Any],
    act_scales: Dict[str, Any],
    x: jax.Array,
    truncate: int,
    collect_grams: bool = False,
    gram_pool_size: Optional[int] = None,
) -> Any:
    """Fake-quant forward over the f32 encoder tree — the differentiable
    simulation of ``resnet50_apply_int8(quantize_resnet50(params, ...), x)``.

    x: normalised f32 NHWC; act_scales: calibrate_activation_scales output;
    truncate in [4, 8] (same support as the int8 path)."""
    if not 4 <= truncate <= 8:
        raise ValueError("QAT path supports truncate in [4, 8]")
    grams: List[jax.Array] = []
    h = fake_quant(x.astype(jnp.float32), act_scales["input"])
    h = _conv_fq(h, params["conv1"], params["bn1"], stride=2, padding=3)
    h = fake_quant(jax.nn.relu(h), act_scales["stem"])
    # monotonic: pooling the fake-quantised tensor == the int8 graph's
    # int8 maxpool (same argument as resnet_int8)
    h = max_pool2d(h, 3, 2, 1)

    for si, (name, _, _, stride) in enumerate(_STAGES):
        if truncate <= 4 + si:
            break
        for b, block in enumerate(params[name]):
            st = stride if b == 0 else 1
            sc = act_scales[name][b]
            a = fake_quant(
                jax.nn.relu(_conv_fq(h, block["conv1"], block["bn1"])),
                sc["h1"],
            )
            bq = fake_quant(
                jax.nn.relu(_conv_fq(a, block["conv2"], block["bn2"],
                                     stride=st, padding=1)),
                sc["h2"],
            )
            y = _conv_fq(bq, block["conv3"], block["bn3"])
            if "downsample" in block:
                identity = _conv_fq(h, block["downsample"]["conv"],
                                    block["downsample"]["bn"], stride=st)
            else:
                identity = h
            h = fake_quant(jax.nn.relu(y + identity), sc["out"])
        if collect_grams:
            from ..ops.gram import gram_matrix_nhwc, pooled_gram_nhwc

            if gram_pool_size is not None:
                grams.append(pooled_gram_nhwc(h, gram_pool_size))
            else:
                grams.append(gram_matrix_nhwc(h))
    if collect_grams:
        return h, grams
    return h
