"""Post-training int8 inference for the truncated ResNet50 (opt-in).

The bf16 inference forward sits at the HBM roofline (PERF.md): the remaining
lever is cutting bytes. This module halves stored-activation traffic AND
engages the MXU's int8 path (~2x the bf16 MACs/cycle on v5e — measured
3.5x per mid-network conv with the requantisation fused into the conv
epilogue by XLA).

Scheme (standard PTQ, no Pallas needed — XLA fuses the epilogues):
- BatchNorm folded into the preceding conv (exact algebra, eval semantics
  of ops/norm.batch_norm).
- Weights: symmetric per-output-channel int8 (scale = maxabs/127).
- Activations: symmetric per-tensor int8, scales calibrated by running the
  f32 eval forward over a few representative batches and recording maxabs
  at every conv input (stem input, each post-ReLU tensor, each block
  output). Scales are Python floats baked into the compiled program.
- Convs run int8 x int8 -> int32 (`preferred_element_type=int32`), then the
  fused epilogue applies the (s_x * s_w[c]) dequant, folded bias, ReLU and
  the next tensor's requant — so tensors *stored to HBM* between convs are
  int8. The residual add happens in f32 inside the epilogue chain.

This is an additive TPU-native capability: the reference has no quantised
path. Accuracy contract is validated in tests/test_int8.py (feature cosine
similarity and logit argmax agreement vs the f32 forward).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.conv import max_pool2d
from ..ops.norm import EPS
from .resnet import _STAGES, resnet50_apply

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


# ---- BN folding ---------------------------------------------------------


def fold_conv_bn(conv: Dict, bn: Dict, eps: float = EPS) -> Tuple[np.ndarray, np.ndarray]:
    """(kernel HWIO, bias O) such that conv_b(x) == bn(conv(x)) in eval mode."""
    k = np.asarray(conv["kernel"], np.float32)
    scale = np.asarray(bn["scale"], np.float32)
    bias = np.asarray(bn["bias"], np.float32)
    mean = np.asarray(bn["mean"], np.float32)
    var = np.asarray(bn["var"], np.float32)
    inv = scale / np.sqrt(var + eps)
    return k * inv[None, None, None, :], bias - mean * inv


def _quantize_kernel(k: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel int8. Returns (int8 kernel, f32 scale O)."""
    maxabs = np.abs(k).reshape(-1, k.shape[-1]).max(axis=0)
    s = np.where(maxabs > 0, maxabs / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(k / s[None, None, None, :]), -127, 127).astype(np.int8)
    return q, s


# ---- calibration --------------------------------------------------------


def calibrate_activation_scales(
    params: Dict[str, Any], batches: Iterable[jax.Array], truncate: int
) -> Dict[str, Any]:
    """Run the f32 eval forward over ``batches`` (normalised NHWC f32, the
    exact tensors the model consumes) recording per-quant-point maxabs.
    Returns the scale tree (maxabs/127 as Python floats).

    The quant points replicate the int8 apply's dataflow exactly: since BN
    folding is exact, eval-mode intermediate activations equal the folded
    network's activations."""
    from ..ops.conv import conv2d
    from ..ops.norm import batch_norm

    agg: Dict[str, Any] = {}

    def upd(d, key, value):
        d[key] = max(d.get(key, 0.0), float(value))

    @jax.jit
    def collect(x):
        outs = {}
        outs["input"] = jnp.max(jnp.abs(x))
        h = conv2d(params["conv1"], x, stride=2, padding=3)
        h = batch_norm(params["bn1"], h, train=False)
        h = jax.nn.relu(h)
        outs["stem"] = jnp.max(jnp.abs(h))
        h = max_pool2d(h, 3, 2, 1)
        for si, (name, _, _, stride) in enumerate(_STAGES):
            if truncate <= 4 + si:
                break
            souts = []
            for b, block in enumerate(params[name]):
                st = stride if b == 0 else 1
                identity = h
                a = jax.nn.relu(batch_norm(block["bn1"], conv2d(block["conv1"], h), train=False))
                bq = jax.nn.relu(
                    batch_norm(block["bn2"], conv2d(block["conv2"], a, stride=st, padding=1), train=False)
                )
                cc = batch_norm(block["bn3"], conv2d(block["conv3"], bq), train=False)
                if "downsample" in block:
                    identity = batch_norm(
                        block["downsample"]["bn"],
                        conv2d(block["downsample"]["conv"], h, stride=st),
                        train=False,
                    )
                h = jax.nn.relu(cc + identity)
                souts.append(
                    (jnp.max(jnp.abs(a)), jnp.max(jnp.abs(bq)), jnp.max(jnp.abs(h)))
                )
            outs[name] = souts
        return outs

    for x in batches:
        outs = jax.device_get(collect(jnp.asarray(x, jnp.float32)))
        upd(agg, "input", outs["input"])
        upd(agg, "stem", outs["stem"])
        for name, souts in outs.items():
            if name in ("input", "stem"):
                continue
            blocks = agg.setdefault(name, [dict() for _ in souts])
            for bi, (a, bq, o) in enumerate(souts):
                upd(blocks[bi], "h1", a)
                upd(blocks[bi], "h2", bq)
                upd(blocks[bi], "out", o)

    def to_scale(v):
        return max(float(v), 1e-8) / 127.0

    scales: Dict[str, Any] = {
        "input": to_scale(agg["input"]),
        "stem": to_scale(agg["stem"]),
    }
    for name, blocks in agg.items():
        if name in ("input", "stem"):
            continue
        scales[name] = [
            {k: to_scale(v) for k, v in blk.items()} for blk in blocks
        ]
    return scales


# ---- quantisation -------------------------------------------------------


def quantize_resnet50(
    params: Dict[str, Any], act_scales: Dict[str, Any], truncate: int
) -> Dict[str, Any]:
    """Fold BN + quantise weights; attach activation scales. Supports
    truncate in [4, 8] (the camera/eval feature extractor range)."""
    if not 4 <= truncate <= 8:
        raise ValueError("int8 path supports truncate in [4, 8]")

    def qconv(conv, bn):
        k, b = fold_conv_bn(conv, bn)
        qk, sw = _quantize_kernel(k)
        return {"w": jnp.asarray(qk), "sw": jnp.asarray(sw), "b": jnp.asarray(b)}

    q: Dict[str, Any] = {
        "s_input": float(act_scales["input"]),
        "stem": qconv(params["conv1"], params["bn1"]),
        "s_stem": float(act_scales["stem"]),
        "truncate": truncate,
    }
    for si, (name, _, _, _) in enumerate(_STAGES):
        if truncate <= 4 + si:
            break
        qstage = []
        for block, ascale in zip(params[name], act_scales[name]):
            qb = {
                "conv1": qconv(block["conv1"], block["bn1"]),
                "conv2": qconv(block["conv2"], block["bn2"]),
                "conv3": qconv(block["conv3"], block["bn3"]),
                "s_h1": float(ascale["h1"]),
                "s_h2": float(ascale["h2"]),
                "s_out": float(ascale["out"]),
            }
            if "downsample" in block:
                qb["downsample"] = qconv(
                    block["downsample"]["conv"], block["downsample"]["bn"]
                )
            qstage.append(qb)
        q[name] = qstage
    return q


def prepare_int8_resnet(
    params: Dict[str, Any],
    calibration_batches: Iterable[jax.Array],
    truncate: int = 8,
) -> Dict[str, Any]:
    """One-call PTQ: calibrate on normalised f32 batches, then quantise."""
    scales = calibrate_activation_scales(params, calibration_batches, truncate)
    return quantize_resnet50(params, scales, truncate)


# ---- persistence --------------------------------------------------------


def save_quantized(q: Dict[str, Any], path: str) -> None:
    """Persist a quantised tree (atomic npz) so serving cold-starts skip
    calibration."""
    from ..checkpoint.io import save_pytree_npz

    save_pytree_npz(q, path)


def load_quantized(path: str) -> Dict[str, Any]:
    """Inverse of save_quantized: int8/f32 leaves back to device arrays,
    activation scales and the truncate index back to Python scalars (they
    participate in Python control flow / are baked as jit constants)."""
    from ..checkpoint.io import load_pytree_npz

    tree = load_pytree_npz(path, as_jax=False)

    def restore(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k.startswith("s_"):
                    out[k] = float(np.asarray(v))
                elif k == "truncate":
                    out[k] = int(np.asarray(v))
                else:
                    out[k] = restore(v)
            return out
        if isinstance(node, list):
            return [restore(v) for v in node]
        return jnp.asarray(node)

    return restore(tree)


# ---- int8 forward -------------------------------------------------------


def _conv_i8(x_i8, qc, sx: float, stride: int = 1, padding: int = 0):
    """int8 conv -> f32 dequant + folded bias (XLA fuses the epilogue)."""
    y = lax.conv_general_dilated(
        x_i8,
        qc["w"],
        (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (sx * qc["sw"]) + qc["b"]


def _requant(y_f32, s: float):
    return jnp.clip(jnp.round(y_f32 / s), -127, 127).astype(jnp.int8)


def resnet50_apply_int8(
    q: Dict[str, Any],
    x: jax.Array,
    collect_grams: bool = False,
    gram_pool_size: Optional[int] = None,
) -> Any:
    """x: normalised f32 NHWC -> f32 features after child ``truncate``.
    Jit-compatible; every inter-conv tensor stored as int8.

    ``collect_grams``/``gram_pool_size``: mirror resnet50_apply — one
    (pooled) Gram per executed stage, computed on the dequantised stage
    output (the scalar dequant fuses into the Gram matmul). Returns
    (features, grams) when collecting."""
    truncate = q["truncate"]
    grams: List[jax.Array] = []
    xq = _requant(x.astype(jnp.float32), q["s_input"])
    h = _conv_i8(xq, q["stem"], q["s_input"], stride=2, padding=3)
    h = _requant(jax.nn.relu(h), q["s_stem"])
    s = q["s_stem"]
    h = max_pool2d(h, 3, 2, 1)  # monotonic: int8 pool == pool-then-quant

    for si, (name, _, _, stride) in enumerate(_STAGES):
        if truncate <= 4 + si:
            break
        for b, qb in enumerate(q[name]):
            st = stride if b == 0 else 1
            a = _requant(jax.nn.relu(_conv_i8(h, qb["conv1"], s)), qb["s_h1"])
            bq = _requant(
                jax.nn.relu(_conv_i8(a, qb["conv2"], qb["s_h1"], stride=st, padding=1)),
                qb["s_h2"],
            )
            y = _conv_i8(bq, qb["conv3"], qb["s_h2"])
            if "downsample" in qb:
                identity = _conv_i8(h, qb["downsample"], s, stride=st)
            else:
                identity = h.astype(jnp.float32) * s
            h = _requant(jax.nn.relu(y + identity), qb["s_out"])
            s = qb["s_out"]
        if collect_grams:
            from ..ops.gram import gram_matrix_nhwc, pooled_gram_nhwc

            hf = h.astype(jnp.float32) * s
            if gram_pool_size is not None:
                grams.append(pooled_gram_nhwc(hf, gram_pool_size))
            else:
                grams.append(gram_matrix_nhwc(hf))
    feats = h.astype(jnp.float32) * s
    if collect_grams:
        return feats, grams
    return feats
