"""Feed-forward style network (image transformation net).

Beyond parity: the reference's style transfer is iterative-only (Adam on
pixels per image, functions/functions_RESNET50_Truncate_Gram_Attention.py:
218-285 — ~500 optimisation steps per stylised image). This module adds the
classic fast-neural-style alternative (Johnson et al. 2016, Ulyanov et al.
instance norm): a small residual conv net is trained ONCE per style against
the exact same Gram + content losses this repo already computes
(tasks/style_transfer.make_content_style_optimizer semantics), after which
stylisation is ONE forward pass — serving throughput moves from
img-iterations/s to img/s.

TPU-first shape of the net:
- NHWC activations / HWIO kernels like every other model here; all convs are
  MXU matmuls, reflect padding keeps borders clean without the reference's
  per-image host work.
- Downsample by strided conv, upsample by nearest-neighbour repeat + conv
  (no transposed conv → no checkerboard, and XLA lowers the repeat+conv pair
  into one fused pad/conv).
- Affine instance norm per conv (f32 statistics regardless of compute
  dtype), sigmoid output in [0, 1].
- IO convention: the net takes and returns IMAGENET-NORMALISED pixels — the
  same tensors the iterative loop optimises — so `extract_fn`, the save
  path (`denormalize_to_uint8`) and the style service plug in unchanged.
  Internally it denormalises to [0, 1], processes, and renormalises.

``compute_dtype=bfloat16`` runs the conv stack in bf16 (statistics and the
[0,1] boundary affines stay f32), mirroring the encoder's policy.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, conv2d_init
from ..ops.resize import IMAGENET_MEAN, IMAGENET_STD


def _in_init(c: int):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _in_apply(p, x, eps: float = 1e-5):
    """Affine instance norm, f32 statistics (torch InstanceNorm2d(affine=True))."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _reflect_conv(p, x, pad: int, stride: int = 1):
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return conv2d(p, x, stride=stride, padding=0)


def _upsample2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def transformer_net_init(key: jax.Array, width: int = 32, n_res: int = 5) -> dict:
    """Parameter tree for the transformation net.

    width=32, n_res=5 is the classic configuration (~1.7 M params); the
    texture-unit tests shrink both.
    """
    w = int(width)
    keys = jax.random.split(key, 6 + 2 * n_res)
    params = {
        "conv1": conv2d_init(keys[0], 3, w, 9),
        "in1": _in_init(w),
        "conv2": conv2d_init(keys[1], w, 2 * w, 3),
        "in2": _in_init(2 * w),
        "conv3": conv2d_init(keys[2], 2 * w, 4 * w, 3),
        "in3": _in_init(4 * w),
        "res": [],
        "up1": conv2d_init(keys[3], 4 * w, 2 * w, 3),
        "in_up1": _in_init(2 * w),
        "up2": conv2d_init(keys[4], 2 * w, w, 3),
        "in_up2": _in_init(w),
        "out": conv2d_init(keys[5], w, 3, 9),
    }
    for i in range(n_res):
        params["res"].append({
            "conv_a": conv2d_init(keys[6 + 2 * i], 4 * w, 4 * w, 3),
            "in_a": _in_init(4 * w),
            "conv_b": conv2d_init(keys[7 + 2 * i], 4 * w, 4 * w, 3),
            "in_b": _in_init(4 * w),
        })
    return params


def transformer_net_apply(
    params: dict,
    images: jax.Array,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """``images`` (B, H, W, 3) ImageNet-normalised → stylised, same space.

    H and W must be multiples of 4 (two stride-2 stages, two ×2 upsamples).
    """
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = images.astype(jnp.float32) * std + mean  # [0, 1] content
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    x = jax.nn.relu(_in_apply(params["in1"], _reflect_conv(params["conv1"], x, 4)))
    x = jax.nn.relu(_in_apply(params["in2"], _reflect_conv(params["conv2"], x, 1, 2)))
    x = jax.nn.relu(_in_apply(params["in3"], _reflect_conv(params["conv3"], x, 1, 2)))
    for blk in params["res"]:
        y = jax.nn.relu(_in_apply(blk["in_a"], _reflect_conv(blk["conv_a"], x, 1)))
        y = _in_apply(blk["in_b"], _reflect_conv(blk["conv_b"], y, 1))
        x = x + y
    x = _upsample2(x)
    x = jax.nn.relu(_in_apply(params["in_up1"], _reflect_conv(params["up1"], x, 1)))
    x = _upsample2(x)
    x = jax.nn.relu(_in_apply(params["in_up2"], _reflect_conv(params["up2"], x, 1)))
    x = _reflect_conv(params["out"], x, 4)

    y01 = jax.nn.sigmoid(x.astype(jnp.float32))  # [0, 1] stylised
    return (y01 - mean) / std  # back to the normalised space


def count_params(params: dict) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
