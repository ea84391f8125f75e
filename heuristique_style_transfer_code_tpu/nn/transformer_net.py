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

Conditional (multi-style) variant: ``transformer_net_init(n_styles=S)``
makes every instance-norm affine a per-style TABLE of shape (S, C) —
conditional instance normalisation (Dumoulin et al. 2017, "A Learned
Representation for Artistic Style"). All convs are SHARED across styles;
a per-image weight row ``style_weights (B, S)`` selects the affine as
``w @ table`` — a one-hot row indexes one style's affine exactly, and any
convex row interpolates styles continuously. This matches the service's
per-request ``style_w`` contract (tasks/style_service.py), so one trained
net serves the whole gallery with X-Style selection AND blending.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, conv2d_init
from ..ops.resize import IMAGENET_MEAN, IMAGENET_STD

# Instance-norm backend: 'xla' (default — the composition XLA fuses; the
# only differentiable path) or 'pallas' (ops/pallas/instance_norm_kernel:
# whole-image VMEM residency fuses stats+apply+relu into 1 HBM read +
# 1 write — a FORWARD/serving knob; the net forward is IN-bound, PERF.md
# r4). Select per call (make_stylize_fn/make_net_job_fn in_backend=) or
# globally via HST_NET_IN_BACKEND.
IN_BACKEND = os.environ.get("HST_NET_IN_BACKEND", "xla")


def _in_init(c: int, n_styles: Optional[int] = None):
    shape = (c,) if n_styles is None else (int(n_styles), c)
    return {"scale": jnp.ones(shape, jnp.float32),
            "bias": jnp.zeros(shape, jnp.float32)}


def _in_apply(p, x, style_w=None, eps: float = 1e-5, relu: bool = False,
              backend: Optional[str] = None):
    """Affine instance norm, f32 statistics (torch InstanceNorm2d(affine=True)).

    A (S, C) ``scale``/``bias`` table is conditional instance norm: the
    affine is ``style_w @ table`` per image (one-hot = exact indexing,
    convex rows = style interpolation). ``relu=True`` fuses the activation
    (identical math to relu-after-norm on both backends)."""
    scale, bias = p["scale"], p["bias"]
    if scale.ndim == 2:
        if style_w is None:
            raise ValueError(
                "conditional net: pass style_weights (B, S) to select/blend "
                "per-style instance-norm affines"
            )
        w = style_w.astype(jnp.float32)
        scale = w @ scale  # (B, C)
        bias = w @ bias
    if (backend or IN_BACKEND) == "pallas":
        from ..ops.pallas.instance_norm_kernel import instance_norm_pallas

        b, c = x.shape[0], x.shape[-1]
        return instance_norm_pallas(
            x,
            jnp.broadcast_to(scale.astype(jnp.float32), (b, c)),
            jnp.broadcast_to(bias.astype(jnp.float32), (b, c)),
            eps=eps, relu=relu,
        )
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale.ndim == 2:
        scale = scale[:, None, None, :]
        bias = bias[:, None, None, :]
    y = y * scale + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _reflect_conv(p, x, pad: int, stride: int = 1):
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return conv2d(p, x, stride=stride, padding=0)


def _upsample2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def transformer_net_init(
    key: jax.Array,
    width: int = 32,
    n_res: int = 5,
    n_styles: Optional[int] = None,
) -> dict:
    """Parameter tree for the transformation net.

    width=32, n_res=5 is the classic configuration (~1.7 M params); the
    texture-unit tests shrink both. ``n_styles=S`` makes the instance-norm
    affines per-style (S, C) tables (conditional instance norm) — the convs
    stay shared, so S styles cost S× only the tiny affine vectors.
    """
    w = int(width)
    keys = jax.random.split(key, 6 + 2 * n_res)
    params = {
        "conv1": conv2d_init(keys[0], 3, w, 9),
        "in1": _in_init(w, n_styles),
        "conv2": conv2d_init(keys[1], w, 2 * w, 3),
        "in2": _in_init(2 * w, n_styles),
        "conv3": conv2d_init(keys[2], 2 * w, 4 * w, 3),
        "in3": _in_init(4 * w, n_styles),
        "res": [],
        "up1": conv2d_init(keys[3], 4 * w, 2 * w, 3),
        "in_up1": _in_init(2 * w, n_styles),
        "up2": conv2d_init(keys[4], 2 * w, w, 3),
        "in_up2": _in_init(w, n_styles),
        "out": conv2d_init(keys[5], w, 3, 9),
    }
    for i in range(n_res):
        params["res"].append({
            "conv_a": conv2d_init(keys[6 + 2 * i], 4 * w, 4 * w, 3),
            "in_a": _in_init(4 * w, n_styles),
            "conv_b": conv2d_init(keys[7 + 2 * i], 4 * w, 4 * w, 3),
            "in_b": _in_init(4 * w, n_styles),
        })
    return params


def net_n_styles(params: dict) -> Optional[int]:
    """S for a conditional net, None for a single-style one."""
    scale = params["in1"]["scale"]
    return int(scale.shape[0]) if getattr(scale, "ndim", 1) == 2 else None


def select_style(params: dict, index: int) -> dict:
    """Materialise style ``index`` of a conditional net as a plain
    single-style tree (every (S, C) affine sliced to (C,)) — exact, since a
    one-hot ``style_weights`` row IS this slice."""
    def slice_leaf(path, leaf):
        names = {getattr(p, "key", getattr(p, "name", None)) for p in path}
        if getattr(leaf, "ndim", 0) == 2 and {"scale", "bias"} & names:
            return leaf[int(index)]
        return leaf

    return jax.tree_util.tree_map_with_path(slice_leaf, params)


def transformer_net_apply(
    params: dict,
    images: jax.Array,
    compute_dtype: Optional[jnp.dtype] = None,
    style_weights: Optional[jax.Array] = None,
    in_backend: Optional[str] = None,
) -> jax.Array:
    """``images`` (B, H, W, 3) ImageNet-normalised → stylised, same space.

    H and W must be multiples of 4 (two stride-2 stages, two ×2 upsamples).
    For a conditional net ``style_weights`` is the per-image (B, S) mix row
    — required there, rejected on a single-style net; an (S,) row broadcasts
    over the batch. ``in_backend='pallas'`` runs the fused VMEM-resident
    instance-norm kernel (forward-only serving acceleration; default: the
    XLA composition, the differentiable path).
    """
    cond = net_n_styles(params)
    if cond is None:
        if style_weights is not None:
            raise ValueError("style_weights given but the net is single-style")
        sw = None
    else:
        if style_weights is None:
            raise ValueError(
                f"conditional net ({cond} styles): style_weights is required"
            )
        sw = jnp.asarray(style_weights, jnp.float32)
        if sw.ndim == 1:
            sw = sw[None]
        if sw.shape[-1] != cond:
            raise ValueError(
                f"style_weights last dim {sw.shape[-1]} != n_styles {cond}"
            )
        sw = jnp.broadcast_to(sw, (images.shape[0], cond))

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = images.astype(jnp.float32) * std + mean  # [0, 1] content
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    ib = in_backend

    def in_relu(p, v):
        return _in_apply(p, v, sw, relu=True, backend=ib)

    x = in_relu(params["in1"], _reflect_conv(params["conv1"], x, 4))
    x = in_relu(params["in2"], _reflect_conv(params["conv2"], x, 1, 2))
    x = in_relu(params["in3"], _reflect_conv(params["conv3"], x, 1, 2))
    for blk in params["res"]:
        y = in_relu(blk["in_a"], _reflect_conv(blk["conv_a"], x, 1))
        y = _in_apply(blk["in_b"], _reflect_conv(blk["conv_b"], y, 1), sw,
                      backend=ib)
        x = x + y
    x = _upsample2(x)
    x = in_relu(params["in_up1"], _reflect_conv(params["up1"], x, 1))
    x = _upsample2(x)
    x = in_relu(params["in_up2"], _reflect_conv(params["up2"], x, 1))
    x = _reflect_conv(params["out"], x, 4)

    y01 = jax.nn.sigmoid(x.astype(jnp.float32))  # [0, 1] stylised
    return (y01 - mean) / std  # back to the normalised space


def count_params(params: dict) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
