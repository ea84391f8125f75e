"""NHWC convolution / pooling primitives.

TPU-native layout: activations NHWC, kernels HWIO — the layouts XLA:TPU tiles
directly onto the MXU without relayout copies (torch's NCHW/OIHW would force
transposes on every call). Semantics match torch's cross-correlation
``F.conv2d`` / ``F.max_pool2d`` / ``F.avg_pool2d`` for golden-parity tests.
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _pet(dtype):
    """preferred_element_type: request f32 output only for f32 operands.
    For bf16 operands the MXU already accumulates in f32 internally, and an
    explicit f32 PET breaks the transpose (autodiff) rule with mixed-dtype
    cotangents."""
    import jax.numpy as _jnp

    return _jnp.float32 if dtype == _jnp.float32 else None



def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d_init(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    kernel_size: Union[int, Tuple[int, int]],
    dtype=jnp.float32,
    bias: bool = True,
):
    """torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) on weight,
    U(-1/sqrt(fan_in), ..) on bias."""
    kh, kw = _pair(kernel_size)
    fan_in = in_channels * kh * kw
    bound_w = (6.0 / ((1 + 5.0) * fan_in)) ** 0.5  # gain for a=sqrt(5)
    k1, k2 = jax.random.split(key)
    params = {
        "kernel": jax.random.uniform(
            k1, (kh, kw, in_channels, out_channels), dtype, -bound_w, bound_w
        )
    }
    if bias:
        bound_b = 1.0 / (fan_in ** 0.5)
        params["bias"] = jax.random.uniform(k2, (out_channels,), dtype, -bound_b, bound_b)
    return params


def conv2d(
    params,
    x: jax.Array,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int]] = 0,
) -> jax.Array:
    """x: (N, H, W, C) -> (N, H', W', O). Cross-correlation like torch."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kernel = params["kernel"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=_pet(x.dtype),
    )
    if "bias" in params:
        y = y + params["bias"]
    return y.astype(x.dtype)


def max_pool2d(
    x: jax.Array,
    kernel_size: Union[int, Tuple[int, int]],
    stride: Union[int, Tuple[int, int]],
    padding: Union[int, Tuple[int, int]] = 0,
) -> jax.Array:
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    # init must be a scalar literal so XLA pattern-matches the max-pool
    # (select-and-scatter) for reverse-mode autodiff; integer operands need
    # a same-dtype numpy scalar (a Python int would arrive as int32)
    import numpy as _np

    neg_inf = (
        -float("inf")
        if jnp.issubdtype(x.dtype, jnp.floating)
        else _np.asarray(jnp.iinfo(x.dtype).min, dtype=x.dtype)[()]
    )
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


def avg_pool2d(
    x: jax.Array,
    kernel_size: Union[int, Tuple[int, int]],
    stride: Union[int, Tuple[int, int]],
    padding: Union[int, Tuple[int, int]] = 0,
    count_include_pad: bool = True,
) -> jax.Array:
    """torch F.avg_pool2d semantics, incl. ``count_include_pad=False``
    (used by the multi-scale downsampler, Models/Models_Multi_PatchGAN.py:98)."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    summed = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )
    if count_include_pad or (ph == 0 and pw == 0):
        y = summed / float(kh * kw)
    else:
        ones = jnp.ones((1, x.shape[1], x.shape[2], 1), dtype=jnp.float32)
        counts = lax.reduce_window(
            ones,
            0.0,
            lax.add,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, sh, sw, 1),
            padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
        )
        y = summed / counts
    return y.astype(x.dtype)
