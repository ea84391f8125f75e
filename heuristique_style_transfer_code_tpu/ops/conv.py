"""NHWC convolution / pooling primitives.

TPU-native layout: activations NHWC, kernels HWIO — the layouts XLA:TPU tiles
directly onto the MXU without relayout copies (torch's NCHW/OIHW would force
transposes on every call). Semantics match torch's cross-correlation
``F.conv2d`` / ``F.max_pool2d`` / ``F.avg_pool2d`` for golden-parity tests.
"""
from __future__ import annotations

import functools
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


def _pool_geometry(x_shape, kh, kw, sh, sw, ph, pw):
    """(OH, OW) plus the padded input extent for the strided-slice family."""
    _, ih, iw, _ = x_shape
    oh = (ih + 2 * ph - kh) // sh + 1
    ow = (iw + 2 * pw - kw) // sw + 1
    return oh, ow, ih + 2 * ph, iw + 2 * pw


def _maxpool_window_index(x, y, kh, kw, sh, sw, ph, pw):
    """First-max window index (row-major over the kh*kw taps) per output
    element — the tie-break select-and-scatter and torch both use."""
    oh, ow, _, _ = _pool_geometry(x.shape, kh, kw, sh, sw, ph, pw)
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), constant_values=neg_inf)
    n_taps = kh * kw
    idx = jnp.full(y.shape, n_taps, jnp.int32)
    for k in range(n_taps):
        dh, dw = divmod(k, kw)
        tap = lax.slice(
            xp,
            (0, dh, dw, 0),
            (x.shape[0], dh + (oh - 1) * sh + 1, dw + (ow - 1) * sw + 1, x.shape[3]),
            (1, sh, sw, 1),
        )
        idx = jnp.minimum(idx, jnp.where(tap == y, k, n_taps))
    return idx


@functools.lru_cache(maxsize=None)
def _argmax_pool_for(x_shape, dtype_name, kh, kw, sh, sw, ph, pw):
    """Shape/config-specialised custom-VJP pool; residual = index map only."""
    x_dtype = jnp.dtype(dtype_name)
    oh, ow, hp, wp = _pool_geometry(x_shape, kh, kw, sh, sw, ph, pw)

    @jax.custom_vjp
    def pool(x):
        return max_pool2d(x, (kh, kw), (sh, sw), (ph, pw))

    def fwd(x):
        y = max_pool2d(x, (kh, kw), (sh, sw), (ph, pw))
        return y, _maxpool_window_index(x, y, kh, kw, sh, sw, ph, pw)

    def bwd(idx, g):
        g = g.astype(x_dtype)
        zero = jnp.asarray(0, x_dtype)
        acc = None
        for k in range(kh * kw):
            dh, dw = divmod(k, kw)
            tap_g = jnp.where(idx == k, g, zero)
            # scatter tap k back to padded-input coords: lo offset (dh, dw),
            # interior = stride-1, hi = whatever remains of the padded extent
            hi_h = hp - (dh + (oh - 1) * sh + 1)
            hi_w = wp - (dw + (ow - 1) * sw + 1)
            contrib = lax.pad(
                tap_g,
                zero,
                ((0, 0, 0), (dh, hi_h, sh - 1), (dw, hi_w, sw - 1), (0, 0, 0)),
            )
            acc = contrib if acc is None else acc + contrib
        grad_x = lax.slice(
            acc,
            (0, ph, pw, 0),
            (x_shape[0], ph + x_shape[1], pw + x_shape[2], x_shape[3]),
        )
        return (grad_x,)

    pool.defvjp(fwd, bwd)
    return pool


def max_pool2d_argmax(
    x: jax.Array,
    kernel_size: Union[int, Tuple[int, int]],
    stride: Union[int, Tuple[int, int]],
    padding: Union[int, Tuple[int, int]] = 0,
) -> jax.Array:
    """``max_pool2d`` with a hand-written backward.

    XLA derives the reduce_window-max gradient as select-and-scatter, which
    profiled ~4-5x off the HBM roofline on the stem pool (PERF.md). This
    variant records the first-max window index in the forward and rebuilds
    the gradient as kh*kw strided ``lax.pad``+add passes — one fused
    elementwise kernel. Tie-break (first max, row-major window order) is
    select-and-scatter's and torch's; equality is asserted in
    tests/test_ops_golden.py incl. tie-heavy ReLU inputs.

    Measured on-chip (tools/bench_maxpool_vjp.py) and REJECTED as the model
    default: 0.82x on the b128 train step and 0.39x on the b64 style loop —
    the kh*kw full-resolution slice/compare passes that build the index map
    in the forward cost more HBM traffic than the select-and-scatter they
    remove from the backward (PERF.md optimisations table). Kept as a
    validated alternative backward.
    """
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    return _argmax_pool_for(x.shape, x.dtype.name, kh, kw, sh, sw, ph, pw)(x)


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
