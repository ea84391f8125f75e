"""Pallas TPU kernels for the Gram-matrix hot path.

Two kernels, one grid program per batch element, everything resident in VMEM:

- ``gram_pallas``: G = f f^T / HW for f = (HW, C) — the style-transfer loss
  Gram (one MXU matmul per image, fp32 accumulation).
- ``pooled_gram_pallas``: the gram-attention feature, fused
  project-then-gram (P f)(P f)^T / HW == adaptive_pool(f f^T). The channel
  projection and the (S, S) Gram run back-to-back in VMEM, so the (HW, S)
  intermediate never touches HBM — on top of the ~300x FLOP reduction of the
  algebraic rewrite (ops/gram.py).

The XLA einsum path (ops/gram.py) remains the default — measured on a real
v5e at the model's shapes (tools/bench_gram_backends.py, scan-slope): XLA
is faster at 6 of 7 operating points (1.0x at the b8 style-loop Gram, up to
15x at the tiny deep-layer pooled Grams), because these kernels run one
grid program per batch element while XLA batches the contraction across N.
Numbers recorded in PERF.md. Select this backend with
HST_GRAM_BACKEND=pallas (or the ``backend`` argument of
ops.gram.pooled_gram_nhwc). Both are validated against the einsum path in
tests (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/GPU-only at runtime but imports everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

from ..pooling import adaptive_pool_matrix


def _gram_kernel(f_ref, o_ref, *, hw: int):
    f = f_ref[0]  # (HW, C)
    g = jax.lax.dot_general(
        f, f,
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract HW: f^T f -> wait
        preferred_element_type=jnp.float32,
    )
    # note: contracting dim 0 of both operands gives (C, C) = f^T f; the
    # reference Gram is over channels with spatial contracted, i.e. exactly
    # this when f is (HW, C)
    o_ref[0] = (g / hw).astype(o_ref.dtype)


def gram_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """x: (N, H, W, C) -> (N, C, C), identical to ops.gram.gram_matrix_nhwc."""
    n, h, w, c = x.shape
    hw = h * w
    f = x.reshape(n, hw, c)
    kernel = functools.partial(_gram_kernel, hw=hw)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * c * hw, bytes_accessed=n * (hw * c + c * c) * 4,
            transcendentals=0,
        ),
    )(f)


def _pooled_gram_kernel(f_ref, p_ref, o_ref, *, hw: int):
    f = f_ref[0]  # (HW, C)
    p = p_ref[...]  # (S, C)
    pf = jax.lax.dot_general(
        f, p,
        dimension_numbers=(((1,), (1,)), ((), ())),  # (HW, S)
        preferred_element_type=jnp.float32,
    )
    g = jax.lax.dot_general(
        pf, pf,
        dimension_numbers=(((0,), (0,)), ((), ())),  # (S, S)
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (g / hw).astype(o_ref.dtype)


def pooled_gram_pallas(x: jax.Array, out_size: int, interpret: bool = False) -> jax.Array:
    """x: (N, H, W, C) -> (N, S, S), identical to ops.gram.pooled_gram_nhwc."""
    n, h, w, c = x.shape
    hw = h * w
    s = out_size
    f = x.reshape(n, hw, c)
    p = adaptive_pool_matrix(c, s).astype(jnp.float32)
    kernel = functools.partial(_pooled_gram_kernel, hw=hw)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, s), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hw * c * s + 2 * n * hw * s * s,
            bytes_accessed=n * (hw * c + s * s) * 4 + s * c * 4,
            transcendentals=0,
        ),
    )(f, p)
