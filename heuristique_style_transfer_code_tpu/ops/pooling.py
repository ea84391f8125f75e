"""Adaptive pooling as dense matrix contraction.

torch's ``F.adaptive_avg_pool2d`` bins are data-independent for fixed
(in, out) sizes, so the whole op is a pair of constant averaging matrices:
``out = P_h @ x @ P_w^T``. On TPU this turns a gather-ish pooling into two
MXU matmuls and — crucially — lets the Gram+pool composition be rewritten as
``(P G P^T) == (P f)(P f)^T`` (see ops/gram.py).

Bin rule (torch): start = floor(i*In/Out), end = ceil((i+1)*In/Out).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _pool_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    P = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        P[i, start:end] = 1.0 / (end - start)
    return P


def adaptive_pool_matrix(in_size: int, out_size: int) -> jax.Array:
    """(out, in) averaging matrix implementing torch adaptive_avg_pool bins."""
    return jnp.asarray(_pool_matrix_np(in_size, out_size))


def adaptive_avg_pool2d(x: jax.Array, output_size) -> jax.Array:
    """x: (..., H, W) -> (..., oh, ow), torch F.adaptive_avg_pool2d parity."""
    oh, ow = (output_size, output_size) if isinstance(output_size, int) else output_size
    h, w = x.shape[-2], x.shape[-1]
    ph = adaptive_pool_matrix(h, oh).astype(x.dtype)
    pw = adaptive_pool_matrix(w, ow).astype(x.dtype)
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = jnp.einsum("...hw,oh->...ow", x, ph, preferred_element_type=pet)
    y = jnp.einsum("...hw,pw->...hp", y.astype(x.dtype), pw, preferred_element_type=pet)
    return y.astype(x.dtype)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """NHWC (N,H,W,C) -> (N,C): AdaptiveAvgPool2d((1,1)) + Flatten.

    Reduces in f32 for f32/bf16 inputs; f64 stays f64 (pipeline-parallel
    equality tests — an f32 bottleneck there injects reduction-order noise).
    """
    ctype = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    return jnp.mean(x.astype(ctype), axis=(1, 2)).astype(x.dtype)
