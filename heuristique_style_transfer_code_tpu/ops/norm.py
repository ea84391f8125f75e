"""Normalisation ops with torch-parity semantics (NHWC layout).

- ``batch_norm``: nn.BatchNorm2d — eval uses running stats, train uses biased
  batch stats and updates running stats with the *unbiased* variance
  (momentum 0.1), exactly like torch.
- ``instance_norm``: nn.InstanceNorm2d(affine=False, track_running_stats=False)
  — the PatchGAN default (Models/Models_Multi_PatchGAN.py:28-31).
- ``layer_norm_tail``: F.layer_norm(x, x.shape[1:]) — normalise over every
  non-batch dim, no affine (Models/Models_Multi_PatchGAN.py:198,213).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-5
MOMENTUM = 0.1


def batch_norm_init(num_features: int, dtype=jnp.float32):
    return {
        "scale": jnp.ones((num_features,), dtype),
        "bias": jnp.zeros((num_features,), dtype),
        "mean": jnp.zeros((num_features,), dtype),
        "var": jnp.ones((num_features,), dtype),
    }


def batch_norm(params, x: jax.Array, train: bool = False, eps: float = EPS):
    """x: (N, H, W, C). Returns (y, new_params) in train mode, else y.

    In train mode the normalisation uses the biased batch variance while the
    returned running var uses the unbiased estimate (torch semantics).

    Stats compute in f32 for f32/bf16 inputs; f64 inputs stay f64 (used by
    the pipeline-parallel equality tests, where f32 reduction-order rounding
    would be chaotically amplified through the BN chain — never hit on TPU).
    """
    ctype = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    scale = params["scale"].astype(ctype)
    bias = params["bias"].astype(ctype)
    if not train:
        mean = params["mean"].astype(ctype)
        var = params["var"].astype(ctype)
        inv = scale * jax.lax.rsqrt(var + eps)
        y = x.astype(ctype) * inv + (bias - mean * inv)
        return y.astype(x.dtype)

    xf = x.astype(ctype)
    axes = (0, 1, 2)
    mean = jnp.mean(xf, axis=axes)
    # Two-pass variance, NOT E[x^2]-E[x]^2: the cancelling form loses
    # ~half the mantissa when |mean| >> std and its error is reduction-order
    # dependent, so resharding the same step changes running-var leaves.
    var = jnp.mean(jnp.square(xf - mean), axis=axes)  # biased
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased = var * (n / max(n - 1, 1))
    inv = scale * jax.lax.rsqrt(var + eps)
    y = xf * inv + (bias - mean * inv)
    new_params = dict(params)
    new_params["mean"] = ((1 - MOMENTUM) * params["mean"] + MOMENTUM * mean).astype(
        params["mean"].dtype
    )
    new_params["var"] = ((1 - MOMENTUM) * params["var"] + MOMENTUM * unbiased).astype(
        params["var"].dtype
    )
    return y.astype(x.dtype), new_params


def instance_norm(x: jax.Array, eps: float = EPS) -> jax.Array:
    """Per-sample, per-channel normalisation over H, W. No affine."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def layer_norm_tail(x: jax.Array, eps: float = EPS) -> jax.Array:
    """F.layer_norm(x, x.shape[1:]) — normalise over all non-batch dims."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
