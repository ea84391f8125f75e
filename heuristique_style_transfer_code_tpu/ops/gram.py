"""Gram-matrix kernels — the namesake op of the reference.

Reference semantics (Models/Models_RESNET50_TRUNCATE_GRAM_with_Attention.py:26-30):
    f = activations.view(B, C, H*W);  G = f @ f^T / (H*W)

TPU-first notes:
- Activations live in NHWC here, so the Gram is a single batched matmul
  contracting the fused spatial axis — a pure MXU op.
- The reference then adaptive-avg-pools G (C x C) down to (S, S)
  (Models_RESNET50_TRUNCATE_GRAM_with_Attention.py:51-52). Pooling is linear:
  pool(G) = P G P^T with the constant bin-averaging matrix P (S x C). Since
  G = f f^T, we have P G P^T = (P f)(P f)^T *exactly*, so ``pooled_gram_nhwc``
  projects channels first and computes an S x S Gram: for layer4
  (C=2048, S=7, HW=49) that is ~300x fewer FLOPs and ~85,000x less Gram
  memory traffic than materialising the 2048^2 Gram and pooling it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .pooling import adaptive_pool_matrix


def gram_matrix_nhwc(x: jax.Array) -> jax.Array:
    """x: (N, H, W, C) -> (N, C, C) = f f^T / (H*W), f = (C, H*W)."""
    n, h, w, c = x.shape
    f = x.reshape(n, h * w, c)
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    g = jnp.einsum("nsc,nsd->ncd", f, f, preferred_element_type=pet).astype(jnp.float32)
    return (g / (h * w)).astype(x.dtype)


def gram_matrix_ncl(f: jax.Array, denom: float | None = None) -> jax.Array:
    """f: (N, C, L) flattened features -> (N, C, C) = f f^T / denom.

    Mirrors the PatchGAN variant which divides by (L + eps)
    (Models/Models_Multi_PatchGAN.py:220).
    """
    if denom is None:
        denom = f.shape[-1]
    pet = jnp.float32 if f.dtype == jnp.float32 else None
    g = jnp.einsum("ncl,ndl->ncd", f, f, preferred_element_type=pet).astype(jnp.float32)
    return (g / denom).astype(f.dtype)


import os

# Gram backend selection: 'xla' (default — XLA fuses these shapes well) or
# 'pallas' (explicit VMEM-resident kernels, ops/pallas/gram_kernel.py).
# Both are numerically equivalent (tested) and benchmark within noise of each
# other on v5e for the model's shapes.
GRAM_BACKEND = os.environ.get("HST_GRAM_BACKEND", "xla")


def pooled_gram_nhwc(x: jax.Array, out_size: int, backend: str | None = None) -> jax.Array:
    """adaptive_avg_pool2d(gram(x), (S, S)) via the exact identity
    P (f f^T) P^T = (P f)(P f)^T.

    x: (N, H, W, C) -> (N, S, S).
    """
    if (backend or GRAM_BACKEND) == "pallas":
        from .pallas.gram_kernel import pooled_gram_pallas

        # interpret on non-TPU backends (CPU tests); compiled Mosaic on TPU
        return pooled_gram_pallas(
            x, out_size, interpret=jax.default_backend() != "tpu"
        )
    n, h, w, c = x.shape
    p = adaptive_pool_matrix(c, out_size).astype(x.dtype)  # (S, C)
    f = x.reshape(n, h * w, c)
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    pf = jnp.einsum("nsc,oc->nso", f, p, preferred_element_type=pet).astype(
        x.dtype
    )  # (N, HW, S)
    g = jnp.einsum("nso,nsp->nop", pf, pf, preferred_element_type=pet).astype(jnp.float32)
    return (g / (h * w)).astype(x.dtype)
