"""Multi-head self-attention, numerically compatible with torch's
``nn.MultiheadAttention`` (batch_first=False, packed in-projections).

The reference uses it twice:
- embed=S^2, heads=1 over the per-block Gram sequence
  (Models/Models_RESNET50_TRUNCATE_GRAM_with_Attention.py:24,58)
- embed=ndf, heads=8, two stacked instances
  (Models/Models_Multi_PatchGAN.py:168-169,244-246)

Sequence lengths here are tiny (<= ~7), so the whole attention is a handful
of small matmuls; the batch dimension carries the parallelism. Weights are
kept in torch's packed layout ((3E, E) in-proj) so .pth checkpoints map 1:1;
XLA hoists the constant slicing/transposition out of the hot path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def multihead_attention_init(key: jax.Array, embed_dim: int, num_heads: int, dtype=jnp.float32):
    """num_heads is validated here but passed statically to the apply fn so the
    param tree stays purely numeric (grad-able)."""
    assert embed_dim % num_heads == 0
    k1, k2 = jax.random.split(key)
    # torch init: xavier_uniform on in_proj_weight, zeros on in_proj_bias,
    # out_proj = NonDynamicallyQuantizableLinear default init, bias zeroed.
    # xavier on the PACKED (3E, E) tensor: fan_in=E, fan_out=3E, so the
    # bound is sqrt(6/(E+3E)) — verified against torch (0.15308 at E=64)
    bound_in = (6.0 / (embed_dim + 3 * embed_dim)) ** 0.5
    bound_out = 1.0 / (embed_dim ** 0.5)
    return {
        "in_proj_weight": jax.random.uniform(
            k1, (3 * embed_dim, embed_dim), dtype, -bound_in, bound_in
        ),
        "in_proj_bias": jnp.zeros((3 * embed_dim,), dtype),
        "out_proj_weight": jax.random.uniform(
            k2, (embed_dim, embed_dim), dtype, -bound_out, bound_out
        ),
        "out_proj_bias": jnp.zeros((embed_dim,), dtype),
    }


def multihead_attention(params, x: jax.Array, num_heads: int = 1) -> jax.Array:
    """Self-attention. x: (L, N, E) -> (L, N, E), torch MHA semantics."""
    L, N, E = x.shape
    H = num_heads
    D = E // H
    w = params["in_proj_weight"].astype(x.dtype)  # (3E, E)
    b = params["in_proj_bias"].astype(x.dtype)

    pet = jnp.float32 if x.dtype == jnp.float32 else None
    qkv = jnp.einsum("lne,fe->lnf", x, w, preferred_element_type=pet).astype(
        x.dtype
    ) + b
    q, k, v = jnp.split(qkv, 3, axis=-1)

    # (L, N, E) -> (N, H, L, D)
    def heads(t):
        return t.reshape(L, N, H, D).transpose(1, 2, 0, 3)

    q, k, v = heads(q), heads(k), heads(v)
    q = q * (D ** -0.5)
    logits = jnp.einsum("nhld,nhmd->nhlm", q, k, preferred_element_type=pet).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("nhlm,nhmd->nhld", probs, v, preferred_element_type=pet).astype(
        x.dtype
    )
    ctx = ctx.transpose(2, 0, 1, 3).reshape(L, N, E)

    wo = params["out_proj_weight"].astype(x.dtype)
    bo = params["out_proj_bias"].astype(x.dtype)
    out = jnp.einsum("lne,fe->lnf", ctx, wo, preferred_element_type=pet).astype(
        x.dtype
    ) + bo
    return out
