"""Dense layer with torch ``nn.Linear`` weight-layout compatibility.

Kernels are stored JAX-style ``(in, out)``; the .pth converter transposes
torch's ``(out, in)``. Initialisation matches torch's default
(kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(in), 1/sqrt(in)) for weight, and the
same bound for bias), so from-scratch training behaves like the reference
(Models/Models_RESNET50_TRUNCATE.py:37-43).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_init(key: jax.Array, in_features: int, out_features: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / (in_features ** 0.5)
    return {
        "kernel": jax.random.uniform(kw, (in_features, out_features), dtype, -bound, bound),
        "bias": jax.random.uniform(kb, (out_features,), dtype, -bound, bound),
    }


def linear(params, x: jax.Array) -> jax.Array:
    kernel = params["kernel"].astype(x.dtype)
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = jnp.dot(x, kernel, preferred_element_type=pet)
    y = y + params["bias"].astype(y.dtype)
    return y.astype(x.dtype)
