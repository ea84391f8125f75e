"""Mixed-precision policy for TPU execution.

TPU MXUs natively consume bfloat16; parameters are kept in float32 and cast
at the kernel boundary. Accumulation is always float32
(``preferred_element_type``).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        import jax

        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_output(self, x):
        return x.astype(self.output_dtype)


DEFAULT_POLICY = Policy()
# bf16 compute, f32 params/outputs: the standard TPU inference/training policy.
BF16_POLICY = Policy(compute_dtype=jnp.bfloat16)


def resolve_policy(name: str | None) -> Policy:
    if name in (None, "float32", "f32", "fp32"):
        return DEFAULT_POLICY
    if name in ("bfloat16", "bf16"):
        return BF16_POLICY
    raise ValueError(f"Unknown precision policy: {name!r}")
