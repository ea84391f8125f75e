"""Style-loop --remat: compiled peak-HBM and speed, plain vs remat.

Ahead-of-time probe (same method as train/autotune.py): AOT lower+compile
the texture while_loop at growing canvas sizes and read
``compiled.memory_analysis()`` — nothing executes, so no OOM risk. One
timed scan-slope pair at the 224² b64 operating point quantifies the
recompute cost.

Usage: python tools/bench_style_remat.py   (real TPU; ~10 min warm)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def compiled_mem_gib(optimise, b, hw):
    import jax
    import jax.numpy as jnp

    noise_s = jax.ShapeDtypeStruct((b, hw, hw, 3), jnp.float32)
    gram_s = jax.ShapeDtypeStruct((b, 256, 256), jnp.float32)
    comp = optimise.lower(noise_s, [gram_s]).compile()
    m = comp.memory_analysis()
    if m is None:
        return None
    return float(m.temp_size_in_bytes) / 2**30


def main():
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.core.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from heuristique_style_transfer_code_tpu.models.gram_attention import (
        gram_attention_init,
    )
    from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
        make_gram_fn_gram_attention,
        make_style_transfer_optimizer,
    )

    print(f"devices: {jax.devices()}")
    variables = gram_attention_init(jax.random.PRNGKey(0), 5, 4, 7)

    opts = {}
    for r in (False, True):
        gram_fn = make_gram_fn_gram_attention(
            variables, 5, layers=5, compute_dtype=jnp.bfloat16, remat=r
        )
        opts[r] = make_style_transfer_optimizer(gram_fn, 0.01, 300, 0.0)

    print("compiled temp HBM (GiB), texture loop bf16 truncate5:")
    for b, hw in ((64, 224), (8, 448), (8, 896), (4, 1344)):
        row = {r: compiled_mem_gib(opts[r], b, hw) for r in (False, True)}
        if row[False] is None:
            print(f"  b{b} {hw}²: memory_analysis unavailable on this backend")
            break
        print(
            f"  b{b} {hw}²: plain {row[False]:6.2f} | remat {row[True]:6.2f} "
            f"({row[False] / max(row[True], 1e-9):.2f}x)"
        )

    # speed at the 224² b64 operating point: slope over the iteration cap
    rng = np.random.RandomState(0)
    gram_fn = make_gram_fn_gram_attention(
        variables, 5, layers=5, compute_dtype=jnp.bfloat16
    )
    images = jnp.asarray(rng.rand(64, 224, 224, 3).astype(np.float32))
    targets = [jnp.asarray(np.asarray(g)) for g in jax.jit(gram_fn)(images)]
    noise0 = jax.random.normal(jax.random.PRNGKey(1), images.shape)
    for r in (False, True):
        gf = make_gram_fn_gram_attention(
            variables, 5, layers=5, compute_dtype=jnp.bfloat16, remat=r
        )
        times = {}
        for n in (50, 250):
            opt = make_style_transfer_optimizer(gf, 0.01, n, 0.0)
            for rep in range(3):
                t0 = time.perf_counter()
                _, i, per = opt(noise0, targets)
                np.asarray(per)
                dt = time.perf_counter() - t0
                times.setdefault(n, []).append(dt)
        per_iter = (np.median(times[250][1:]) - np.median(times[50][1:])) / 200
        print(
            f"remat={r}: {per_iter * 1e3:6.2f} ms/iter -> "
            f"{64 / per_iter:6.0f} img-iters/s (b64 224² bf16)"
        )


if __name__ == "__main__":
    main()
