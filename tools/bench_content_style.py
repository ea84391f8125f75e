"""On-chip throughput of the content+style loop (vs the texture loop).

Scan-slope over the iteration cap (threshold 0, so the while_loop runs
exactly N iterations; two N values cancel the dispatch RTT + compile):
per-iteration time of make_content_style_optimizer at b64 bf16, in three
configs:

  truncate5/last  — same encoder depth as the texture-loop profile
                    (PERF.md: 5,336 img-iters/s at b64 bf16), so the delta
                    IS the content term's cost
  truncate8/last  — the full truncated encoder
  truncate8/all   — multi-scale style Grams at all 4 stages (--style_layers
                    all): the cost of the extra Gram contractions

Usage: python tools/bench_content_style.py   (real TPU; ~10 min warm)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 64
N_LO, N_HI = 50, 250


def measure(optimise, pixels0, targets, content_feats):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        p, i, per = optimise(pixels0, targets, content_feats)
        np.asarray(per)  # force (block_until_ready unreliable under axon)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), int(i)


def run_config(extract_fn, images, label):
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
        make_content_style_optimizer,
    )

    # device-resident inputs: the truncate8/all targets are ~1.4 GB — one
    # H2D through the relay, not one per timed call
    extract = jax.jit(
        lambda x: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), extract_fn(x)
        )
    )
    content_feats, targets = extract(images)
    pixels0 = jax.random.normal(
        jax.random.PRNGKey(1), images.shape, jnp.float32
    )
    times = {}
    for n in (N_LO, N_HI):
        opt = make_content_style_optimizer(
            extract_fn, 1.0, 1.0, 0.01, n, 0.0,
        )
        measure(opt, pixels0, targets, content_feats)  # compile + warm
        t, it = measure(opt, pixels0, targets, content_feats)
        assert it == n
        times[n] = t
    per_iter = (times[N_HI] - times[N_LO]) / (N_HI - N_LO)
    print(
        f"{label:16s}: {per_iter * 1e3:6.2f} ms/iter -> "
        f"{BATCH / per_iter:7.0f} img-iters/s (b{BATCH} bf16)"
    )
    return per_iter


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
        make_extract_fn_gram_attention,
    )

    print(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(BATCH, 224, 224, 3).astype(np.float32) * 2 - 1
    )
    for truncate, style_layers, label in (
        (5, "last", "truncate5/last"),
        (8, "last", "truncate8/last"),
        (8, "all", "truncate8/all"),
    ):
        variables = gram_attention_init(jax.random.PRNGKey(0), truncate, 7, 4)
        extract_fn = make_extract_fn_gram_attention(
            variables, truncate, layers=truncate,
            compute_dtype=jnp.bfloat16, style_layers=style_layers,
        )
        run_config(extract_fn, images, label)


if __name__ == "__main__":
    main()
