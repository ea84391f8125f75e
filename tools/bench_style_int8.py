"""On-chip A/B of weights-int8 inside the style while_loop (VERDICT r4 #7).

The loop is HBM-roofline-bound (PERF.md loop profile) and re-reads the
encoder weights every iteration; storing the conv kernels int8+scale
(tasks/style_transfer._quantize_conv_kernels) is the one byte-halving
lever not yet measured there. Caveat the measurement answers: the
dequantise is loop-invariant, so XLA may hoist it and materialise a full
compute-dtype weight copy once — in which case per-iteration traffic is
unchanged and the knob buys nothing.

Scan-slope over the iteration cap (threshold 0 → exactly N iterations; two
N values cancel dispatch RTT + compile), same methodology as
tools/bench_content_style.py. Also reports final-loss parity: each variant
optimises against ITS OWN targets (int8 rounding shifts the features, so
cross-targets would conflate approximation with convergence).

Usage: python tools/bench_style_int8.py   (real TPU)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SMOKE = bool(int(os.environ.get("HST_BENCH_SMOKE", "0")))
N_LO, N_HI = (3, 6) if SMOKE else (50, 250)


def measure(optimise, noise0, targets):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, i, per = optimise(noise0, targets)
        np.asarray(per)  # force (block_until_ready unreliable under axon)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), int(i), np.asarray(per)


def run_config(gram_fn, images, batch, label):
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
        make_style_transfer_optimizer,
    )

    targets = jax.jit(
        lambda x: [g.astype(jnp.float32) for g in gram_fn(x)]
    )(images)
    noise0 = jax.random.normal(
        jax.random.PRNGKey(1), images.shape, jnp.float32
    )
    times, final_per = {}, None
    for n in (N_LO, N_HI):
        opt = make_style_transfer_optimizer(gram_fn, 0.01, n, 0.0)
        measure(opt, noise0, targets)  # compile + warm
        t, it, per = measure(opt, noise0, targets)
        assert it == n
        times[n] = t
        final_per = per
    per_iter = (times[N_HI] - times[N_LO]) / (N_HI - N_LO)
    print(
        f"{label:24s}: {per_iter * 1e3:6.2f} ms/iter -> "
        f"{batch / per_iter:7.0f} img-iters/s   "
        f"loss@{N_HI} mean {float(final_per.mean()):.6f}"
    )
    return per_iter, float(final_per.mean())


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
    )

    print(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    results = {}
    env_cfg = os.environ.get("HST_BENCH_CONFIGS")  # "t,b;t,b" override
    if env_cfg:
        configs = tuple(
            tuple(int(x) for x in pair.split(","))
            for pair in env_cfg.split(";") if pair.strip()
        )
    elif SMOKE:
        configs = ((5, 2),)
    else:
        configs = ((5, 64), (8, 64), (5, 128))
    size = 64 if SMOKE else 224
    for truncate, batch in configs:
        images = jnp.asarray(
            rng.rand(batch, size, size, 3).astype(np.float32) * 2 - 1
        )
        variables = gram_attention_init(jax.random.PRNGKey(0), truncate, 7, 4)
        for wq in (False, True):
            gram_fn = make_gram_fn_gram_attention(
                variables, truncate, layers=truncate,
                compute_dtype=jnp.bfloat16, weights_int8=wq,
            )
            label = f"t{truncate} b{batch} {'int8w' if wq else 'bf16 '}"
            results[(truncate, batch, wq)] = run_config(
                gram_fn, images, batch, label
            )
        base = results[(truncate, batch, False)][0]
        quant = results[(truncate, batch, True)][0]
        print(f"  -> int8w speedup at t{truncate} b{batch}: {base / quant:.3f}x")


if __name__ == "__main__":
    main()
