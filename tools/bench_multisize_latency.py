"""On-chip lone-job latency: multi-size dispatch vs a fixed big batch.

The claim to verify (README/PERF.md): per-iteration wall time scales with
the COMPILED batch size, so a service compiled at (8, 64) answers a lone
job ~5x sooner than one padded to a fixed 64 — while a full 64-burst still
rides the big program. Texture mode, family-2 truncate-5 bf16, 300
iterations, threshold 0 (deterministic cost).

Usage: python tools/bench_multisize_latency.py   (real TPU; ~5 min warm)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 300


def lone_job_latency(svc, img, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        svc.submit(img).result(timeout=1200)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax

    from heuristique_style_transfer_code_tpu.core.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from heuristique_style_transfer_code_tpu.models.gram_attention import (
        gram_attention_init,
    )
    from heuristique_style_transfer_code_tpu.tasks.style_service import (
        StyleTransferService,
    )
    from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
        make_gram_fn_gram_attention,
    )

    print(f"devices: {jax.devices()}")
    variables = gram_attention_init(jax.random.PRNGKey(0), 5, 4, 7)
    gram_fn = make_gram_fn_gram_attention(
        variables, 5, layers=5, compute_dtype=jax.numpy.bfloat16
    )
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (224, 224, 3), np.uint8)

    results = {}
    for label, sizes in (("fixed b64", 64), ("multi (8,64)", (8, 64))):
        svc = StyleTransferService(
            gram_fn, crop=224, batch_size=sizes, max_delay_ms=50.0,
            num_iterations=ITERS, threshold=0.0, learning_rate=0.01, seed=0,
        ).start()
        # warm every compiled size with real dispatches
        for warm_n in (svc.batch_sizes if len(svc.batch_sizes) > 1 else [1]):
            futs = [svc.submit(img) for _ in range(warm_n)]
            for f in futs:
                f.result(timeout=1200)
        results[label] = lone_job_latency(svc, img)
        hist = svc.stats()["batch_size_hist"]
        svc.stop()
        print(f"{label:13s}: lone-job p50 {results[label]:.2f}s "
              f"(size hist {hist})")
    print(
        f"multi-size speedup on a lone job: "
        f"{results['fixed b64'] / results['multi (8,64)']:.2f}x"
    )


if __name__ == "__main__":
    main()
