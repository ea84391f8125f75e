"""On-chip throughput of the style-transfer job service.

Drives tasks/style_service.StyleTransferService end-to-end (threaded
clients -> batcher -> one while_loop dispatch -> PNG-ready uint8 fetch)
with the family-2 truncate-5 bf16 gram program at a fixed iteration budget
(threshold 0: no early stop, so every job costs exactly N iterations and
jobs/s is comparable across batch sizes).

Usage: python tools/bench_style_service.py   (real TPU; ~5 min warm)
"""
from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 300


def run_batch_size(gram_fn, batch_size, n_jobs):
    from heuristique_style_transfer_code_tpu.tasks.style_service import (
        StyleTransferService,
    )

    svc = StyleTransferService(
        gram_fn,
        crop=224,
        batch_size=batch_size,
        max_delay_ms=300.0,
        num_iterations=ITERS,
        threshold=0.0,  # fixed budget: every job costs exactly ITERS
        learning_rate=0.01,
        seed=0,
    ).start()
    rng = np.random.RandomState(0)
    imgs = [
        rng.randint(0, 256, (224, 224, 3), np.uint8) for _ in range(n_jobs)
    ]
    # warm dispatch (pays the compile) with one full batch
    warm = [svc.submit(im) for im in imgs[:batch_size]]
    for f in warm:
        f.result(timeout=1200)

    t0 = time.perf_counter()
    futs = [None] * n_jobs

    def client(lo, hi):
        for i in range(lo, hi):
            futs[i] = svc.submit(imgs[i])

    k = 4
    step = n_jobs // k
    threads = [
        threading.Thread(target=client, args=(j * step, (j + 1) * step))
        for j in range(k)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for f in futs:
        f.result(timeout=1200)
    dt = time.perf_counter() - t0
    st = svc.stats()
    svc.stop()
    return n_jobs / dt, st


def main():
    import jax

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
    variables = gram_attention_init(jax.random.PRNGKey(0), 5, 4, 7)
    gram_fn = make_gram_fn_gram_attention(
        variables, 5, layers=5, compute_dtype=jax.numpy.bfloat16
    )
    for b, n in ((8, 32), (64, 128)):
        jps, st = run_batch_size(gram_fn, b, n)
        print(
            f"b={b:3d}: {jps:6.2f} jobs/s at {ITERS} iters "
            f"(= {jps * ITERS:7.0f} img-iters/s end-to-end through the "
            f"service; occupancy {st['mean_batch_occupancy']:.2f}, "
            f"p50 {st['latency_p50_ms'] / 1e3:.1f}s)"
        )


if __name__ == "__main__":
    main()
