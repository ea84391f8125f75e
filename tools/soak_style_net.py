"""Open-loop soak of the feed-forward style service (the newest serving
surface): submitters blast frames at `StyleTransferService(job_fn={size:
net forward})` as fast as its bounded queue accepts — backpressure is the
only throttle — over the multi-size dispatch ladder.

Measures: requests, errors, batch-size histogram, occupancy, throughput,
latency p50/p95, host RSS growth (the documented axon device_put leak —
recycle workers behind the relay, CLAUDE.md).

Usage: SOAK_SECONDS=300 python tools/soak_style_net.py   (real TPU)
"""
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main():
    from heuristique_style_transfer_code_tpu.nn.transformer_net import (
        transformer_net_init,
    )
    from heuristique_style_transfer_code_tpu.tasks.fast_style import (
        make_net_job_fn,
    )
    from heuristique_style_transfer_code_tpu.tasks.style_service import (
        StyleTransferService,
    )

    duration = float(os.environ.get("SOAK_SECONDS", "300"))
    transport = os.environ.get("SOAK_TRANSPORT", "rgb")
    crop = 224
    sizes = (8, 64)
    log(f"devices: {jax.devices()}  duration {duration}s  sizes {sizes} "
        f"transport {transport}")

    import jax.numpy as jnp

    params = transformer_net_init(jax.random.PRNGKey(0), width=32, n_res=5)
    job = make_net_job_fn(params, crop=crop, compute_dtype=jnp.bfloat16)
    svc = StyleTransferService(
        job_fn={s: job for s in sizes}, style_names=["soak"],
        crop=crop, max_delay_ms=10.0, num_iterations=1, max_in_flight=2,
        transport=transport,
    )
    svc.warmup()
    svc.start()

    rng = np.random.RandomState(0)
    frames = [
        rng.randint(0, 256, (crop, crop, 3), dtype=np.uint8)
        for _ in range(64)
    ]
    stop = threading.Event()
    errors = []
    done = [0] * 6
    rss0 = rss_mb()

    def submitter(i):
        local = np.random.RandomState(i)
        pending = []
        while not stop.is_set():
            try:
                pending.append(svc.submit(frames[local.randint(64)]))
            except Exception as e:
                # submit() BLOCKS when the queue is full (that blocking is
                # the soak's backpressure); exceptions here are shutdown
                # races and real failures — counted as errors
                errors.append(repr(e))
                time.sleep(0.01)
                continue
            if len(pending) >= 16:
                for f in pending:
                    try:
                        r = f.result(timeout=120)
                        assert r.image.shape == (crop, crop, 3)
                        done[i] += 1
                    except Exception as e:
                        errors.append(repr(e))
                pending = []
        for f in pending:
            try:
                f.result(timeout=120)
                done[i] += 1
            except Exception as e:
                errors.append(repr(e))

    threads = [
        threading.Thread(target=submitter, args=(i,)) for i in range(len(done))
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    while time.perf_counter() - t0 < duration:
        time.sleep(30)
        st = svc.stats()
        log(
            f"t={time.perf_counter() - t0:5.0f}s jobs={st['jobs']} "
            f"occ={st['mean_batch_occupancy']:.3f} hist={st['batch_size_hist']} "
            f"rss=+{rss_mb() - rss0:.0f}MB"
        )
    stop.set()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    st = svc.stats()
    svc.stop()
    import json

    print(json.dumps({
        "metric": "style_net_soak",
        "transport": transport,
        "requests": int(sum(done)),
        "errors": len(errors),
        "error_sample": errors[:3],
        "throughput_img_s": round(sum(done) / wall, 1),
        "mean_occupancy": round(st["mean_batch_occupancy"], 3),
        "batch_size_hist": st["batch_size_hist"],
        "latency_p50_ms": round(st["latency_p50_ms"], 1),
        "latency_p95_ms": round(st["latency_p95_ms"], 1),
        "wall_s": round(wall, 1),
        "rss_growth_mb": round(rss_mb() - rss0, 1),
    }))


if __name__ == "__main__":
    main()
