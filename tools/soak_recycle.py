"""Recycling-serving soak (VERDICT r4 #4): the classification batcher runs
inside RecyclingServiceProxy worker processes that are drained and respawned
every SOAK_RECYCLE_AFTER requests, while open-loop submitters blast frames
from the parent. Proves, on the real relay:

- zero request failures across >= 2 worker handovers,
- the long-lived PARENT's host RSS stays flat (it never touches the device),
- each WORKER's RSS is bounded by recycle_after x the documented ~4.6 MB
  per-device_put axon leak instead of growing without bound.

Env knobs: SOAK_SECONDS (default 480), SOAK_RECYCLE_AFTER (default 20000
requests), SOAK_TRANSPORT (yuv420 default / rgb).

Run alone (never alongside another TPU process — relay congestion).
"""
import os
import queue as _q
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rss_mb(pid="self"):
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def build_worker(argv):
    """In-child builder: the same bf16 family-1 batcher as soak_openloop
    (PRNGKey(0) init — every respawned worker serves identical weights).
    argv: [transport]. Startup phases timed to stderr: on the axon relay
    the respawn latency is dominated by the re-grant after the previous
    worker exits, not by anything this code does (r5 measurement)."""
    t0 = time.perf_counter()

    def mark(what):
        log(f"worker[{os.getpid()}] {what} at +{time.perf_counter()-t0:.1f}s")

    import jax
    import jax.numpy as jnp

    # the image pins JAX_PLATFORMS=axon, which hides the host cpu backend;
    # list it too (axon stays default) so weight init can run host-side.
    # Must happen before any device query initialises the backends.
    want = os.environ.get("JAX_PLATFORMS") or ""
    if want and "cpu" not in want:
        try:
            jax.config.update("jax_platforms", want + ",cpu")
        except Exception:
            pass
    mark("jax imported")

    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        classifier_init,
        combined_apply,
        truncated_moco_init,
    )
    from heuristique_style_transfer_code_tpu.tasks.serving import (
        BatchingInferenceServer,
    )

    truncate = int(os.environ.get("SOAK_TRUNCATE", "8"))
    dim = int(os.environ.get("SOAK_DIM", "256"))
    # init on the HOST cpu backend (a checkpoint load in the real CLI):
    # on-device random init would pay dozens of relay round trips
    try:
        cpu0 = jax.local_devices(backend="cpu")[0]
    except Exception:
        cpu0 = None  # cpu backend unavailable: fall through to default
    import contextlib

    ctx = jax.default_device(cpu0) if cpu0 is not None else (
        contextlib.nullcontext()
    )
    with ctx:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        variables = jax.tree_util.tree_map(
            np.asarray,
            {
                "moco": truncated_moco_init(k1, truncate, dim=dim),
                "classifier": classifier_init(k2, dim, 4),
            },
        )
    mark("weights built (host)" if cpu0 is not None else "weights built")

    def forward_eval(v, images):
        logits, _ = combined_apply(
            v["moco"], v["classifier"], images.astype(jnp.bfloat16), truncate
        )
        return logits

    server = BatchingInferenceServer(
        forward_eval, variables,
        batch_size=int(os.environ.get("SOAK_BATCH", "64")),
        max_delay_ms=10, max_in_flight=3, max_queue=512,
        transport=argv[0] if argv else "yuv420",
    ).start()
    # warm the compile before reporting ready (persistent cache makes
    # every respawn after the first fast)
    warm = np.zeros((224, 224, 3), np.uint8)
    warm[::2, ::2] = 128
    server.submit(warm).result(timeout=1800)
    mark("warm dispatch done (device granted + compile cache)")
    return server, {"crop": 224, "count_key": "images",
                    "transport": server.transport}


def main():
    from heuristique_style_transfer_code_tpu.tasks.recycling import (
        RecyclingServiceProxy,
    )

    duration = float(os.environ.get("SOAK_SECONDS", "480"))
    recycle_after = int(os.environ.get("SOAK_RECYCLE_AFTER", "20000"))
    transport = os.environ.get("SOAK_TRANSPORT", "yuv420")
    n_submitters = 6

    rng = np.random.RandomState(0)
    frames = [
        rng.randint(0, 256, (224, 224, 3), dtype=np.uint8) for _ in range(64)
    ]

    proxy = RecyclingServiceProxy(
        "soak_recycle:build_worker", [transport],
        recycle_after=recycle_after, start_timeout=1800.0,
    ).start()
    log(f"worker pid {proxy.info['worker_pid']} ready; "
        f"recycle every {recycle_after} requests, soak {duration:.0f}s")

    rss0 = rss_mb()
    stop = threading.Event()
    ok = [0] * n_submitters
    errs = [0] * n_submitters
    futs: "_q.Queue" = _q.Queue(maxsize=4096)
    worker_rss_peaks = {}  # pid -> peak MB observed

    def submitter(i):
        j = 0
        while not stop.is_set():
            try:
                f = proxy.submit(frames[(i * 17 + j) % len(frames)])
                futs.put((time.perf_counter(), f, i))
            except Exception:
                if stop.is_set():  # woken out of backpressure by shutdown
                    break
                errs[i] += 1
            j += 1

    def reaper():
        while True:
            item = futs.get()
            if item is None:
                return
            t0, f, i = item
            try:
                # generous: a request held across a relay-respawn waits the
                # whole re-grant (measured ~13 min on this relay, r5)
                r = f.result(timeout=1800)
                assert r.shape == (4,)
                ok[i] += 1
            except Exception:
                errs[i] += 1

    threads = [
        threading.Thread(target=submitter, args=(i,), daemon=True)
        for i in range(n_submitters)
    ]
    reap = threading.Thread(target=reaper, daemon=True)
    reap.start()
    t_start = time.perf_counter()
    for t in threads:
        t.start()

    while time.perf_counter() - t_start < duration:
        time.sleep(15)
        st = proxy.stats()
        wpid = proxy.info.get("worker_pid")
        wrss = rss_mb(wpid)
        if wrss:
            worker_rss_peaks[wpid] = max(worker_rss_peaks.get(wpid, 0.0), wrss)
        log(f"t={time.perf_counter()-t_start:6.0f}s imgs={st['images']} "
            f"recycles={st['recycles']} crashes={st['worker_crashes']} "
            f"occ={st['mean_batch_occupancy']:.3f} "
            f"thr={st['throughput_imgs_per_sec']:.1f}/s "
            f"p50={st['latency_p50_ms']:.0f}ms p95={st['latency_p95_ms']:.0f}ms "
            f"parent_rss={rss_mb():.0f}MB worker[{wpid}]_rss={wrss:.0f}MB")

    stop.set()
    for t in threads:
        t.join(timeout=30)
    proxy.stop(drain=True)
    futs.put(None)
    reap.join(timeout=600)
    st = proxy.stats()
    rss1 = rss_mb()
    elapsed = time.perf_counter() - t_start
    log("=== RECYCLE SOAK RESULT ===")
    log(f"duration {elapsed:.0f}s, requests ok={sum(ok)} errors={sum(errs)}")
    log(f"recycles={st['recycles']} worker_crashes={st['worker_crashes']} "
        f"batches={st['batches']} images={st['images']} "
        f"occupancy={st['mean_batch_occupancy']:.3f}")
    log(f"throughput={st['throughput_imgs_per_sec']:.1f} img/s "
        f"p50={st['latency_p50_ms']:.0f}ms p95={st['latency_p95_ms']:.0f}ms")
    log(f"parent host RSS {rss0:.0f} -> {rss1:.0f} MB (+{rss1-rss0:.0f})")
    peaks = ", ".join(f"{p}:{v:.0f}MB" for p, v in worker_rss_peaks.items())
    log(f"worker RSS peaks: {peaks}")
    if sum(errs) == 0 and st["recycles"] >= 2:
        log("PASS: >=2 recycles, zero request failures")
    else:
        log("FAIL: recycles/errors out of contract")


if __name__ == "__main__":
    main()
