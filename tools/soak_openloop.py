"""Open-loop serving soak (VERDICT r2 #9): submitters blast frames as fast
as the bounded request queue accepts (backpressure = the only throttle), so
batches run at high occupancy — unlike the r2 closed-loop soak where each
client waited its relay RTT and batches ran ~9% full.

Measures: requests, errors, mean batch occupancy, throughput, latency
p50/p95, host RSS growth (the documented axon device_put leak)."""
import os, sys, threading, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
    classifier_init, truncated_moco_init, combined_apply,
)
from heuristique_style_transfer_code_tpu.tasks.serving import BatchingInferenceServer

def log(*a): print(*a, file=sys.stderr, flush=True)

def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0

DURATION = float(os.environ.get("SOAK_SECONDS", "480"))
N_SUBMITTERS = 6
BATCH = 64
TRUNCATE = 8

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
variables = {
    "moco": truncated_moco_init(k1, TRUNCATE, dim=256),
    "classifier": classifier_init(k2, 256, 4),
}

def forward_eval(v, images):
    logits, _ = combined_apply(
        v["moco"], v["classifier"], images.astype(jnp.bfloat16), TRUNCATE
    )
    return logits

rng = np.random.RandomState(0)
FRAMES = [rng.randint(0, 256, (224, 224, 3), dtype=np.uint8) for _ in range(64)]

server = BatchingInferenceServer(
    forward_eval, variables, batch_size=BATCH, max_delay_ms=10,
    max_in_flight=3, max_queue=512, transport="yuv420",
)
server.start()
# warm the compile before the clock starts
server.submit(FRAMES[0]).result(timeout=1200)
log("warmup done; starting open-loop soak for %.0f s" % DURATION)

rss0 = rss_mb()
stop = threading.Event()
ok = [0] * N_SUBMITTERS
errs = [0] * N_SUBMITTERS
import queue as _q
futs: "_q.Queue" = _q.Queue(maxsize=4096)

def submitter(i):
    j = 0
    while not stop.is_set():
        try:
            f = server.submit(FRAMES[(i * 17 + j) % len(FRAMES)])
            futs.put((time.perf_counter(), f, i))
        except Exception:
            errs[i] += 1
        j += 1

def reaper():
    while True:
        item = futs.get()
        if item is None:
            return
        t0, f, i = item
        try:
            r = f.result(timeout=120)
            assert r.shape == (4,)
            ok[i] += 1
        except Exception:
            errs[i] += 1

threads = [threading.Thread(target=submitter, args=(i,), daemon=True) for i in range(N_SUBMITTERS)]
reap = threading.Thread(target=reaper, daemon=True)
reap.start()
t_start = time.perf_counter()
for t in threads: t.start()

while time.perf_counter() - t_start < DURATION:
    time.sleep(30)
    st = server.stats()
    log(f"t={time.perf_counter()-t_start:6.0f}s imgs={st['images']} occ={st['mean_batch_occupancy']:.3f} "
        f"thr={st['throughput_imgs_per_sec']:.1f}/s p50={st['latency_p50_ms']:.0f}ms p95={st['latency_p95_ms']:.0f}ms rss={rss_mb():.0f}MB")

stop.set()
for t in threads: t.join(timeout=30)
server.stop(drain=True)
futs.put(None)
reap.join(timeout=120)
st = server.stats()
rss1 = rss_mb()
elapsed = time.perf_counter() - t_start
log("=== SOAK RESULT ===")
log(f"duration {elapsed:.0f}s, requests ok={sum(ok)} errors={sum(errs)}")
log(f"batches={st['batches']} images={st['images']} occupancy={st['mean_batch_occupancy']:.3f}")
log(f"throughput={st['throughput_imgs_per_sec']:.1f} img/s p50={st['latency_p50_ms']:.0f}ms p95={st['latency_p95_ms']:.0f}ms")
log(f"host RSS {rss0:.0f} -> {rss1:.0f} MB (+{rss1-rss0:.0f}; {(rss1-rss0)/max(st['batches'],1):.2f} MB/batch)")
