"""Worker-process recycling for long-lived serving behind a leaking relay.

Why a PROCESS boundary: the axon relay client leaks ~4.6 MB of host RSS per
``device_put`` (environment bug, isolated with a bare-jax repro — see the
operator notes in tasks/serving.py / tasks/style_service.py; absent on
directly-attached TPUs). No amount of in-process hygiene gives that memory
back — only process exit does. This module therefore splits a serving
deployment in two:

- a long-lived PARENT that owns the client surface (the HTTP server, the
  request Futures, the stats) and **never touches the accelerator**, and
- a spawned WORKER child that builds and runs the existing batching service
  *unchanged* (``BatchingInferenceServer`` / ``StyleTransferService``) and
  owns JAX + the TPU.

After ``recycle_after`` forwarded requests the parent sends the worker a
drain sentinel: the child's service processes everything already forwarded
(every in-flight Future resolves normally), reports its final stats and
exits; meanwhile new requests queue parent-side. The parent then spawns a
fresh worker — warm-started by the persistent XLA compile cache
(core/cache.py; CLI warm start measured 7.3x faster, PERF.md) — flushes the
held requests in submission order, and carries on. **Zero request failures
across the handover**, and worker host RSS is bounded by
``recycle_after x leak`` instead of growing without bound.

The same replay machinery makes the parent resilient to a worker CRASH: the
parent keeps each request's payload until its result arrives, so unresolved
requests are re-sent to the respawned worker (application errors — e.g. a
malformed frame — are results, not crashes, and are never retried).

The worker never overlaps its successor: drain -> exit -> spawn is strictly
sequential, respecting the one-TPU-process-at-a-time rule for relay-attached
chips (CLAUDE.md).

Reference scope note: the reference has no serving path at all (its closest
analogue is the single-stream camera loop,
functions/functions_RESNET50_Truncate.py:253-379); this is operational
hardening of the TPU-native serving addition.
"""
from __future__ import annotations

import importlib
import multiprocessing as mp
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Callable, List, Optional

_STATS_PUSH_PERIOD_S = 1.0


def strip_flag(argv: List[str], name: str) -> List[str]:
    """Remove ``name V`` / ``name=V`` occurrences from an argv list (the
    parent strips its own recycle flag before handing argv to the child)."""
    out, i = [], 0
    while i < len(argv):
        a = argv[i]
        if a == name:
            i += 2
            continue
        if a.startswith(name + "="):
            i += 1
            continue
        out.append(a)
        i += 1
    return out


def _worker_main(conn, builder: str, argv: List[str]) -> None:
    """Child entry point (spawned — fresh interpreter, owns JAX/TPU).

    ``builder`` is a ``"module:function"`` spec; the function gets ``argv``
    and returns ``(service, info)`` where ``service`` is a *started* (and
    warmed) batching service exposing ``submit``/``stats``/``health``/
    ``stop`` and ``info`` is a small picklable dict of attributes the
    parent's HTTP layer needs (crop, class/style names, ...).
    """
    import os

    # This image's sitecustomize registers the TPU backend at interpreter
    # start and pins the platform, silently overriding JAX_PLATFORMS=cpu
    # (same fix as cli/_common._honor_jax_platforms_env — needed HERE
    # because a spawned worker is a fresh interpreter and the builder may
    # not route through the CLI package, e.g. the test builders).
    want = os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        try:
            import jax

            jax.config.update("jax_platforms", want)
        except Exception:
            pass

    try:
        mod_name, _, fn_name = builder.partition(":")
        build = getattr(importlib.import_module(mod_name), fn_name)
        service, info = build(list(argv))
    except BaseException as e:  # startup failure: report, don't hang parent
        try:
            conn.send(("fatal", f"{type(e).__name__}: {e}"))
        finally:
            conn.close()
        raise
    send_lock = threading.Lock()

    def _send(msg) -> None:
        with send_lock:
            try:
                conn.send(msg)
            except Exception:
                pass  # parent gone; the drain/EOF path below exits us

    def _send_err(req_id: int, exc: BaseException) -> None:
        try:
            with send_lock:
                conn.send(("err", req_id, exc))
        except Exception:
            # unpicklable exception (or parent gone): degrade to a string
            _send(("err", req_id, RuntimeError(f"{type(exc).__name__}: {exc}")))

    def _send_result(req_id: int, fut: Future) -> None:
        # runs in the service's fetcher thread via add_done_callback
        exc = fut.exception()
        if exc is None:
            _send(("ok", req_id, fut.result()))
        else:
            _send_err(req_id, exc)

    info = dict(info)
    info["worker_pid"] = os.getpid()
    _send(("ready", info))

    push_stop = threading.Event()

    def _push_stats() -> None:
        while not push_stop.wait(_STATS_PUSH_PERIOD_S):
            try:
                _send(("stats", service.stats(), tuple(service.health())))
            except Exception:
                return

    threading.Thread(target=_push_stats, daemon=True).start()

    while True:
        try:
            msg = conn.recv()
        except (EOFError, OSError):
            msg = ("drain",)  # parent died: drain what we have and exit
        if msg[0] == "drain":
            break
        _, req_id, (args, kwargs) = msg
        try:
            fut = service.submit(*args, **kwargs)
        except Exception as e:  # validation error: a RESULT, never retried
            _send_err(req_id, e)
            continue
        fut.add_done_callback(
            lambda f, rid=req_id: _send_result(rid, f)
        )
    push_stop.set()
    service.stop(drain=True)  # resolves every outstanding Future first
    _send(("bye", service.stats()))
    conn.close()


def _resolve(fut: Future, value=None, exc: Optional[BaseException] = None):
    try:
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(value)
    except Exception:  # cancelled: client gave up
        pass


class RecyclingServiceProxy:
    """Drop-in stand-in for a batching service that recycles its worker.

    Presents the same surface the HTTP front ends consume — ``submit(...) ->
    Future``, ``stats()``, ``health()``/``healthy()``, ``stop()``, plus the
    attributes from the worker's ``info`` dict (``crop``, ``style_names``,
    ...) — while the actual service lives in a spawned child process (see
    module docstring for why).

    Parameters
    ----------
    builder : ``"module:function"`` spec run IN THE CHILD; returns
        ``(started_service, info_dict)``. The parent never imports it.
    argv : argument list handed to the builder (typically the serve CLI's
        own argv minus the recycle flag, so the child reconstructs the
        exact configured service).
    recycle_after : forward this many requests to a worker, then drain and
        respawn it. 0 disables recycling (the proxy still isolates the
        leak in a child and survives worker crashes).
    preprocess_factory : optional ``info -> fn(*args, **kwargs) -> (args,
        kwargs)`` — built once after the first worker reports ready; runs
        in the submitting caller's thread, so request validation raises
        synchronously there (same 400-vs-500 HTTP semantics as calling the
        in-process service) and per-request CPU work (downscale) spreads
        over client threads instead of the forwarding path.
    start_timeout : seconds to wait for a worker to report ready (first
        start pays interpreter+jax import and the jit compile; recycled
        starts ride the persistent compile cache).
    max_pending : backpressure bound — ``submit`` blocks while this many
        requests are unresolved (forwarded or held), mirroring the inner
        service's bounded request queue so open-loop clients cannot pile
        an unbounded backlog into the parent during a handover.
    max_in_worker : cap on requests outstanding INSIDE the worker (sent,
        not yet resolved). Must stay at or below the inner service's
        request queue bound: the child's pipe-reader thread feeds
        ``service.submit``, and if the inner queue ever fills, the child
        stops draining the pipe, the parent's ``conn.send`` blocks holding
        the proxy lock, and stats()/health() convoy behind a slow device
        (observed on the relay). Excess requests wait in the parent's hold
        list and flush as results come back. The worker advertises its
        queue bound in the ready info (``max_queue``, both services expose
        it) and the proxy CLAMPS the window to it — a style service's
        default queue (256) is smaller than this default.
    max_consecutive_crashes : crash-replay is for transient worker deaths
        (OOM from the leak, a killed process); a request or backlog that
        reliably kills every worker must not be replayed forever — after
        this many crashes with no successful result in between, the proxy
        fails every outstanding Future, reports unhealthy, and rejects
        new submissions (an orchestrator restarts the whole deployment
        instead).
    """

    def __init__(
        self,
        builder: str,
        argv: List[str],
        *,
        recycle_after: int = 0,
        preprocess_factory: Optional[Callable] = None,
        start_timeout: float = 900.0,
        max_pending: int = 1024,
        max_in_worker: int = 384,
        max_consecutive_crashes: int = 3,
    ):
        self._builder = builder
        self._argv = list(argv)
        self._recycle_after = int(recycle_after)
        self._preprocess_factory = preprocess_factory
        self._preprocess: Optional[Callable] = None
        self._start_timeout = float(start_timeout)
        self._max_pending = int(max_pending)
        self._max_in_worker = int(max_in_worker)
        self._in_worker = 0
        self._lock = threading.Lock()
        self._room = threading.Condition(self._lock)
        self._pending: dict = {}  # req_id -> (Future, payload)
        self._hold: deque = deque()  # req_ids awaiting a live worker
        self._next_id = 0
        self._sent_since_spawn = 0
        self._draining = False
        self._stopping = False
        self._stopped = threading.Event()
        self._conn = None
        self._proc = None
        self._reader: Optional[threading.Thread] = None
        self._started = None
        self._latencies: deque = deque(maxlen=2048)
        self._resolved = 0
        self._errors = 0
        self._recycles = 0
        self._crashes = 0
        self._max_consecutive_crashes = int(max_consecutive_crashes)
        self._consecutive_crashes = 0
        self._failed: Optional[str] = None
        # summed FINAL child stats across completed workers
        self._acc = {"batches": 0, "images": 0, "jobs": 0,
                     "occupancy_sum": 0.0, "iters_sum": 0.0, "size_hist": {}}
        self._live_stats: dict = {}
        self._live_health = (True, "ok")
        self.info: dict = {}

    # ---- client API ----------------------------------------------------

    def start(self) -> "RecyclingServiceProxy":
        self._started = time.perf_counter()
        self._spawn()  # raises if the first worker cannot start
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()
        return self

    def submit(self, *args, **kwargs) -> Future:
        if self._stopping:
            raise RuntimeError(self._failed or "server is stopped")
        if self._preprocess is not None:
            args, kwargs = self._preprocess(*args, **kwargs)
        fut: Future = Future()
        fut._hst_submit_time = time.perf_counter()
        payload = (args, kwargs)
        with self._lock:
            while (
                len(self._pending) >= self._max_pending
                and not self._stopping
            ):
                self._room.wait()  # backpressure: block the caller
            if self._stopping:
                raise RuntimeError(self._failed or "server is stopped")
            rid = self._next_id
            self._next_id += 1
            self._pending[rid] = (fut, payload)
            if (
                self._conn is not None
                and not self._draining
                and not self._hold
                and self._in_worker < self._max_in_worker
            ):
                self._send_request_locked(rid, payload)
            else:  # handover in progress or worker window full: queue
                self._hold.append(rid)
        return fut

    def stop(self, drain: bool = True):
        """Stop. With ``drain`` everything already submitted resolves first
        (including requests held across a recycle handover); otherwise held
        requests are cancelled and only in-flight ones resolve."""
        with self._lock:
            self._stopping = True
            self._room.notify_all()  # wake blocked submitters to the error
            if not drain:
                while self._hold:
                    rid = self._hold.popleft()
                    ent = self._pending.pop(rid, None)
                    if ent is not None:
                        ent[0].cancel()
            # flush what the window allows; the reader keeps flushing as
            # results arrive and sends the drain sentinel once the hold
            # empties (event-driven — no blocking sends under the lock)
            self._flush_hold_locked()
            if self._conn is None and not self._hold and not self._pending:
                self._stopped.set()
        if self._started is None:
            # never started: nothing to wait for beyond the cancellations
            self._stopped.set()
            return
        self._stopped.wait(timeout=self._start_timeout)
        if self._reader is not None:
            self._reader.join(timeout=10.0)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop(drain=exc[0] is None)

    def health(self, max_consecutive_failures: int = 3) -> tuple:
        if self._failed:
            return False, self._failed
        if self._started is None or self._stopping:
            return False, "batcher not running"
        if self._reader is None or not self._reader.is_alive():
            return False, "worker thread dead"
        with self._lock:
            conn, draining = self._conn, self._draining
            ok, reason = self._live_health
        if conn is None or draining:
            # handover in progress: requests queue and WILL be served
            return True, "recycling worker"
        if not ok:
            return False, reason
        return True, "ok"

    def healthy(self, max_consecutive_failures: int = 3) -> bool:
        return self.health(max_consecutive_failures)[0]

    def stats(self) -> dict:
        with self._lock:
            live = dict(self._live_stats)
            acc = {k: (dict(v) if isinstance(v, dict) else v)
                   for k, v in self._acc.items()}
            lats = sorted(self._latencies)
            resolved = self._resolved
            elapsed = (
                time.perf_counter() - self._started if self._started else 0.0
            )
            extras = {
                "recycles": self._recycles,
                "worker_crashes": self._crashes,
                "requests": self._next_id,
                "pending": len(self._pending),
                "worker_pid": self.info.get("worker_pid"),
            }
        # count_key declares the service flavour ("images" for the
        # classification batcher, "jobs" for the style service) so the
        # merged stats ALWAYS carry the keys the HTTP /stats and /metrics
        # endpoints index, even before the first batch
        count_key = self.info.get("count_key", "images")
        lb = live.get("batches", 0)
        total_b = acc["batches"] + lb
        out = {
            "batches": total_b,
            # the parent's own resolved-request ledger, NOT the child's
            # 1 Hz stats push: exact the instant a Future resolves (each
            # ok-result is exactly one processed image/job)
            count_key: resolved,
            "mean_batch_occupancy": (
                (acc["occupancy_sum"]
                 + live.get("mean_batch_occupancy", 0.0) * lb) / total_b
                if total_b else 0.0
            ),
        }
        if count_key == "jobs":
            out["mean_iterations"] = (
                (acc["iters_sum"] + live.get("mean_iterations", 0.0) * lb)
                / total_b if total_b else 0.0
            )
            hist = dict(acc["size_hist"])
            for k, v in live.get("batch_size_hist", {}).items():
                hist[k] = hist.get(k, 0) + v
            out["batch_size_hist"] = {k: hist[k] for k in sorted(hist)}
        if "transport" in live or "transport" in self.info:
            out["transport"] = live.get("transport", self.info.get("transport"))
        # rate/latency keys from the PARENT's own ledger: they include
        # handover queueing, which is the honest client-visible number
        def pct(p):
            if not lats:
                return 0.0
            return lats[min(len(lats) - 1, int(p * len(lats)))] * 1e3

        rate = resolved / elapsed if elapsed > 0 else 0.0
        out["jobs_per_sec" if count_key == "jobs"
            else "throughput_imgs_per_sec"] = rate
        out["latency_p50_ms"] = pct(0.50)
        out["latency_p95_ms"] = pct(0.95)
        out.update(extras)
        return out

    # ---- internals -----------------------------------------------------

    def _send_request_locked(self, rid: int, payload) -> bool:
        """Forward one request to the live worker. On a broken pipe (worker
        just crashed; the reader will notice and respawn) the request goes
        back on hold instead of failing the submitting client."""
        try:
            self._conn.send(("req", rid, payload))
        except Exception:
            self._hold.append(rid)
            return False
        self._sent_since_spawn += 1
        self._in_worker += 1
        if (
            self._recycle_after
            and self._sent_since_spawn >= self._recycle_after
            and not self._draining
        ):
            self._draining = True
            try:
                self._conn.send(("drain",))
            except Exception:
                pass  # crash path: reader respawns, counter resets anyway
        return True

    def _flush_hold_locked(self) -> None:
        """Forward held requests in submission order while the worker has
        window room; once stopping and nothing is left to forward, send
        the final drain sentinel. Every send is window-bounded, so the
        child's pipe-reader always drains promptly and ``conn.send`` never
        blocks for long (blocking sends under this lock convoy
        stats()/health() — and, with image-sized results, can deadlock
        against a full child->parent pipe)."""
        while (
            self._hold
            and self._conn is not None
            and not self._draining
            and self._in_worker < self._max_in_worker
        ):
            rid = self._hold.popleft()
            ent = self._pending.get(rid)
            if ent is None:  # cancelled while held
                continue
            if not self._send_request_locked(rid, ent[1]):
                # send failed and re-appended rid at the TAIL; restore
                # order and let the crash path respawn
                self._hold.pop()
                self._hold.appendleft(rid)
                break
        if (
            self._stopping
            and self._conn is not None
            and not self._draining
            and not self._hold
        ):
            self._draining = True
            try:
                self._conn.send(("drain",))
            except Exception:
                pass

    def _spawn(self) -> None:
        """Spawn a worker, block until it reports ready, then flush held
        requests in submission order. Called from start() and (on recycle/
        crash) from the reader thread — never concurrently."""
        ctx = mp.get_context("spawn")
        parent_conn, child_conn = ctx.Pipe()
        proc = ctx.Process(
            target=_worker_main,
            args=(child_conn, self._builder, self._argv),
            daemon=True,
        )
        proc.start()
        child_conn.close()
        deadline = time.monotonic() + self._start_timeout
        while not parent_conn.poll(0.5):
            if not proc.is_alive():
                raise RuntimeError(
                    f"serving worker died during startup (exit code "
                    f"{proc.exitcode})"
                )
            if time.monotonic() > deadline:
                proc.kill()
                raise RuntimeError(
                    f"serving worker not ready within {self._start_timeout}s"
                )
        msg = parent_conn.recv()
        if msg[0] != "ready":
            proc.join(timeout=10.0)
            raise RuntimeError(f"serving worker failed to start: {msg[1]}")
        with self._lock:
            self.info = msg[1]
            if "max_queue" in self.info:
                # never outrun the inner queue: a full inner queue blocks
                # the child's pipe reader (see max_in_worker docstring)
                self._max_in_worker = min(
                    self._max_in_worker, int(self.info["max_queue"])
                )
            if self._preprocess_factory is not None and self._preprocess is None:
                self._preprocess = self._preprocess_factory(self.info)
            for k, v in self.info.items():
                # expose crop/style_names/... for the HTTP layers
                if not hasattr(type(self), k) and not k.startswith("_"):
                    setattr(self, k, v)
            self._conn = parent_conn
            self._proc = proc
            self._sent_since_spawn = 0
            self._in_worker = 0
            self._draining = False
            self._live_stats = {}
            self._live_health = (True, "ok")
            # windowed flush; when stopping, the helper itself sends the
            # final drain once everything held has been forwarded
            self._flush_hold_locked()

    def _accumulate(self, final_stats: dict) -> None:
        b = final_stats.get("batches", 0)
        with self._lock:
            self._acc["batches"] += b
            for k in ("images", "jobs"):
                self._acc[k] += final_stats.get(k, 0)
            self._acc["occupancy_sum"] += (
                final_stats.get("mean_batch_occupancy", 0.0) * b
            )
            self._acc["iters_sum"] += final_stats.get("mean_iterations", 0.0) * b
            for k, v in final_stats.get("batch_size_hist", {}).items():
                self._acc["size_hist"][k] = self._acc["size_hist"].get(k, 0) + v

    def _on_child_gone(self, expected: bool) -> None:
        with self._lock:
            conn, proc = self._conn, self._proc
            self._conn = None
            self._proc = None
            self._live_stats = {}
            self._live_health = (True, "ok")
        if conn is not None:
            try:
                conn.close()
            except Exception:
                pass
        if proc is not None:
            proc.join(timeout=60.0)
            if proc.is_alive():
                proc.kill()
                proc.join(timeout=10.0)
        give_up = False
        with self._lock:
            if expected:
                self._consecutive_crashes = 0
                if not self._stopping:
                    self._recycles += 1
            else:
                self._crashes += 1
                self._consecutive_crashes += 1
                crash_streak = self._consecutive_crashes
                give_up = crash_streak >= self._max_consecutive_crashes
                # requests that were IN FLIGHT in the dead child: re-queue
                # their payloads for replay on the respawned worker (ids are
                # monotonic, so sorting restores submission order)
                held = set(self._hold)
                self._hold = deque(sorted(
                    list(self._hold)
                    + [r for r in self._pending if r not in held]
                ))
            stopping = self._stopping
            work_left = bool(self._hold) or bool(self._pending)
        if give_up:
            # a poison request/backlog kills every worker — stop replaying
            # (each cycle costs a full worker start), fail the outstanding
            # Futures, report unhealthy, reject new submissions
            reason = (
                f"serving worker crashed {crash_streak} times "
                "in a row with no successful result; giving up"
            )
            with self._lock:
                self._failed = reason
                self._stopping = True
                leftovers = list(self._pending.items())
                self._pending.clear()
                self._hold.clear()
                self._room.notify_all()
            for _, (fut, _p) in leftovers:
                _resolve(fut, exc=RuntimeError(reason))
            self._stopped.set()
            return
        if stopping and not work_left:
            self._stopped.set()
            return
        # anything left (held requests, or crash-replayed in-flight ones)
        # gets a fresh worker — even mid-stop, so drain semantics hold
        try:
            self._spawn()
        except Exception as e:
            with self._lock:
                leftovers = list(self._pending.items())
                self._pending.clear()
                self._hold.clear()
                self._stopping = True
                self._room.notify_all()
            for _, (fut, _p) in leftovers:
                _resolve(fut, exc=RuntimeError(
                    f"serving worker could not be respawned: {e}"
                ))
            self._stopped.set()

    def _read_loop(self) -> None:
        while True:
            with self._lock:
                conn = self._conn
                stopping = self._stopping
            if conn is None:
                if stopping:
                    self._stopped.set()
                    return
                time.sleep(0.05)
                continue
            try:
                msg = conn.recv()
            except (EOFError, OSError):
                self._on_child_gone(expected=False)
                continue
            kind = msg[0]
            if kind in ("ok", "err"):
                rid = msg[1]
                with self._lock:
                    ent = self._pending.pop(rid, None)
                    if ent is not None:
                        self._in_worker -= 1
                    self._consecutive_crashes = 0  # worker made progress
                    self._room.notify()
                    self._flush_hold_locked()
                if ent is None:
                    continue
                fut = ent[0]
                if kind == "ok":
                    _resolve(fut, msg[2])
                    t0 = getattr(fut, "_hst_submit_time", None)
                    with self._lock:
                        self._resolved += 1
                        if t0 is not None:
                            self._latencies.append(time.perf_counter() - t0)
                else:
                    exc = (
                        msg[2] if isinstance(msg[2], BaseException)
                        else RuntimeError(str(msg[2]))
                    )
                    _resolve(fut, exc=exc)
                    with self._lock:
                        self._errors += 1
            elif kind == "stats":
                with self._lock:
                    self._live_stats = msg[1]
                    self._live_health = tuple(msg[2])
            elif kind == "bye":
                self._accumulate(msg[1])
                self._on_child_gone(expected=True)
