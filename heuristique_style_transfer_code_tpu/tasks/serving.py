"""Multi-stream batched inference serving.

Production counterpart of the reference's single-stream camera loop
(functions/functions_RESNET50_Truncate.py:253-379): many concurrent clients
(cameras, RPC handlers) submit frames and get a Future back; a dispatcher
thread packs requests into fixed-shape batches for the jitted TPU program.

TPU-first design decisions:
- **One static batch shape.** The batcher always dispatches (B, 224, 224, 3):
  a deadline flush pads the tail with the batch's own first frame (never
  zeros — compressible transfers and degenerate BN inputs both lie) and only
  the real requests' futures are resolved. No recompiles, ever.
- **Deadline-based dynamic batching.** A batch goes out when it is full OR
  the oldest queued request has waited ``max_delay_ms`` — the standard
  latency/throughput dial.
- **Pipelined dispatch.** Up to ``max_in_flight`` batches are in flight
  before the dispatcher blocks on a result fetch, so host->device transfer
  and device compute overlap exactly like the camera ``pipeline_depth``
  path. A dedicated fetch thread resolves futures in FIFO order (device
  result fetches serialise anyway — PERF.md).

The server is transport-agnostic: ``submit`` is the whole client API, so an
HTTP/gRPC front end is a thin loop around it.

Operator note (axon-relay environments only): the axon client leaks ~4.6 MB
of host RSS per ``device_put`` (isolated with a bare-jax repro — an
environment bug, absent on directly-attached TPUs). A long-running server
behind the relay therefore grows without bound at roughly
``4.6 MB x batches``; recycle the serving process after ~10-20k dispatched
batches (watch ``stats()['batches']`` or host RSS) and reload via
``--quantized_path``/npz for a fast cold start. Directly-attached
deployments need no recycling.
"""
from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Callable, List, Optional

import numpy as np

from .camera import downscale_frame, make_camera_infer_fn


def prepare_frame(frame: np.ndarray, crop: int) -> np.ndarray:
    """Validate one RGB uint8 frame and host-downscale it to (crop, crop, 3)
    with the canonical 256:224 staged geometry — the submit-side
    preprocessing, run in the CALLER's thread. Shared by ``submit`` and the
    recycling proxy (tasks/recycling.py), so parent-side validation raises
    the exact errors the in-process service would."""
    frame = np.asarray(frame)
    # Validate HERE, in the caller's thread: a malformed frame must fail
    # the one client that sent it, never reach np.stack in the dispatcher
    # (where a shape mismatch would fail everyone sharing the batch).
    if frame.ndim != 3 or frame.shape[2] != 3 or 0 in frame.shape[:2]:
        raise ValueError(
            f"frame must be (H, W, 3) RGB with H, W > 0, got shape {frame.shape}"
        )
    if frame.dtype != np.uint8:
        raise ValueError(f"frame must be uint8, got dtype {frame.dtype}")
    if frame.shape[:2] != (crop, crop):
        # keep the canonical resize:crop ratio (256:224) for any crop
        shorter = max(crop, round(crop * 256 / 224))
        frame = downscale_frame(frame, crop=crop, shorter=shorter)
    return frame


class BatchingInferenceServer:
    """Dynamic-batching inference server over a jitted batch forward.

    Parameters
    ----------
    forward_eval : fn(variables, images_f (B,224,224,3)) -> logits — same
        contract as the camera/eval paths.
    variables : model pytree (device-resident after the first dispatch).
    batch_size : static device batch B.
    max_delay_ms : flush deadline for a partially filled batch.
    max_in_flight : batches in flight before the dispatcher applies
        backpressure (blocks until the oldest fetch completes).
    compute_dtype : e.g. jnp.bfloat16 for the MXU-native path.
    transport : "rgb" ships (crop, crop, 3) uint8 frames; "yuv420" converts
        each frame to planar I420 in the submitting client's thread (cv2,
        GIL-free) and ships 1.5 bytes/px — half the host->device bytes, the
        decisive factor when the link (not the chip) bounds throughput. The
        device side fuses the YUV->RGB conversion into the forward; the
        camera bench argmax-verifies this path against RGB. (The camera
        path's temporal-delta transport is not offered here: a serving
        batch interleaves frames from unrelated clients, so there is no
        previous-frame correlation to delta against — single-stream video
        should use ``run_camera``'s ``transport="yuv420_delta"``.)
    """

    def __init__(
        self,
        forward_eval: Callable,
        variables,
        *,
        batch_size: int = 64,
        max_delay_ms: float = 10.0,
        max_in_flight: int = 3,
        max_queue: int = 1024,
        compute_dtype=None,
        crop: int = 224,
        transport: str = "rgb",
        mesh=None,
        infer_fn: Optional[Callable] = None,
    ):
        """``mesh``: a jax Mesh — each batch is placed batch-sharded over its
        'data' axis, so one server saturates several chips (jit respects the
        input sharding; numerics identical to single-device, tested).

        ``infer_fn``: a prebuilt fused program ``fn(variables, batch_u8) ->
        probs`` used INSTEAD of building one from ``forward_eval`` — the hook
        for AOT serving artifacts (deploy/artifact.py), where the whole
        pipeline+weights ship as one StableHLO blob and ``variables`` may be
        ``None``. The batch it receives matches ``transport`` (RGB frames or
        planar I420), exactly what this server would otherwise build."""
        if transport not in ("rgb", "yuv420"):
            raise ValueError("transport must be 'rgb' or 'yuv420'")
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from ..parallel.sharding import batch_sharding

            if int(batch_size) % int(mesh.shape.get("data", 1) or 1):
                # batch doesn't divide the data axis (e.g. an SPMD artifact
                # exported over a different mesh shape): place the batch
                # replicated on the mesh's devices — still a committed
                # multi-device array, and the program's own input sharding
                # (sealed in an artifact, or jit in_shardings) reshards it
                self._sharding = NamedSharding(mesh, PartitionSpec())
            else:
                self._sharding = batch_sharding(mesh)  # shard the batch axis
        self.transport = transport
        if infer_fn is not None:
            self._infer = infer_fn
        elif transport == "yuv420":
            from .camera import make_camera_infer_fn_yuv

            self._infer = make_camera_infer_fn_yuv(
                forward_eval, crop, compute_dtype=compute_dtype, batch=batch_size
            )
        else:
            self._infer = make_camera_infer_fn(
                forward_eval, compute_dtype=compute_dtype, batch=batch_size,
                host_downscale=True,
            )
        self._variables = variables
        self.batch_size = int(batch_size)
        self.max_delay = max_delay_ms / 1e3
        self.max_in_flight = int(max_in_flight)
        self.crop = int(crop)
        self.max_queue = int(max_queue)  # read by the recycling proxy
        self._requests: "queue.Queue" = queue.Queue(maxsize=max_queue)
        # bounded: put() blocking IS the dispatcher's backpressure
        self._in_flight: "queue.Queue" = queue.Queue(maxsize=self.max_in_flight)
        self._stop = threading.Event()
        self._stats_lock = threading.Lock()
        self._batches = 0
        self._images = 0
        self._consecutive_failures = 0
        self._occupancy_sum = 0.0
        self._latencies = deque(maxlen=2048)  # submit->resolve, seconds
        self._started = None
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._fetcher = threading.Thread(target=self._fetch_loop, daemon=True)

    # ---- client API ----------------------------------------------------

    def start(self) -> "BatchingInferenceServer":
        self._started = time.perf_counter()
        self._dispatcher.start()
        self._fetcher.start()
        return self

    def submit(self, frame: np.ndarray) -> Future:
        """Submit one RGB uint8 frame; returns a Future resolving to the
        probability vector (np.ndarray). Frames larger than (crop, crop) are
        host-downscaled here, in the *caller's* thread, so N client threads
        spread the preprocessing cost (and the native/cv2 work is GIL-free)."""
        if self._stop.is_set():
            raise RuntimeError("server is stopped")
        frame = prepare_frame(frame, self.crop)
        if self.transport == "yuv420":
            from .camera import rgb_to_yuv420

            frame = rgb_to_yuv420(frame)  # caller-thread, GIL-free cv2
        fut: Future = Future()
        t = time.perf_counter()
        fut._hst_submit_time = t  # read by the fetcher for latency stats
        self._requests.put((frame, fut, t))
        if self._stop.is_set() and fut.cancel():
            # raced a concurrent stop() and the entry will never be
            # processed — fail fast instead of leaving the Future to hang
            # until the client's timeout (if it was already resolved during
            # the drain, cancel() fails and the result is returned normally)
            raise RuntimeError("server is stopped")
        return fut

    def stop(self, drain: bool = True):
        """Stop the server. With ``drain`` (default) everything already
        submitted is processed first; otherwise pending futures are
        cancelled. Safe on a server that was never start()ed (teardown
        paths on startup failures): cancels anything queued and returns."""
        if self._started is None:
            self._stop.set()
            try:
                while True:
                    item = self._requests.get_nowait()
                    if item is not None:
                        item[1].cancel()
            except queue.Empty:
                pass
            return
        if not drain:
            self._stop.set()
        self._requests.put(None)  # sentinel: dispatcher exits after queue
        self._dispatcher.join()
        self._in_flight.put(None)
        self._fetcher.join()
        self._stop.set()
        # non-drain leftovers, or anything submitted after the sentinel
        try:
            while True:
                item = self._requests.get_nowait()
                if item is not None:
                    item[1].cancel()
        except queue.Empty:
            pass

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop(drain=exc[0] is None)

    def health(self, max_consecutive_failures: int = 3) -> tuple:
        """(ok, reason). ok iff the server can still make progress: started,
        not stopped, both worker threads alive (a dead dispatcher/fetcher
        means every future would hang until its client timeout), and the
        device path is not consistently failing
        (``max_consecutive_failures`` whole-batch errors in a row with no
        success — e.g. the accelerator link died while the threads keep
        running). ``reason`` names the failing condition."""
        if self._started is None or self._stop.is_set():
            return False, "batcher not running"
        if not (self._dispatcher.is_alive() and self._fetcher.is_alive()):
            return False, "worker thread dead"
        with self._stats_lock:
            n = self._consecutive_failures
        if n >= max_consecutive_failures:
            return False, f"device path failing ({n} consecutive batch errors)"
        return True, "ok"

    def healthy(self, max_consecutive_failures: int = 3) -> bool:
        return self.health(max_consecutive_failures)[0]

    def stats(self) -> dict:
        with self._stats_lock:
            elapsed = (
                time.perf_counter() - self._started if self._started else 0.0
            )
            lats = sorted(self._latencies)

            def pct(p):
                if not lats:
                    return 0.0
                return lats[min(len(lats) - 1, int(p * len(lats)))] * 1e3

            return {
                "batches": self._batches,
                "images": self._images,
                "mean_batch_occupancy": (
                    self._occupancy_sum / self._batches if self._batches else 0.0
                ),
                "throughput_imgs_per_sec": (
                    self._images / elapsed if elapsed > 0 else 0.0
                ),
                "latency_p50_ms": pct(0.50),
                "latency_p95_ms": pct(0.95),
            }

    # ---- internals -----------------------------------------------------

    def _collect_batch(self) -> Optional[tuple]:
        """Block for the first request, then fill up to batch_size or until
        the FIRST request is max_delay old — but an expired deadline still
        drains everything already queued (up to batch_size), so a backlog
        (e.g. requests piled up behind the first jit compile) goes out as
        full batches, not one padded singleton per dispatch. Returns
        (frames, futures) or None on shutdown sentinel."""
        item = self._requests.get()
        if item is None:
            return None
        frames: List[np.ndarray] = [item[0]]
        futures: List[Future] = [item[1]]
        deadline = item[2] + self.max_delay
        while len(frames) < self.batch_size:
            timeout = deadline - time.perf_counter()
            try:
                if timeout <= 0:  # deadline passed: take only what's ready
                    item = self._requests.get_nowait()
                else:
                    item = self._requests.get(timeout=timeout)
            except queue.Empty:
                break
            if item is None:
                self._requests.put(None)  # re-post for the outer loop
                break
            frames.append(item[0])
            futures.append(item[1])
        return frames, futures

    @staticmethod
    def _resolve(fut: Future, value=None, exc: Optional[Exception] = None):
        """set_result/set_exception tolerant of client-side fut.cancel()."""
        try:
            if exc is not None:
                fut.set_exception(exc)
            else:
                fut.set_result(value)
        except Exception:  # cancelled (InvalidStateError): client gave up
            pass

    def _dispatch_loop(self):
        import jax

        while not self._stop.is_set():
            batch = self._collect_batch()
            if batch is None:
                break
            frames, futures = batch
            n = len(frames)
            if n < self.batch_size:
                # pad with the first real frame: static shape, non-degenerate
                # data, and compressed-transport-proof (distinct per batch)
                frames = frames + [frames[0]] * (self.batch_size - n)
            try:
                # stack inside the guard: any residual per-frame anomaly
                # (submit() validates, but belt-and-braces) fails only this
                # batch's futures instead of killing the dispatcher thread
                arr = np.stack(frames)
                device_arr = jax.device_put(arr, self._sharding)  # async H2D
                out = self._infer(self._variables, device_arr)
            except Exception as e:  # compile/dispatch error: fail the batch
                for f in futures:
                    self._resolve(f, exc=e)
                with self._stats_lock:
                    self._consecutive_failures += 1
                continue
            self._in_flight.put((out, futures, n))  # blocks = backpressure

    def _fetch_loop(self):
        while True:
            item = self._in_flight.get()
            if item is None:
                break
            out, futures, n = item
            try:
                probs = np.asarray(out)  # the one D2H fetch per batch
            except Exception as e:
                for f in futures:
                    self._resolve(f, exc=e)
                with self._stats_lock:
                    self._consecutive_failures += 1
                continue
            now = time.perf_counter()
            lats = []
            for i, f in enumerate(futures):
                self._resolve(f, probs[i])
                t0 = getattr(f, "_hst_submit_time", None)
                if t0 is not None:
                    lats.append(now - t0)
            with self._stats_lock:
                self._batches += 1
                self._images += n
                self._consecutive_failures = 0  # device path proven healthy
                self._occupancy_sum += n / self.batch_size
                self._latencies.extend(lats)
