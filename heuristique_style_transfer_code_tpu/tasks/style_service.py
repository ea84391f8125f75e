"""Style-transfer-as-a-service: batched Adam-on-pixels jobs from concurrent
clients.

The reference runs its namesake as an offline per-image script
(functions/functions_RESNET50_Truncate_Gram_Attention.py:218-285, ~500 host
round trips per image). `tasks/style_transfer.py` already collapses one
image's whole loop into a single compiled ``lax.while_loop`` and batches a
dataset; this module turns that program into an online SERVICE: concurrent
clients submit single images, a dispatcher packs them into fixed-shape
device batches, and ONE while_loop dispatch optimises the whole batch with
per-image early stop.

Why batching jobs is the right TPU shape: each job's per-iteration work at
batch 1 leaves the chip memory-bound and under-occupied — the measured loop
throughput grows from 3,745 img-iters/s at b=8 to 8,295 at b=128 (PERF.md),
so co-scheduling independent jobs more than doubles chip-seconds per job
served. Per-image results are INDEPENDENT of what they share a batch with:
the update mask freezes converged lanes bit-exactly, gradients never couple
lanes (eval-mode encoder: no batch statistics), and each job's noise seed
derives from its own monotonic job id (``fold_in(base_key, job_id)``), not
from the batch composition — asserted in tests/test_style_service.py.

Pad lanes replicate the batch's first job (static shapes, no recompiles) and
cost no extra wall time: they converge exactly when their twin does.

Operator note (axon-relay environments): recycle the process after ~10-20k
batches — the relay client leaks ~4.6 MB RSS per device_put (environment
bug, bare-jax repro; absent on directly-attached TPUs).
"""
from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np

from ..ops.resize import IMAGENET_MEAN, IMAGENET_STD
from .style_transfer import (
    make_content_style_optimizer,
    make_style_transfer_optimizer,
)


@dataclass
class StyleJobResult:
    """One stylised job: ``image`` is the denormalised uint8 canvas,
    ``loss`` the job's final Gram-MSE, ``iterations`` the batch's iteration
    count (the while_loop runs to the slowest ACTIVE lane; this job's pixels
    froze at its own convergence)."""

    image: np.ndarray  # (crop, crop, 3) uint8
    loss: float
    iterations: int


def style_weights(style, names: List[str]) -> np.ndarray:
    """(K,) f32 blend weights from a gallery name, a {name: weight} mapping
    (normalised to sum 1 — a convex Gram interpolation), or None (the first
    style). Module-level so the recycling proxy (tasks/recycling.py) can
    validate style picks parent-side with the exact same errors."""
    if style is None:
        style = names[0]
    if isinstance(style, str):
        if style not in names:
            raise ValueError(
                f"unknown style {style!r}; gallery: {names}"
            )
        w = np.zeros((len(names),), np.float32)
        w[names.index(style)] = 1.0
        return w
    unknown = [n for n in style if n not in names]
    if unknown:
        raise ValueError(f"unknown styles {unknown}; gallery: {names}")
    w = np.zeros((len(names),), np.float32)
    for n, v in style.items():
        v = float(v)
        if not np.isfinite(v) or v < 0:
            raise ValueError(f"style weight for {n!r} must be >= 0, got {v}")
        w[names.index(n)] = v
    total = float(w.sum())
    if total <= 0:
        raise ValueError("style weights must sum to > 0")
    return w / total


def _to_canvas(image: np.ndarray, crop: int) -> np.ndarray:
    """Validate an RGB uint8 image and downscale it to the (crop, crop)
    canvas with the canonical 256:224 staged geometry."""
    image = np.asarray(image)
    if image.ndim != 3 or image.shape[2] != 3 or 0 in image.shape[:2]:
        raise ValueError(
            f"image must be (H, W, 3) RGB with H, W > 0, got shape {image.shape}"
        )
    if image.dtype != np.uint8:
        raise ValueError(f"image must be uint8, got dtype {image.dtype}")
    if image.shape[:2] != (crop, crop):
        from .camera import downscale_frame

        shorter = max(crop, round(crop * 256 / 224))
        image = downscale_frame(image, crop=crop, shorter=shorter)
    return image


class StyleTransferService:
    """Dynamic-batching style-transfer job server over one jitted program.

    Two modes, same batcher and dispatch shape:

    - **texture** (``gram_fn=``, the reference's semantics): each job's own
      Gram is the target and the canvas starts from noise.
    - **content+style** (``extract_fn=`` + ``styles=``, beyond parity): a
      gallery of named style images is encoded ONCE at startup into a
      device-resident Gram stack; each job picks a style by name
      (``submit(image, style="vangogh")``) or BLENDS several
      (``style={"vangogh": 0.7, "monet": 0.3}`` — the target is the
      convex combination of the gallery Grams, the classic style
      interpolation) and its canvas is optimised for ``style_weight *
      gram-MSE + content_weight * feature-MSE [+ tv_weight * TV]``
      starting from the content image (``init='content'``, classic) or
      per-job noise. Per-batch device work is one tiny ``(B,K)×(K,...)``
      contraction against the resident stacks — no style re-encoding per
      dispatch, and a pure-name pick (one-hot weights) is bit-identical
      to indexing.

    Parameters
    ----------
    gram_fn : per-image target-Gram program (``make_gram_fn_gram_attention``
        / ``make_gram_fn_patches`` from tasks/style_transfer.py) — texture
        mode. Exclusive with ``extract_fn``.
    extract_fn : per-image ``(feats, [style Grams])`` program
        (``make_extract_fn_gram_attention``) — content+style mode; requires
        ``styles``, a non-empty ``{name: (H, W, 3) uint8}`` mapping.
    job_fn : pre-built ``(images_u8, style_w, job_ids) -> (u8, iters,
        per_loss)`` batch program (a feed-forward net via
        ``fast_style.make_net_job_fn``, or a deserialised AOT artifact).
        A bare callable serves ONE batch size; a mapping
        ``{batch_size: program}`` enables multi-size dispatch (each size's
        program is only called at its own shape — the same traceable net
        forward may appear under every size, an AOT artifact ships one
        exported program per size) and overrides ``batch_size``.
    batch_size : static device batch B (jobs per while_loop dispatch), or a
        sequence of sizes: the dispatcher then picks the SMALLEST compiled
        size that fits the collected jobs. Per-iteration wall time scales
        with the compiled batch (measured 2.1 ms/iter at b8 vs 12.0 at b64,
        PERF.md), so under light load a multi-size service answers ~5×
        sooner than one padded to the big batch — while full batches still
        ride the throughput-optimal size. Results stay deterministic per
        (job, chosen size); the composition-invariance guarantee holds
        within each size (XLA may tile different batch shapes ~1 ULP
        apart).
    max_delay_ms : flush deadline for a partially filled batch. Style jobs
        run for seconds, so the default is far looser than the
        classification batcher's — waiting 200 ms to double occupancy is
        almost always the right trade.
    num_iterations / threshold / learning_rate : reference loop semantics
        (Adam on the pixels, early stop below threshold, iteration cap).
    seed : base PRNG key; job j's noise is ``normal(fold_in(key, j))`` —
        deterministic per job id, independent of batching.
    mesh : optional Mesh — pixels/Adam state batch-sharded over 'data'
        (and H rows over 'spatial' when present), as in the batch task.
    transport : 'rgb' (default) or 'yuv420'. Unlike classification, a
        style job's RESULT is as heavy as its input — a full image — so a
        bandwidth-bound link pays pixel bytes both ways (the net-service
        soak measured exactly this as the binding constraint, PERF.md).
        'yuv420' ships planar I420 uint8 in BOTH directions (1.5 vs 3
        bytes/px; device decodes before the job, re-packs the canvas after
        it). Standard 4:2:0 chroma subsampling — lossy, opt-in; the
        client-facing submit()/result API stays RGB either way.
    """

    def __init__(
        self,
        gram_fn: Optional[Callable] = None,
        *,
        extract_fn: Optional[Callable] = None,
        job_fn: Optional[Callable] = None,
        style_names: Optional[List[str]] = None,
        styles: Optional[dict] = None,
        style_weight: float = 1.0,
        content_weight: float = 1.0,
        tv_weight: float = 0.0,
        init: str = "content",
        crop: int = 224,
        batch_size: int = 8,
        max_delay_ms: float = 200.0,
        num_iterations: int = 500,
        threshold: float = 1e-4,
        learning_rate: float = 0.01,
        max_in_flight: int = 2,
        max_queue: int = 256,
        mesh=None,
        seed: int = 0,
        transport: str = "rgb",
    ):
        import jax
        import jax.numpy as jnp

        from ..data.augment import eval_preprocess

        if transport not in ("rgb", "yuv420"):
            raise ValueError(
                f"transport must be 'rgb' or 'yuv420', got {transport!r}"
            )
        if transport == "yuv420" and int(crop) % 4:
            raise ValueError("yuv420 transport needs crop % 4 == 0")
        self.transport = transport

        n_fns = sum(f is not None for f in (gram_fn, extract_fn, job_fn))
        if n_fns != 1:
            raise ValueError(
                "pass exactly one of gram_fn (texture mode), extract_fn "
                "(content+style mode) or job_fn (a pre-built/AOT program)"
            )
        if extract_fn is not None and not styles:
            raise ValueError("content+style mode requires a non-empty styles=")
        if extract_fn is None and styles:
            raise ValueError("styles= only applies to content+style mode")
        if style_names is not None and job_fn is None:
            raise ValueError("style_names= only applies with job_fn=")
        if init not in ("content", "noise"):
            raise ValueError(f"init must be 'content' or 'noise', got {init!r}")

        self.crop = int(crop)
        from collections.abc import Mapping

        jobs_by_size = None
        if isinstance(job_fn, Mapping):
            # {batch_size: program} — multi-size dispatch for pre-built
            # programs: each size's program only ever sees its own shape
            # (a traceable net forward may appear under several sizes; an
            # AOT artifact ships one exported program per size). Overrides
            # batch_size.
            jobs_by_size = {int(s): f for s, f in job_fn.items()}
            sizes = sorted(jobs_by_size)
        else:
            try:
                sizes = sorted({int(b) for b in batch_size})
            except TypeError:
                sizes = [int(batch_size)]
            if job_fn is not None and len(sizes) > 1:
                raise ValueError(
                    "a bare job_fn= callable is compiled at ONE batch "
                    "shape; for multi-size dispatch pass a mapping "
                    "{batch_size: job_fn} (each size's program is only "
                    "called at its own shape)"
                )
        if not sizes or sizes[0] < 1:
            raise ValueError(f"batch sizes must be >= 1, got {batch_size}")
        self.batch_sizes = sizes
        self.batch_size = sizes[-1]  # collection cap / throughput size
        self.max_delay = max_delay_ms / 1e3
        self.num_iterations = int(num_iterations)
        if styles:
            self.style_names: List[str] = list(styles)
        else:
            self.style_names = list(style_names) if style_names else []

        base_key = jax.random.PRNGKey(seed)
        mean = jnp.asarray(np.asarray(IMAGENET_MEAN).reshape(1, 1, 1, 3))
        std = jnp.asarray(np.asarray(IMAGENET_STD).reshape(1, 1, 1, 3))

        def to_u8(pixels):
            # denormalise ON DEVICE and ship uint8: 4x fewer D2H bytes than
            # the f32 canvas (matters when the chip sits behind a relay)
            canvas = jnp.clip(
                pixels.astype(jnp.float32) * std + mean, 0.0, 1.0
            )
            return jnp.round(canvas * 255.0).astype(jnp.uint8)

        def noise0_for(job_ids, shape):
            def noise_for(jid):
                return jax.random.normal(
                    jax.random.fold_in(base_key, jid), shape, jnp.float32
                )

            return jax.vmap(noise_for)(job_ids)

        if gram_fn is not None:
            optimise = make_style_transfer_optimizer(
                gram_fn, learning_rate, num_iterations, threshold, mesh=mesh
            )

            def job(images_u8, style_w, job_ids):
                del style_w  # texture mode: the target is the job's own Gram
                images = eval_preprocess(images_u8, crop)
                targets = gram_fn(images)
                noise0 = noise0_for(job_ids, images.shape[1:])
                pixels, iters, per_loss = optimise(noise0, targets)
                return to_u8(pixels), iters, per_loss

        elif job_fn is not None:
            # pre-built program (e.g. a deserialised AOT artifact,
            # deploy/artifact.load_style_artifact): already the full
            # (images_u8, style_w, job_ids) -> (u8, iters, per_loss) batch
            # pipeline with weights/gallery baked in
            job = job_fn

        else:
            # encode the gallery ONCE: per style layer, a (K, ...) Gram
            # stack, device-resident
            style_u8 = np.stack(
                [_to_canvas(im, self.crop) for im in styles.values()]
            )
            gram_stacks = [
                jnp.asarray(g)
                for g in jax.jit(
                    lambda u8: [
                        g.astype(jnp.float32)
                        for g in extract_fn(eval_preprocess(u8, crop))[1]
                    ]
                )(style_u8)
            ]
            optimise = make_content_style_optimizer(
                extract_fn, style_weight, content_weight,
                learning_rate, num_iterations, threshold,
                tv_weight=tv_weight, mesh=mesh,
            )

            def job(images_u8, style_w, job_ids):
                images = eval_preprocess(images_u8, crop)
                content_feats = extract_fn(images)[0].astype(jnp.float32)
                # per-job convex Gram blend; a one-hot row is bit-identical
                # to indexing (g*1 + 0 is exact in f32)
                grams = [
                    jnp.einsum("bk,k...->b...", style_w, gs)
                    for gs in gram_stacks
                ]
                if init == "content":
                    pixels0 = images.astype(jnp.float32)
                else:
                    pixels0 = noise0_for(job_ids, images.shape[1:])
                pixels, iters, per_loss = optimise(pixels0, grams, content_feats)
                return to_u8(pixels), iters, per_loss

        self._sharding = None
        if mesh is not None:
            from ..parallel.sharding import batch_sharding

            self._sharding = batch_sharding(mesh)
        if self.transport == "yuv420":
            # halve the bytes BOTH ways through a bandwidth-bound link
            # (each image-valued result is as heavy as its input — the
            # style soak measured exactly this as the binding constraint,
            # PERF.md): jobs arrive as planar I420 (crop*3//2, crop) and
            # the stylised canvas is re-packed to I420 ON DEVICE before
            # the fetch. Standard 4:2:0 chroma subsampling — lossy, opt-in
            # (the camera-transport precedent, tasks/camera.py).
            from .camera import rgb_to_yuv420_device, yuv420_to_rgb_device

            c = self.crop

            def _with_yuv_transport(inner):
                def yuv_job(yuv_u8, style_w, job_ids):
                    rgb01 = jax.vmap(
                        lambda f: yuv420_to_rgb_device(f, c, c)
                    )(yuv_u8)
                    rgb_u8 = jnp.round(rgb01 * 255.0).astype(jnp.uint8)
                    out_u8, iters, per = inner(rgb_u8, style_w, job_ids)
                    return (
                        jax.vmap(rgb_to_yuv420_device)(out_u8), iters, per
                    )

                return yuv_job
        else:
            def _with_yuv_transport(inner):
                return inner

        # raw (RGB, unwrapped) programs: what export_style_artifact traces —
        # transport is a SERVE-TIME choice, never an artifact property (an
        # exported program stays RGB; any host can then serve it with
        # either transport)
        if jobs_by_size is not None:
            self._raw_jobs_by_size = dict(jobs_by_size)
            self._jobs_by_size = {
                s: jax.jit(_with_yuv_transport(f))
                for s, f in jobs_by_size.items()
            }
            self._job = self._jobs_by_size[self.batch_size]
        else:
            self._raw_jobs_by_size = {s: job for s in sizes}
            self._job = jax.jit(_with_yuv_transport(job))
            self._jobs_by_size = {s: self._job for s in sizes}

        self._next_id = 0
        self._id_lock = threading.Lock()
        self.max_queue = int(max_queue)  # read by the recycling proxy
        self._requests: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._in_flight: "queue.Queue" = queue.Queue(maxsize=int(max_in_flight))
        self._stop = threading.Event()
        self._stats_lock = threading.Lock()
        self._batches = 0
        self._jobs = 0
        self._iters_sum = 0
        self._occupancy_sum = 0.0
        self._size_hist: dict = {}
        self._consecutive_failures = 0
        self._latencies = deque(maxlen=2048)
        self._started = None
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._fetcher = threading.Thread(target=self._fetch_loop, daemon=True)

    # ---- client API ----------------------------------------------------

    def start(self) -> "StyleTransferService":
        self._started = time.perf_counter()
        self._dispatcher.start()
        self._fetcher.start()
        return self

    def warmup(self):
        """AOT-compile the job program WITHOUT running it (a real warm
        dispatch would execute the full while_loop — seconds of chip time).
        With the persistent XLA compile cache (default on for the CLIs) the
        first live dispatch then deserialises the executable instead of
        compiling."""
        import jax
        import jax.numpy as jnp

        c = self.crop
        in_tail = (
            (c * 3 // 2, c) if self.transport == "yuv420" else (c, c, 3)
        )
        for b in self.batch_sizes:
            img_s = jax.ShapeDtypeStruct((b,) + in_tail, jnp.uint8)
            if self._sharding is not None:
                img_s = jax.ShapeDtypeStruct(
                    (b,) + in_tail, jnp.uint8, sharding=self._sharding
                )
            ids_s = jax.ShapeDtypeStruct((b,), jnp.int32)
            w_s = jax.ShapeDtypeStruct(
                (b, max(1, len(self.style_names))), jnp.float32
            )
            self._jobs_by_size[b].lower(img_s, w_s, ids_s).compile()

    def _style_weights(self, style) -> np.ndarray:
        return style_weights(style, self.style_names)

    def submit(self, image: np.ndarray, style=None) -> Future:
        """Submit one RGB uint8 image; returns a Future resolving to a
        StyleJobResult. Images larger than (crop, crop) are host-downscaled
        in the caller's thread (canonical 256:224 staged geometry). In
        content+style mode ``style`` picks a gallery style by name, or
        blends several with a ``{name: weight}`` mapping (default: the
        first style); texture mode takes no style."""
        if self._stop.is_set():
            raise RuntimeError("service is stopped")
        if self.style_names:
            style_w = self._style_weights(style)
        elif style is not None:
            raise ValueError("texture mode takes no style= (no gallery)")
        else:
            style_w = np.zeros((1,), np.float32)
        image = _to_canvas(image, self.crop)
        if self.transport == "yuv420":
            from .camera import rgb_to_yuv420

            image = rgb_to_yuv420(image)  # (crop*3//2, crop), host cv2
        with self._id_lock:
            job_id = self._next_id
            self._next_id += 1
        fut: Future = Future()
        t = time.perf_counter()
        fut._hst_submit_time = t
        self._requests.put((image, style_w, job_id, fut, t))
        if self._stop.is_set() and fut.cancel():
            raise RuntimeError("service is stopped")
        return fut

    def stop(self, drain: bool = True):
        if self._started is None:
            self._stop.set()
            try:
                while True:
                    item = self._requests.get_nowait()
                    if item is not None:
                        item[3].cancel()
            except queue.Empty:
                pass
            return
        if not drain:
            self._stop.set()
        self._requests.put(None)
        self._dispatcher.join()
        self._in_flight.put(None)
        self._fetcher.join()
        self._stop.set()
        try:
            while True:
                item = self._requests.get_nowait()
                if item is not None:
                    item[3].cancel()
        except queue.Empty:
            pass

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop(drain=exc[0] is None)

    def health(self, max_consecutive_failures: int = 3) -> tuple:
        if self._started is None or self._stop.is_set():
            return False, "service not running"
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
                "jobs": self._jobs,
                "transport": self.transport,
                "mean_batch_occupancy": (
                    self._occupancy_sum / self._batches if self._batches else 0.0
                ),
                "mean_iterations": (
                    self._iters_sum / self._batches if self._batches else 0.0
                ),
                "jobs_per_sec": self._jobs / elapsed if elapsed > 0 else 0.0,
                "latency_p50_ms": pct(0.50),
                "latency_p95_ms": pct(0.95),
                "batch_size_hist": {
                    str(k): v for k, v in sorted(self._size_hist.items())
                },
            }

    # ---- internals -----------------------------------------------------

    def _collect_batch(self) -> Optional[tuple]:
        item = self._requests.get()
        if item is None:
            return None
        images: List[np.ndarray] = [item[0]]
        sidx: List[np.ndarray] = [item[1]]
        ids: List[int] = [item[2]]
        futures: List[Future] = [item[3]]
        deadline = item[4] + self.max_delay
        while len(images) < self.batch_size:
            timeout = deadline - time.perf_counter()
            try:
                if timeout <= 0:
                    item = self._requests.get_nowait()
                else:
                    item = self._requests.get(timeout=timeout)
            except queue.Empty:
                break
            if item is None:
                self._requests.put(None)
                break
            images.append(item[0])
            sidx.append(item[1])
            ids.append(item[2])
            futures.append(item[3])
        return images, sidx, ids, futures

    @staticmethod
    def _resolve(fut: Future, value=None, exc: Optional[Exception] = None):
        try:
            if exc is not None:
                fut.set_exception(exc)
            else:
                fut.set_result(value)
        except Exception:  # cancelled: client gave up
            pass

    def _dispatch_loop(self):
        import jax

        while not self._stop.is_set():
            batch = self._collect_batch()
            if batch is None:
                break
            images, sidx, ids, futures = batch
            n = len(images)
            # smallest compiled size that fits: per-iteration wall time
            # scales with the compiled batch, so light batches answer sooner
            size = next(s for s in self.batch_sizes if s >= n)
            if n < size:
                # pad with the first job (its lane converges at the same
                # iteration as the twin, so padding costs no wall time)
                images = images + [images[0]] * (size - n)
                sidx = sidx + [sidx[0]] * (size - n)
                ids = ids + [ids[0]] * (size - n)
            try:
                arr = np.stack(images)
                sidx_arr = np.stack(sidx).astype(np.float32)
                id_arr = np.asarray(ids, np.int32)
                if self._sharding is not None:
                    arr = jax.device_put(arr, self._sharding)
                out = self._jobs_by_size[size](arr, sidx_arr, id_arr)
            except Exception as e:
                for f in futures:
                    self._resolve(f, exc=e)
                with self._stats_lock:
                    self._consecutive_failures += 1
                continue
            self._in_flight.put((out, futures, n, size))

    def _fetch_loop(self):
        while True:
            item = self._in_flight.get()
            if item is None:
                break
            (pixels, iters, per_loss), futures, n, size = item
            try:
                pixels = np.asarray(pixels)
                iters = int(iters)
                per_loss = np.asarray(per_loss)
                if self.transport == "yuv420":
                    # host-side I420 -> RGB so the client contract (RGB
                    # uint8) is transport-independent; inside the same
                    # try as the fetch so a decode failure resolves the
                    # futures with the error instead of killing the
                    # fetcher thread (which would wedge the service)
                    import cv2

                    pixels = np.stack([
                        cv2.cvtColor(pixels[i], cv2.COLOR_YUV2RGB_I420)
                        for i in range(pixels.shape[0])
                    ])
            except Exception as e:
                for f in futures:
                    self._resolve(f, exc=e)
                with self._stats_lock:
                    self._consecutive_failures += 1
                continue
            now = time.perf_counter()
            lats = []
            for i, f in enumerate(futures):
                self._resolve(
                    f,
                    StyleJobResult(
                        image=pixels[i], loss=float(per_loss[i]), iterations=iters
                    ),
                )
                t0 = getattr(f, "_hst_submit_time", None)
                if t0 is not None:
                    lats.append(now - t0)
            with self._stats_lock:
                self._batches += 1
                self._jobs += n
                self._iters_sum += iters
                self._consecutive_failures = 0
                self._occupancy_sum += n / size
                self._size_hist[size] = self._size_hist.get(size, 0) + 1
                self._latencies.extend(lats)
