#!/usr/bin/env python
"""Headline benchmark: camera-mode images/sec on one TPU chip vs the
reference's CPU pipeline (BASELINE.json north star: >=10x).

Measured pipeline (both sides replicate the reference camera hot loop,
functions/functions_RESNET50_Truncate.py:306-319): uint8 480x640 frame ->
Resize(256) -> CenterCrop(224) -> normalise -> TruncatedMoCoV3(truncate=8) ->
classifier -> softmax.

Three TPU numbers are measured:
- batch-1 closed loop with host downscale (the production camera path:
  ~1 ms cv2 downscale on host -> 150 KB uint8 H2D -> fused
  normalise+forward+softmax on device): p50 per-frame ms + fps.
- batched streaming (batch 64, host-downscaled frames shipped as planar
  I420/YUV420 — the format cameras natively emit; 1.5 bytes/px vs 3, and the
  bench verifies predictions match the RGB path exactly): images/sec/chip —
  the HEADLINE metric. A real deployment buffers frames exactly like this.
- device-resident batched forward: the chip's raw pipeline capacity with
  input transfer excluded. Measured by the SLOPE of an on-chip lax.scan of
  N forwards between N=4 and N=36 (one dispatch + one result fetch,
  amortised): every per-step synchronisation through this environment's
  network relay costs a ~30 ms RTT, so a step-at-a-time loop measures the
  relay, not the chip (round-1 bug: 2035 "img/s" was pure RTT).
- batch-1 latency decomposition: host downscale / H2D / on-chip compute /
  relay RTT, plus a double-buffered batch-1 mode (depth 2) — reported even
  though result fetches serialise on the relay, so it does not help here.

Baseline: the reference-equivalent torch-CPU pipeline (PIL transform +
torchvision-architecture ResNet50 truncation + heads), batch 1 as the
reference runs it, measured in-process for a machine-fair ratio.

Prints ONE JSON line with the headline value.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

FRAME_H, FRAME_W = 480, 640
BATCH = 64
BATCH_LARGE = 256  # multi-stream serving batch (e.g. 8 cameras x 32 frames)
WARMUP = 5
ITERS_B1 = 50
ITERS_BATCH = 20
CPU_SECONDS_CAP = 60.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _variables():
    import jax

    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        classifier_init,
        truncated_moco_init,
    )

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return {
        "moco": truncated_moco_init(k1, 8, dim=256),
        "classifier": classifier_init(k2, 256, 4),
    }


def bench_tpu() -> dict:
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        combined_apply,
    )
    from heuristique_style_transfer_code_tpu.tasks.camera import (
        downscale_frame,
        make_camera_infer_fn,
        make_camera_infer_fn_yuv,
        rgb_to_yuv420,
    )

    variables = _variables()

    def forward_eval(v, images):
        logits, _ = combined_apply(v["moco"], v["classifier"], images, 8)
        return logits

    infer1 = make_camera_infer_fn(
        forward_eval, compute_dtype=jnp.bfloat16, host_downscale=True
    )
    inferN = make_camera_infer_fn(
        forward_eval, compute_dtype=jnp.bfloat16, batch=BATCH, host_downscale=True
    )
    inferY = make_camera_infer_fn_yuv(
        forward_eval, 224, compute_dtype=jnp.bfloat16, batch=BATCH
    )

    rng = np.random.RandomState(0)
    raw_frames = [
        rng.randint(0, 256, (FRAME_H, FRAME_W, 3), dtype=np.uint8) for _ in range(16)
    ]

    # ---- batch-1 camera loop: cv2 downscale + H2D + fused device pipeline
    log(f"[tpu] compiling batch-1 on {jax.devices()[0]} ...")
    t0 = time.perf_counter()
    np.asarray(infer1(variables, jnp.asarray(downscale_frame(raw_frames[0]))))
    log(f"[tpu] batch-1 compile: {time.perf_counter() - t0:.1f}s")
    for i in range(WARMUP):
        np.asarray(infer1(variables, jnp.asarray(downscale_frame(raw_frames[i % 16]))))
    times = []
    for i in range(ITERS_B1):
        f = raw_frames[i % 16]
        t0 = time.perf_counter()
        probs = np.asarray(infer1(variables, jnp.asarray(downscale_frame(f))))
        times.append(time.perf_counter() - t0)
    b1 = np.asarray(times)

    # ---- batched streaming: ring of 3 batches of DISTINCT random frames —
    # repeated/identical batches would be compressible by the transport and
    # inflate the measured throughput (see CLAUDE.md relay notes)
    log("[tpu] compiling batch-%d ..." % BATCH)
    batches = [
        np.stack([
            downscale_frame(
                rng.randint(0, 256, (FRAME_H, FRAME_W, 3), dtype=np.uint8)
            )
            for _ in range(BATCH)
        ])
        for _ in range(3)
    ]
    t0 = time.perf_counter()
    np.asarray(inferN(variables, jnp.asarray(batches[0])))
    log(f"[tpu] batch compile: {time.perf_counter() - t0:.1f}s")
    for i in range(WARMUP):
        np.asarray(inferN(variables, jnp.asarray(batches[i % 3])))

    # pipelined streaming: async H2D (device_put) + 3 batches in flight so
    # transfer overlaps compute — exactly how a buffered camera feed runs
    def pipelined(infer, data, iters, depth=3):
        in_flight = []
        t0 = time.perf_counter()
        for i in range(iters):
            x = jax.device_put(data[i % 3])
            in_flight.append(infer(variables, x))
            if len(in_flight) >= depth:
                np.asarray(in_flight.pop(0))
        for f in in_flight:
            np.asarray(f)
        return time.perf_counter() - t0

    # relay weather is ~2x run-to-run (PERF.md r4 rehearsals 387.8-491.0
    # on an unchanged path): every SCORED streaming number is the median
    # of STREAM_REPS timed passes within this one run, spread reported
    STREAM_REPS = 3

    def stream_fps(infer, data, iters, batch, depth=3):
        fps = sorted(
            iters * batch / pipelined(infer, data, iters, depth=depth)
            for _ in range(STREAM_REPS)
        )
        return fps[len(fps) // 2], fps[0], fps[-1]

    rgb_fps, rgb_min, rgb_max = stream_fps(inferN, batches, ITERS_BATCH, BATCH)

    # camera-native YUV420 transfer: half the bytes per frame; verify the
    # predictions are identical to the RGB path before trusting the number
    yuv_batches = [np.stack([rgb_to_yuv420(f) for f in b]) for b in batches]
    yuv_match_b64, max_prob_diff = True, 0.0
    for rb, yb in zip(batches, yuv_batches):
        p_rgb = np.asarray(inferN(variables, jnp.asarray(rb)))
        p_yuv = np.asarray(inferY(variables, jnp.asarray(yb)))
        yuv_match_b64 &= bool((p_rgb.argmax(1) == p_yuv.argmax(1)).all())
        max_prob_diff = max(max_prob_diff, float(np.abs(p_rgb - p_yuv).max()))
    for i in range(WARMUP):
        np.asarray(inferY(variables, jnp.asarray(yuv_batches[i % 3])))
    yuv_fps, yuv_min, yuv_max = stream_fps(
        inferY, yuv_batches, ITERS_BATCH, BATCH
    )
    # on a parity failure the headline falls back to the RGB transport; the
    # transport key below makes that visible (the note text describes the
    # verified-YUV420 pipeline, which would otherwise silently mislead)
    bN_fps = yuv_fps if yuv_match_b64 else rgb_fps
    bN_min, bN_max = (yuv_min, yuv_max) if yuv_match_b64 else (rgb_min, rgb_max)
    b64_transport = "yuv420" if yuv_match_b64 else "rgb (yuv argmax mismatch)"

    # larger streaming batch (multi-stream serving: e.g. 8 cameras x 32
    # frames): per-batch relay fetch overhead amortises over more images —
    # measured ~10-17% above batch 64 in back-to-back runs
    inferY2 = make_camera_infer_fn_yuv(
        forward_eval, 224, compute_dtype=jnp.bfloat16, batch=BATCH_LARGE
    )
    big_rgb = [
        np.stack([
            downscale_frame(
                rng.randint(0, 256, (FRAME_H, FRAME_W, 3), dtype=np.uint8)
            )
            for _ in range(BATCH_LARGE)
        ])
        for _ in range(3)
    ]
    big_yuv = [np.stack([rgb_to_yuv420(f) for f in b]) for b in big_rgb]
    log("[tpu] compiling batch-%d ..." % BATCH_LARGE)
    # RGB parity reference via the ALREADY-compiled batch-64 program in
    # chunks — per-image compute is batch-independent, and a dedicated
    # batch-256 RGB program would cost a whole extra axon remote compile
    # (1.6 s-10 min, CLAUDE.md) just for this one comparison
    p_rgb = np.concatenate([
        np.asarray(inferN(variables, jnp.asarray(big_rgb[0][i: i + BATCH])))
        for i in range(0, BATCH_LARGE, BATCH)
    ])
    p_yuv = np.asarray(inferY2(variables, jnp.asarray(big_yuv[0])))
    yuv_match_b256 = bool((p_rgb.argmax(1) == p_yuv.argmax(1)).all())
    max_prob_diff = max(max_prob_diff, float(np.abs(p_rgb - p_yuv).max()))
    for i in range(3):
        np.asarray(inferY2(variables, jnp.asarray(big_yuv[i % 3])))
    iters_big = max(4, ITERS_BATCH * BATCH // BATCH_LARGE)
    big_fps, big_min, big_max = (
        stream_fps(inferY2, big_yuv, iters_big, BATCH_LARGE, depth=4)
        if yuv_match_b256
        else (0.0, 0.0, 0.0)
    )

    # ---- realistic-video delta transport: the headline stream above is
    # deliberately incompressible (independent random frames — the honest
    # transport-bound number). Real camera video is temporally correlated;
    # transport="yuv420_delta" ships uint8 wraparound deltas that the device
    # reconstructs bit-exactly, and the relay's wire compression moves the
    # low-entropy payload in a fraction of the time (probe: small-delta
    # payloads 2-5x faster through this relay). Stream here: random base
    # scene + per-frame +-2 sensor drift, one continuous recording.
    from heuristique_style_transfer_code_tpu.tasks.camera import (
        yuv420_delta_encode,
    )

    inferYd = make_camera_infer_fn_yuv(
        forward_eval, 224, compute_dtype=jnp.bfloat16, batch=BATCH, delta=True
    )
    drift = rng.randint(0, 256, (FRAME_H, FRAME_W, 3), dtype=np.uint8).astype(np.int16)
    vid_batches = []
    for _ in range(3):
        frames = []
        for _ in range(BATCH):
            drift = np.clip(drift + rng.randint(-2, 3, drift.shape), 0, 255)
            frames.append(downscale_frame(drift.astype(np.uint8)))
        vid_batches.append(np.stack(frames))
    vid_yuv = [np.stack([rgb_to_yuv420(f) for f in b]) for b in vid_batches]
    vid_delta = [yuv420_delta_encode(b) for b in vid_yuv]
    log("[tpu] compiling delta-transport batch-%d ..." % BATCH)
    video_delta_match = True
    video_delta_max_prob_diff = 0.0
    for yb, db in zip(vid_yuv, vid_delta):
        p_y = np.asarray(inferY(variables, jnp.asarray(yb)))
        p_d = np.asarray(inferYd(variables, jnp.asarray(db)))
        video_delta_match &= bool((p_y.argmax(1) == p_d.argmax(1)).all())
        # keep this separate from yuv_max_prob_diff: that key measures
        # rgb-vs-yuv420 fidelity; this one measures delta-vs-plain-yuv420
        video_delta_max_prob_diff = max(
            video_delta_max_prob_diff, float(np.abs(p_y - p_d).max())
        )
    for i in range(WARMUP):
        np.asarray(inferYd(variables, jnp.asarray(vid_delta[i % 3])))
    video_delta_fps = (
        ITERS_BATCH * BATCH / pipelined(inferYd, vid_delta, ITERS_BATCH)
        if video_delta_match
        else 0.0
    )
    for i in range(WARMUP):
        np.asarray(inferY(variables, jnp.asarray(vid_yuv[i % 3])))
    video_yuv_fps = ITERS_BATCH * BATCH / pipelined(inferY, vid_yuv, ITERS_BATCH)
    log(
        f"[tpu] correlated-video stream: plain yuv420 {video_yuv_fps:.1f} "
        f"img/s, delta {video_delta_fps:.1f} img/s "
        f"({video_delta_fps / max(video_yuv_fps, 1e-9):.2f}x), argmax match: "
        f"{video_delta_match}"
    )

    # ---- device-resident capacity (transfer excluded): scan-slope.
    # t(N) = fetch_rtt + N * t_step, so t_step = (t(36) - t(4)) / 32 —
    # immune to the relay RTT that a step-at-a-time loop measures instead.
    from heuristique_style_transfer_code_tpu.ops.resize import normalize_imagenet

    def make_scan(n_steps):
        @jax.jit
        def scan_infer(v, stack3):
            def step(c, i):
                b = jax.lax.dynamic_index_in_dim(stack3, i % 3, axis=0, keepdims=False)
                x = normalize_imagenet(b.astype(jnp.float32) / 255.0)
                x = x.astype(jnp.bfloat16)
                logits = forward_eval(v, x)
                return c, jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            _, out = jax.lax.scan(step, 0, jnp.arange(n_steps, dtype=jnp.int32))
            return out
        return scan_infer

    stack3 = jnp.asarray(np.stack(batches))
    scan_times = {}
    bf16_probs4 = None
    for n in (4, 36):
        fn = make_scan(n)
        out = np.asarray(fn(variables, stack3))  # compile
        if n == 4:
            bf16_probs4 = out
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(variables, stack3))
            ts.append(time.perf_counter() - t0)
        scan_times[n] = float(np.median(ts))
    dev_step = (scan_times[36] - scan_times[4]) / 32
    log(
        f"[tpu] device-resident scan-slope: {dev_step*1e3:.2f} ms/step "
        f"({BATCH*4.1e9/dev_step/1e12:.1f} TFLOP/s effective)"
    )

    # ---- int8 PTQ pipeline (opt-in path): same scan-slope, plus an argmax
    # agreement check vs the bf16 path over the staged batches
    int8_fps, int8_agree = None, None
    try:
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            combined_apply_int8,
            prepare_combined_int8,
        )

        def _norm(b_u8):
            return normalize_imagenet(b_u8.astype(jnp.float32) / 255.0)

        cal = [_norm(jnp.asarray(b)) for b in batches[:2]]
        q_enc = prepare_combined_int8(variables["moco"], 8, cal)

        def make_scan_int8(n_steps):
            @jax.jit
            def f(v, stack3):
                def step(c, i):
                    b = jax.lax.dynamic_index_in_dim(
                        stack3, i % 3, axis=0, keepdims=False
                    )
                    logits, _ = combined_apply_int8(
                        q_enc, v["moco"], v["classifier"], _norm(b)
                    )
                    return c, jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                _, out = jax.lax.scan(step, 0, jnp.arange(n_steps, dtype=jnp.int32))
                return out
            return f

        t_i8 = {}
        i8_probs4 = None
        for n in (4, 36):
            fn = make_scan_int8(n)
            out = np.asarray(fn(variables, stack3))
            if n == 4:
                i8_probs4 = out
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(fn(variables, stack3))
                ts.append(time.perf_counter() - t0)
            t_i8[n] = float(np.median(ts))
        i8_step = (t_i8[36] - t_i8[4]) / 32
        int8_fps = float(BATCH / i8_step)
        int8_agree = bool(
            (bf16_probs4.argmax(-1) == i8_probs4.argmax(-1)).all()
        )
        log(
            f"[tpu] int8 device-resident: {i8_step*1e3:.2f} ms/step "
            f"({int8_fps:.0f} img/s, {int8_fps/ (BATCH/dev_step):.2f}x bf16), "
            f"argmax match: {int8_agree}"
        )
    except Exception as e:
        log(f"[tpu] int8 probe skipped ({e})")

    # ---- batch-1 latency decomposition
    # relay RTT floor: fetch of a fresh tiny computation
    tiny = jnp.zeros((4,), jnp.float32)
    np.asarray(tiny + 1)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(tiny + 1)
        ts.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(ts) * 1e3)

    ts = []
    for i in range(30):
        t0 = time.perf_counter()
        downscale_frame(raw_frames[i % 16])
        ts.append(time.perf_counter() - t0)
    downscale_ms = float(np.median(ts) * 1e3)

    @jax.jit
    def checksum(x):
        return jnp.sum(x, dtype=jnp.int32)

    small = [downscale_frame(f) for f in raw_frames]
    np.asarray(checksum(jax.device_put(small[0])))
    ts = []
    for i in range(15):
        t0 = time.perf_counter()
        np.asarray(checksum(jax.device_put(small[i % 16])))
        ts.append(time.perf_counter() - t0)
    h2d_ms = max(0.0, float(np.median(ts) * 1e3) - rtt_ms)

    # batch-1 on-chip compute via the same scan-slope trick
    def make_scan_b1(n_steps):
        @jax.jit
        def f(v, stack):
            def step(c, i):
                b = jax.lax.dynamic_index_in_dim(stack, i % 8, axis=0, keepdims=False)
                x = normalize_imagenet(b.astype(jnp.float32) / 255.0)[None]
                x = x.astype(jnp.bfloat16)
                logits = forward_eval(v, x)
                return c, jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[0]
            _, out = jax.lax.scan(step, 0, jnp.arange(n_steps, dtype=jnp.int32))
            return out
        return f

    stack_b1 = jnp.asarray(np.stack(small[:8]))
    t_b1 = {}
    for n in (4, 36):
        fn = make_scan_b1(n)
        np.asarray(fn(variables, stack_b1))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(variables, stack_b1))
            ts.append(time.perf_counter() - t0)
        t_b1[n] = float(np.median(ts))
    b1_compute_ms = max(0.0, (t_b1[36] - t_b1[4]) / 32 * 1e3)

    # double-buffered batch-1 (depth 2): launch frame i+1 before fetching i
    in_flight = []
    n_frames = 40
    t0 = time.perf_counter()
    for i in range(n_frames):
        x = jax.device_put(downscale_frame(raw_frames[i % 16]))
        in_flight.append(infer1(variables, x))
        if len(in_flight) >= 2:
            np.asarray(in_flight.pop(0))
    for o in in_flight:
        np.asarray(o)
    b1_pipelined_fps = n_frames / (time.perf_counter() - t0)

    return {
        "b1_p50_ms": float(np.percentile(b1, 50) * 1e3),
        "b1_fps": float(1.0 / b1.mean()),
        "b1_downscale_ms": downscale_ms,
        "b1_h2d_ms": h2d_ms,
        "b1_device_compute_ms": b1_compute_ms,
        "relay_rtt_ms": rtt_ms,
        "b1_pipelined_fps": float(b1_pipelined_fps),
        "batched_fps": float(max(bN_fps, big_fps)),
        "batched_fps_min": float(big_min if big_fps > bN_fps else bN_min),
        "batched_fps_max": float(big_max if big_fps > bN_fps else bN_max),
        "batch_used": BATCH_LARGE if big_fps > bN_fps else BATCH,
        "streaming_fps_b64": float(bN_fps),
        "streaming_fps_b64_min": float(bN_min),
        "streaming_fps_b64_max": float(bN_max),
        "streaming_fps_b64_transport": b64_transport,
        "streaming_fps_b256": float(big_fps),
        "streaming_fps_b256_min": float(big_min),
        "streaming_fps_b256_max": float(big_max),
        "rgb_streaming_fps": float(rgb_fps),
        # the flag reported alongside the headline describes the batch size
        # the headline actually used; per-size flags are reported too
        "yuv_pred_match": yuv_match_b256 if big_fps > bN_fps else yuv_match_b64,
        "yuv_match_b64": yuv_match_b64,
        "yuv_match_b256": yuv_match_b256,
        "yuv_max_prob_diff": float(max_prob_diff),
        "video_yuv_fps": float(video_yuv_fps),
        "video_delta_fps": float(video_delta_fps),
        "video_delta_match": video_delta_match,
        "video_delta_max_prob_diff": float(video_delta_max_prob_diff),
        "device_resident_fps": float(BATCH / dev_step),
        "device_resident_tflops": float(BATCH * 4.1e9 / dev_step / 1e12),
        "device_resident_fps_int8": int8_fps,
        "int8_argmax_matches_bf16": int8_agree,
        "probs_ok": bool(abs(float(probs.sum()) - 1.0) < 1e-2),
    }


def bench_train() -> dict:
    """On-chip training throughput (fwd + bwd + SGD + BN-stat merge +
    on-device augmentation, bf16 activations — the --precision bf16 CLI
    path), measured by scan-slope like the device-resident number."""
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        combined_apply,
    )
    from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
    from heuristique_style_transfer_code_tpu.train.train_loop import (
        make_train_step_body,
    )

    batch, truncate = 128, 8
    variables = _variables()
    optimizer = sgd_momentum(0.01, variables)
    augment = make_augment_fn(
        [(None, None), ("horizontal_flip", "brightness")], crop=224
    )

    def forward_train(v, images):
        # the --precision bf16 policy: activations cast at the boundary
        logits, new_moco = combined_apply(
            v["moco"], v["classifier"], images.astype(jnp.bfloat16),
            truncate, train=True,
        )
        return logits, {"moco": new_moco, "classifier": v["classifier"]}

    # the SAME step body the train CLIs dispatch (train_loop shares it
    # between make_train_step and make_train_step_multi)
    one_step = make_train_step_body(forward_train, optimizer, augment)

    rng = np.random.RandomState(7)
    stack3 = jnp.asarray(rng.randint(0, 256, (3, batch, 256, 256, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.randint(0, 4, (batch,)).astype(np.int32))
    combos = jnp.asarray((np.arange(batch) % 2).astype(np.int32))

    def make_scan(n):
        @jax.jit
        def f(v, o, stack, key):
            def step(carry, i):
                v, o, k = carry
                k, sub = jax.random.split(k)
                b = jax.lax.dynamic_index_in_dim(stack, i % 3, axis=0, keepdims=False)
                v, o, loss = one_step(v, o, b, labels, combos, sub)
                return (v, o, k), loss
            (_, _, _), losses = jax.lax.scan(
                step, (v, o, key), jnp.arange(n, dtype=jnp.int32)
            )
            return losses
        return f

    o0 = optimizer.init(variables)
    times = {}
    for n in (2, 10):
        fn = make_scan(n)
        np.asarray(fn(variables, o0, stack3, jax.random.PRNGKey(1)))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(variables, o0, stack3, jax.random.PRNGKey(1)))
            ts.append(time.perf_counter() - t0)
        times[n] = float(np.median(ts))
    t_step = (times[10] - times[2]) / 8
    return {
        "train_fps": float(batch / t_step),
        "train_step_ms": float(t_step * 1e3),
        "train_batch": batch,
    }


def bench_style_transfer() -> dict:
    """Secondary metric: the namesake Gram-loss pixel-optimisation loop as a
    single compiled lax.while_loop, batched (vs the reference's per-step
    Python loop — measured at ~12x slower on the same chip)."""
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.nn.resnet import resnet50_apply
    from heuristique_style_transfer_code_tpu.ops.gram import gram_matrix_nhwc
    from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
        make_style_transfer_optimizer,
    )

    from heuristique_style_transfer_code_tpu.core.dtypes import BF16_POLICY

    enc = _variables()["moco"]["encoder"]
    enc_bf16 = BF16_POLICY.cast_to_compute(enc)

    def gram_fn_f32(imgs):
        feats, _, _ = resnet50_apply(enc, imgs, truncate=5)
        return [gram_matrix_nhwc(feats)]

    def gram_fn_bf16(imgs):
        feats, _, _ = resnet50_apply(enc_bf16, imgs.astype(jnp.bfloat16), truncate=5)
        return [gram_matrix_nhwc(feats)]

    def slope(gram_fn, b):
        # slope over the iteration count, fetching only the tiny per-image
        # loss (forces the whole while_loop but skips the image D2H through
        # the relay); block_until_ready is not a reliable wait — see PERF.md
        target_img = jax.random.uniform(jax.random.PRNGKey(1), (b, 224, 224, 3))
        targets = [t.astype(jnp.float32) for t in gram_fn(target_img)]
        noise0 = jax.random.normal(jax.random.PRNGKey(2), (b, 224, 224, 3))
        times = {}
        for n_it in (50, 250):
            opt = make_style_transfer_optimizer(gram_fn, 0.01, n_it, threshold=0.0)
            _, _, loss = opt(noise0, targets)
            np.asarray(loss)  # compile + force
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _, _, loss = opt(noise0, targets)
                np.asarray(loss)
                ts.append(time.perf_counter() - t0)
            times[n_it] = float(np.median(ts))
        per_iter = (times[250] - times[50]) / 200
        return float(b / per_iter)

    # b8 f32: round-1/2 continuity point; b128 bf16: the shipped capacity
    # path (bf16 encoder fwd/bwd, f32 pixels/Adam — tasks/style_transfer)
    b8_f32 = slope(gram_fn_f32, 8)
    b128_bf16 = slope(gram_fn_bf16, 128)
    return {
        "img_iters_per_sec": max(b8_f32, b128_bf16),
        "img_iters_per_sec_b8_f32": b8_f32,
        "img_iters_per_sec_b128_bf16": b128_bf16,
    }


def bench_fast_style_forward() -> dict:
    """Fast (feed-forward) style stylize capacity — the r4 serving path
    (classic width-32/5-res net, 224², bf16), scan-slope like the other
    device-resident numbers. Quality context: this one-pass net measures
    equal to the 500-iteration loop on held-out images (PERF.md,
    tools/bench_fast_style_quality.py)."""
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.nn.transformer_net import (
        transformer_net_apply,
        transformer_net_init,
    )

    net = transformer_net_init(jax.random.PRNGKey(0), width=32, n_res=5)
    b = 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        (rng.rand(b, 224, 224, 3).astype(np.float32) - 0.45) / 0.22
    )

    def scanned(q, n):
        def body(c, _):
            y = transformer_net_apply(net, c, compute_dtype=jnp.bfloat16)
            return y, None  # stylised re-enters: resident + distinct

        out, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.sum(out.astype(jnp.float32))  # scalar fetch

    times = {}
    n1, n2 = 8, 72
    for n in (n1, n2):
        run = jax.jit(lambda q, n=n: scanned(q, n))
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(run(x)))
            times.setdefault(n, []).append(time.perf_counter() - t0)
    dt = (np.median(times[n2][1:]) - np.median(times[n1][1:])) / (n2 - n1)
    return {"fwd_img_s": float(b / dt), "batch": b}


def bench_torch_cpu() -> dict:
    """Reference-equivalent CPU pipeline, batch 1 (the reference's camera
    semantics: TruncatedMoCoV3 = children[:-1][:8] + AdaptiveAvgPool + fc)."""
    import os

    import torch
    import torch.nn as nn
    from PIL import Image

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.torch_ref import ResNet50

    torch.manual_seed(0)
    base = ResNet50()
    encoder = nn.Sequential(*list(base.children())[:-1][:8])
    pool = nn.AdaptiveAvgPool2d((1, 1))
    moco_fc = nn.Linear(2048, 256)
    classifier = nn.Linear(256, 4)
    encoder.eval()

    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)
    rng = np.random.RandomState(0)
    frames = [
        rng.randint(0, 256, (FRAME_H, FRAME_W, 3), dtype=np.uint8) for _ in range(4)
    ]

    def one(frame):
        # the ONE geometry definition (core/geometry.py) — torchvision
        # truncates the scaled long side and round()s the crop offsets;
        # hand-rolled round()///2 here deviated at some frame shapes
        from heuristique_style_transfer_code_tpu.core.geometry import (
            center_crop_offsets,
            resize_target,
        )

        img = Image.fromarray(frame)
        w, h = img.size
        th, tw = resize_target(h, w, 256)
        img = img.resize((tw, th), Image.BILINEAR)
        top, left = center_crop_offsets(th, tw, 224)
        img = img.crop((left, top, left + 224, top + 224))
        x = torch.from_numpy(np.asarray(img).copy()).permute(2, 0, 1).float() / 255.0
        x = ((x - mean) / std).unsqueeze(0)
        with torch.no_grad():
            emb = moco_fc(torch.flatten(pool(encoder(x)), 1))
            return torch.softmax(classifier(emb), dim=1).numpy()

    one(frames[0])  # warmup
    times = []
    t_start = time.perf_counter()
    for i in range(ITERS_B1):
        t0 = time.perf_counter()
        one(frames[i % len(frames)])
        times.append(time.perf_counter() - t0)
        if time.perf_counter() - t_start > CPU_SECONDS_CAP:
            break
    times = np.asarray(times)
    return {
        "fps": float(1.0 / times.mean()),
        "p50_ms": float(np.percentile(times, 50) * 1e3),
        "n": len(times),
    }


def main():
    # persistent compile cache: amortises the axon remote-compile latency
    # across bench runs (timing loops always exclude compiles anyway)
    from heuristique_style_transfer_code_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    tpu = bench_tpu()
    log(
        f"[tpu] batch-1: {tpu['b1_fps']:.1f} img/s (p50 {tpu['b1_p50_ms']:.1f} ms; "
        f"downscale {tpu['b1_downscale_ms']:.1f} + H2D {tpu['b1_h2d_ms']:.1f} + "
        f"compute {tpu['b1_device_compute_ms']:.2f} + relay RTT {tpu['relay_rtt_ms']:.1f} ms); "
        f"batched(b{tpu['batch_used']}): {tpu['batched_fps']:.1f} img/s "
        f"(b64 {tpu['streaming_fps_b64']:.1f} / b256 {tpu['streaming_fps_b256']:.1f}); "
        f"device-resident: {tpu['device_resident_fps']:.0f} img/s "
        f"({tpu['device_resident_tflops']:.1f} TFLOP/s)"
    )
    try:
        cpu = bench_torch_cpu()
        log(f"[cpu-baseline] {cpu['fps']:.1f} img/s, p50 {cpu['p50_ms']:.1f} ms ({cpu['n']} frames)")
        baseline_fps = cpu["fps"]
    except Exception as e:
        log(f"[cpu-baseline] unavailable ({e})")
        baseline_fps = None
    try:
        st = bench_style_transfer()
        log(
            f"[tpu] style-transfer loop: {st['img_iters_per_sec']:.0f} "
            f"img-iters/s (b8 f32 {st['img_iters_per_sec_b8_f32']:.0f} / "
            f"b128 bf16 {st['img_iters_per_sec_b128_bf16']:.0f})"
        )
    except Exception as e:
        log(f"[tpu] style-transfer bench skipped ({e})")
        st = {
            "img_iters_per_sec": None,
            "img_iters_per_sec_b8_f32": None,
            "img_iters_per_sec_b128_bf16": None,
        }
    try:
        tr = bench_train()
        log(
            f"[tpu] train (bf16, b{tr['train_batch']}): {tr['train_fps']:.0f} img/s "
            f"({tr['train_step_ms']:.1f} ms/step)"
        )
    except Exception as e:
        log(f"[tpu] train bench skipped ({e})")
        tr = {"train_fps": None, "train_batch": None}
    try:
        fs = bench_fast_style_forward()
        log(
            f"[tpu] fast-style net forward (b{fs['batch']} 224² bf16): "
            f"{fs['fwd_img_s']:.0f} img/s"
        )
    except Exception as e:
        log(f"[tpu] fast-style bench skipped ({e})")
        fs = {"fwd_img_s": None}
    vs = (tpu["batched_fps"] / baseline_fps) if baseline_fps else None
    # Full detail record: goes to stderr and to BENCH_DETAIL.json on disk.
    # The stdout machine line (printed LAST, below) stays compact — the
    # driver tail-captures stdout and a ~2 KB single line gets its HEAD
    # clipped (round-3 artifact was parsed:null for exactly this reason).
    detail = (
            {
                "metric": "camera_mode_images_per_sec_per_chip",
                "value": round(tpu["batched_fps"], 2),
                "value_min": round(tpu["batched_fps_min"], 2),
                "value_max": round(tpu["batched_fps_max"], 2),
                "unit": "images/s",
                "vs_baseline": round(vs, 2) if vs else None,
                "batch1_p50_frame_ms": round(tpu["b1_p50_ms"], 2),
                "batch1_fps": round(tpu["b1_fps"], 2),
                "batch1_downscale_ms": round(tpu["b1_downscale_ms"], 2),
                "batch1_h2d_ms": round(tpu["b1_h2d_ms"], 2),
                "batch1_device_compute_ms": round(tpu["b1_device_compute_ms"], 3),
                "relay_rtt_ms": round(tpu["relay_rtt_ms"], 2),
                "batch1_pipelined_fps": round(tpu["b1_pipelined_fps"], 2),
                "device_resident_fps": round(tpu["device_resident_fps"], 1),
                "device_resident_tflops": round(tpu["device_resident_tflops"], 2),
                "device_resident_fps_int8": (
                    round(tpu["device_resident_fps_int8"], 1)
                    if tpu["device_resident_fps_int8"]
                    else None
                ),
                "int8_argmax_matches_bf16": tpu["int8_argmax_matches_bf16"],
                "rgb_streaming_fps": round(tpu["rgb_streaming_fps"], 1),
                "yuv_argmax_matches_rgb": tpu["yuv_pred_match"],
                "yuv_match_b64": tpu["yuv_match_b64"],
                "yuv_match_b256": tpu["yuv_match_b256"],
                "yuv_max_prob_diff": round(tpu["yuv_max_prob_diff"], 4),
                "style_transfer_img_iters_per_sec": (
                    round(st["img_iters_per_sec"], 1)
                    if st["img_iters_per_sec"]
                    else None
                ),
                "style_transfer_img_iters_b8_f32": (
                    round(st["img_iters_per_sec_b8_f32"], 1)
                    if st.get("img_iters_per_sec_b8_f32")
                    else None
                ),
                "style_transfer_img_iters_b128_bf16": (
                    round(st["img_iters_per_sec_b128_bf16"], 1)
                    if st.get("img_iters_per_sec_b128_bf16")
                    else None
                ),
                "train_fps_bf16": (
                    round(tr["train_fps"], 1) if tr["train_fps"] else None
                ),
                "train_batch": tr["train_batch"],
                "fast_style_fwd_img_s": (
                    round(fs["fwd_img_s"], 1) if fs["fwd_img_s"] else None
                ),
                "batch_size": tpu["batch_used"],
                "streaming_fps_b64": round(tpu["streaming_fps_b64"], 1),
                "streaming_fps_b64_min": round(tpu["streaming_fps_b64_min"], 1),
                "streaming_fps_b64_max": round(tpu["streaming_fps_b64_max"], 1),
                "streaming_fps_b256": round(tpu["streaming_fps_b256"], 1),
                "streaming_fps_b256_min": round(tpu["streaming_fps_b256_min"], 1),
                "streaming_fps_b256_max": round(tpu["streaming_fps_b256_max"], 1),
                "streaming_fps_video_yuv": round(tpu["video_yuv_fps"], 1),
                "streaming_fps_video_delta": round(tpu["video_delta_fps"], 1),
                "video_delta_argmax_matches_yuv": tpu["video_delta_match"],
                "video_delta_max_prob_diff": round(
                    tpu["video_delta_max_prob_diff"], 4
                ),
                "baseline_cpu_fps": round(baseline_fps, 2) if baseline_fps else None,
                "note": "value = end-to-end pipelined streaming (host "
                "downscale, camera-native YUV420 transfer — argmax verified "
                "equal to the RGB path over the whole benchmark stream, max "
                "prob delta reported — async H2D overlapped with compute) "
                "through this environment's network relay; "
                "device_resident_fps is the chip's capacity with transfer "
                "excluded, measured as the slope of an on-chip lax.scan of "
                "N forwards (N=4 vs 36) so the relay's ~30 ms "
                "per-synchronisation RTT (relay_rtt_ms) is amortised out — "
                "the round-1 step-at-a-time number measured that RTT, not "
                "the chip. batch-1 p50 decomposes as downscale + H2D + "
                "device compute + relay RTT (RTT-bound); the double-buffered "
                "batch-1 fps is reported even though relay result fetches "
                "serialise, so depth-2 does not beat the closed loop here. "
                "streaming_fps_video_* measure a temporally-correlated "
                "synthetic recording (random scene + per-frame sensor "
                "drift): video_delta ships uint8 temporal deltas the device "
                "reconstructs exactly (transport='yuv420_delta') — the "
                "payload entropy drop is what real camera feeds give the "
                "compressing relay; the headline stays the incompressible "
                "independent-frame stream",
            }
    )
    log("[detail] " + json.dumps(detail))
    try:
        import os

        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
            "w",
        ) as f:
            json.dump(detail, f, indent=1)
    except OSError as e:
        log(f"[detail] could not write BENCH_DETAIL.json ({e})")
    # Compact machine line, printed last: only the scoring keys plus the
    # short per-mode numbers. Prose lives in PERF.md / BENCH_DETAIL.json.
    # required scoring keys first, then optional context keys — if the line
    # ever nears the 1 KB head-clip limit (the r3 parsed:null failure), the
    # optional tail is dropped key by key and a valid JSON line still prints
    # (a bare assert would vanish under -O and crash after all the work)
    required_keys = ["metric", "value", "unit", "vs_baseline"]
    optional_keys = [
        "value_min",
        "value_max",
        "batch1_p50_frame_ms",
        "device_resident_fps",
        "device_resident_fps_int8",
        "style_transfer_img_iters_per_sec",
        "train_fps_bf16",
        "streaming_fps_b64",
        "streaming_fps_b256",
        "baseline_cpu_fps",
    ]
    keep = list(optional_keys)
    while True:
        line = json.dumps({k: detail.get(k) for k in required_keys + keep})
        if len(line) < 1000 or not keep:
            break
        log(f"[machine-line] {len(line)} bytes — dropping {keep[-1]!r}")
        keep.pop()
    print(line)


if __name__ == "__main__":
    main()
