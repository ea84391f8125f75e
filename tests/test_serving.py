"""BatchingInferenceServer: dynamic batching, deadline flush, correctness."""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.tasks.camera import make_camera_infer_fn
from heuristique_style_transfer_code_tpu.tasks.serving import (
    BatchingInferenceServer,
)

from tests.linear_serving import (
    CLASSES,
    CROP,
    linear_forward as _forward,
    linear_variables as _variables,
    rgb_frames as _frames,
)


def _reference_probs(variables, frames):
    infer = make_camera_infer_fn(_forward, batch=len(frames), host_downscale=True)
    return np.asarray(infer(variables, jnp.asarray(np.stack(frames))))


class TestBatching:
    def test_full_batches_from_many_threads(self):
        variables = _variables()
        frames = _frames(32, seed=1)
        ref = _reference_probs(variables, frames)
        server = BatchingInferenceServer(
            _forward, variables, batch_size=8, max_delay_ms=50, crop=CROP
        )
        with server:
            futs = [None] * len(frames)

            def client(lo, hi):
                for i in range(lo, hi):
                    futs[i] = server.submit(frames[i])

            threads = [
                threading.Thread(target=client, args=(k * 8, (k + 1) * 8))
                for k in range(4)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            results = [f.result(timeout=30) for f in futs]
        for i, p in enumerate(results):
            np.testing.assert_allclose(p, ref[i], rtol=1e-5, atol=1e-6)
        st = server.stats()
        assert st["images"] == 32
        assert st["batches"] >= 4
        assert st["latency_p50_ms"] > 0
        assert st["latency_p95_ms"] >= st["latency_p50_ms"]

    def test_deadline_flush_partial_batch(self):
        variables = _variables()
        frames = _frames(3, seed=2)
        ref = _reference_probs(variables, frames)
        server = BatchingInferenceServer(
            _forward, variables, batch_size=16, max_delay_ms=30, crop=CROP
        )
        with server:
            # warm the jit so the deadline measurement isn't compile time
            server.submit(frames[0]).result(timeout=60)
            t0 = time.perf_counter()
            futs = [server.submit(f) for f in frames]
            results = [f.result(timeout=30) for f in futs]
            waited = time.perf_counter() - t0
        for i, p in enumerate(results):
            np.testing.assert_allclose(p, ref[i], rtol=1e-5, atol=1e-6)
        assert waited < 5.0  # flushed by deadline, not stuck waiting for 16
        st = server.stats()
        assert st["images"] == 4
        assert st["mean_batch_occupancy"] < 1.0

    def test_padding_does_not_change_results(self):
        """A frame served in a padded partial batch must equal the same frame
        served in a full batch."""
        variables = _variables()
        frame = _frames(1, seed=3)[0]
        server = BatchingInferenceServer(
            _forward, variables, batch_size=8, max_delay_ms=10, crop=CROP
        )
        with server:
            solo = server.submit(frame).result(timeout=60)  # padded batch of 1
            futs = [server.submit(f) for f in _frames(7, seed=4)] + [
                server.submit(frame)
            ]
            full = futs[-1].result(timeout=30)
        np.testing.assert_allclose(solo, full, rtol=1e-5, atol=1e-6)

    def test_large_frame_downscaled_in_submit(self):
        variables = {
            "w": jnp.zeros((224 * 224 * 3, CLASSES), jnp.float32),
            "b": jnp.zeros((CLASSES,), jnp.float32),
        }
        server = BatchingInferenceServer(
            _forward, variables, batch_size=2, max_delay_ms=10, crop=224
        )
        rng = np.random.RandomState(5)
        with server:
            p = server.submit(
                rng.randint(0, 256, (480, 640, 3), dtype=np.uint8)
            ).result(timeout=120)
        assert p.shape == (CLASSES,)
        np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)

    def test_drain_processes_everything(self):
        variables = _variables()
        server = BatchingInferenceServer(
            _forward, variables, batch_size=4, max_delay_ms=1000, crop=CROP
        ).start()
        futs = [server.submit(f) for f in _frames(6, seed=6)]
        server.stop(drain=True)  # must flush the 2-frame tail despite the delay
        for f in futs:
            assert f.result(timeout=5).shape == (CLASSES,)
        with pytest.raises(RuntimeError):
            server.submit(_frames(1)[0])

    def test_yuv420_transport_matches_direct_yuv_path(self):
        pytest.importorskip("cv2")
        from heuristique_style_transfer_code_tpu.tasks.camera import (
            make_camera_infer_fn_yuv,
            rgb_to_yuv420,
        )

        variables = _variables()
        frames = _frames(6, seed=20)
        server = BatchingInferenceServer(
            _forward, variables, batch_size=4, max_delay_ms=10, crop=CROP,
            transport="yuv420",
        )
        with server:
            futs = [server.submit(f) for f in frames]
            got = [f.result(timeout=60) for f in futs]
        inferY = make_camera_infer_fn_yuv(_forward, CROP, batch=len(frames))
        ref = np.asarray(
            inferY(
                variables,
                jnp.asarray(np.stack([rgb_to_yuv420(f) for f in frames])),
            )
        )
        for i, p in enumerate(got):
            np.testing.assert_allclose(p, ref[i], rtol=1e-5, atol=1e-6)

    def test_backlog_drains_as_full_batches(self):
        """Requests piled up behind a slow first dispatch (e.g. jit compile)
        must go out as full batches even though their deadline has passed —
        not one padded singleton per dispatch."""
        variables = _variables()
        server = BatchingInferenceServer(
            _forward, variables, batch_size=8, max_delay_ms=1, crop=CROP
        )
        with server:
            # fill the queue while the first (compiling) batch is in flight
            futs = [server.submit(f) for f in _frames(25, seed=10)]
            for f in futs:
                f.result(timeout=60)
        st = server.stats()
        assert st["images"] == 25
        # 25 requests: the tail may be padded, but the backlog must pack —
        # anywhere near 25 batches means the drain is broken
        assert st["batches"] <= 6

    def test_cancelled_future_does_not_kill_server(self):
        variables = _variables()
        server = BatchingInferenceServer(
            _forward, variables, batch_size=4, max_delay_ms=5, crop=CROP
        )
        with server:
            doomed = server.submit(_frames(1, seed=11)[0])
            doomed.cancel()  # client gives up immediately
            # the server must survive and keep answering
            ok = [server.submit(f) for f in _frames(8, seed=12)]
            for f in ok:
                assert f.result(timeout=60).shape == (CLASSES,)

    def test_http_front_end(self):
        import http.client
        import io as _io
        import json as _json

        from PIL import Image

        from heuristique_style_transfer_code_tpu.tasks.serving_http import (
            make_http_server,
        )

        variables = _variables()
        rng = np.random.RandomState(13)
        frame = rng.randint(0, 256, (CROP, CROP, 3), dtype=np.uint8)
        with BatchingInferenceServer(
            _forward, variables, batch_size=4, max_delay_ms=5, crop=CROP
        ) as batcher:
            srv = make_http_server(batcher, ["fog", "rain", "snow", "sun"])
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            try:
                host, port = srv.server_address
                conn = http.client.HTTPConnection(host, port, timeout=60)
                conn.request("GET", "/healthz")
                assert conn.getresponse().status == 200
                # raw-shape path
                conn.request(
                    "POST", "/predict", body=frame.tobytes(),
                    headers={"X-Raw-Shape": f"{CROP},{CROP},3"},
                )
                r = conn.getresponse()
                assert r.status == 200
                out = _json.loads(r.read())
                assert out["class"] in ["fog", "rain", "snow", "sun"]
                np.testing.assert_allclose(sum(out["probs"]), 1.0, rtol=1e-4)
                ref = _reference_probs(variables, [frame])[0]
                np.testing.assert_allclose(out["probs"], ref, rtol=1e-4, atol=1e-5)
                # encoded-image path (PNG via PIL): the fallback applies the
                # canonical staged transform (r3: branch parity with native),
                # so expected = staged-decode -> submit-side downscale chain
                from heuristique_style_transfer_code_tpu.tasks.camera import (
                    downscale_frame,
                )

                staging = max(256, round(CROP * 256 / 224))
                big = rng.randint(0, 256, (staging, staging, 3), dtype=np.uint8)
                shorter = max(CROP, round(CROP * 256 / 224))
                expected_frame = downscale_frame(big, crop=CROP, shorter=shorter)
                ref2 = _reference_probs(variables, [expected_frame])[0]
                buf = _io.BytesIO()
                Image.fromarray(big).save(buf, format="PNG")
                conn.request("POST", "/predict", body=buf.getvalue())
                r = conn.getresponse()
                assert r.status == 200
                out2 = _json.loads(r.read())
                np.testing.assert_allclose(out2["probs"], ref2, rtol=1e-4, atol=1e-5)
                conn.request("GET", "/stats")
                stats = _json.loads(conn.getresponse().read())
                assert stats["images"] >= 2
                # Prometheus exposition mirrors the same counters
                conn.request("GET", "/metrics")
                r = conn.getresponse()
                assert r.status == 200
                text = r.read().decode()
                assert f"hst_images_total {stats['images']}" in text
                assert "hst_healthy 1" in text
                assert 'hst_latency_ms{quantile="0.5"}' in text
                # malformed body -> 400, server stays alive
                conn.request("POST", "/predict", body=b"not an image")
                assert conn.getresponse().status == 400
                conn.request("GET", "/healthz")
                assert conn.getresponse().status == 200
            finally:
                srv.shutdown()

    def test_mesh_sharded_serving_matches_single_device(self):
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            make_mesh_2d,
        )

        variables = _variables()
        frames = _frames(16, seed=21)
        ref = _reference_probs(variables, frames)
        mesh = make_mesh_2d(8, model_parallel=1)
        server = BatchingInferenceServer(
            _forward, variables, batch_size=8, max_delay_ms=20, crop=CROP,
            mesh=mesh,
        )
        with server:
            futs = [server.submit(f) for f in frames]
            got = [f.result(timeout=60) for f in futs]
        for i, p in enumerate(got):
            np.testing.assert_allclose(p, ref[i], rtol=1e-5, atol=1e-6)

    def test_http_server_fault_returns_503(self):
        """Server-side dispatch failures must surface as 503 (retryable),
        not 400 — and with a non-empty error body."""
        import http.client
        import json as _json
        import threading as _threading

        from heuristique_style_transfer_code_tpu.tasks.serving_http import (
            make_http_server,
        )

        def bad_forward(variables, images):
            raise ValueError("device exploded")

        with BatchingInferenceServer(
            bad_forward, _variables(), batch_size=2, max_delay_ms=5, crop=CROP
        ) as batcher:
            srv = make_http_server(batcher, ["a", "b", "c", "d"])
            _threading.Thread(target=srv.serve_forever, daemon=True).start()
            try:
                host, port = srv.server_address
                conn = http.client.HTTPConnection(host, port, timeout=60)
                frame = _frames(1, seed=30)[0]
                conn.request(
                    "POST", "/predict", body=frame.tobytes(),
                    headers={"X-Raw-Shape": f"{CROP},{CROP},3"},
                )
                r = conn.getresponse()
                assert r.status == 503
                body = _json.loads(r.read())
                assert body["error"]  # never an empty message
            finally:
                srv.shutdown()

    def test_submit_after_stop_raises_not_hangs(self):
        variables = _variables()
        server = BatchingInferenceServer(
            _forward, variables, batch_size=2, max_delay_ms=5, crop=CROP
        ).start()
        server.submit(_frames(1, seed=31)[0]).result(timeout=60)
        server.stop(drain=True)
        with pytest.raises(RuntimeError):
            server.submit(_frames(1, seed=32)[0])

    def test_malformed_frame_rejected_in_submit(self):
        """A (H,W,1) or wrong-dtype frame must raise to the SUBMITTING caller
        and never reach the dispatcher (where it would poison a whole batch
        and kill the thread) — ADVICE r2 high-severity finding."""
        variables = _variables()
        server = BatchingInferenceServer(
            _forward, variables, batch_size=4, max_delay_ms=10, crop=CROP
        )
        rng = np.random.RandomState(40)
        with server:
            with pytest.raises(ValueError, match="RGB"):
                server.submit(rng.randint(0, 256, (CROP, CROP, 1), dtype=np.uint8))
            with pytest.raises(ValueError, match="RGB"):
                server.submit(rng.randint(0, 256, (CROP, CROP), dtype=np.uint8))
            with pytest.raises(ValueError, match="uint8"):
                server.submit(rng.randn(CROP, CROP, 3).astype(np.float32))
            with pytest.raises(ValueError, match="H, W > 0"):
                server.submit(np.zeros((0, 5, 3), dtype=np.uint8))
            # server still alive and serving afterwards
            good = [server.submit(f) for f in _frames(6, seed=41)]
            for f in good:
                assert f.result(timeout=60).shape == (CLASSES,)
        assert server._dispatcher.is_alive() is False  # clean shutdown

    def test_http_rejects_non_rgb_raw_shape(self):
        """X-Raw-Shape with c != 3 must 400 (not hang every request sharing
        the batch), and /healthz must report thread liveness."""
        import http.client
        import threading as _threading

        from heuristique_style_transfer_code_tpu.tasks.serving_http import (
            make_http_server,
        )

        variables = _variables()
        with BatchingInferenceServer(
            _forward, variables, batch_size=4, max_delay_ms=5, crop=CROP
        ) as batcher:
            srv = make_http_server(batcher, ["a", "b", "c", "d"])
            _threading.Thread(target=srv.serve_forever, daemon=True).start()
            try:
                host, port = srv.server_address
                conn = http.client.HTTPConnection(host, port, timeout=60)
                body = np.zeros((CROP, CROP, 1), dtype=np.uint8).tobytes()
                conn.request(
                    "POST", "/predict", body=body,
                    headers={"X-Raw-Shape": f"{CROP},{CROP},1"},
                )
                assert conn.getresponse().status == 400
                # healthy server -> 200; subsequent good request served
                conn.request("GET", "/healthz")
                assert conn.getresponse().status == 200
                frame = _frames(1, seed=42)[0]
                conn.request(
                    "POST", "/predict", body=frame.tobytes(),
                    headers={"X-Raw-Shape": f"{CROP},{CROP},3"},
                )
                assert conn.getresponse().status == 200
            finally:
                srv.shutdown()
        # stopped batcher -> healthz would be 503
        assert not batcher.healthy()

    def test_pil_fallback_matches_native_staging(self):
        """The HTTP decode path must feed identical pixels whether the native
        JPEG decoder built or not: the PIL fallback applies the same staged
        transform (BILINEAR to `staging` shorter side + center crop) as
        data/loader.load_image_staged — ADVICE r2 low finding."""
        import io as _io

        from PIL import Image

        from heuristique_style_transfer_code_tpu.data.loader import (
            load_image_staged,
        )
        from heuristique_style_transfer_code_tpu.tasks.serving_http import (
            _decode_image,
        )

        rng = np.random.RandomState(43)
        img = rng.randint(0, 256, (300, 420, 3), dtype=np.uint8)
        buf = _io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")  # PNG forces PIL branch
        out = _decode_image(buf.getvalue(), None, staging=64)
        assert out.shape == (64, 64, 3)
        # must equal the canonical loader transform for the same image
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".png") as f:
            Image.fromarray(img).save(f.name, format="PNG")
            ref = load_image_staged(f.name, staging=64)
        np.testing.assert_array_equal(out, ref)

    def test_dispatch_error_propagates(self):
        def bad_forward(variables, images):
            raise ValueError("boom")

        server = BatchingInferenceServer(
            bad_forward, _variables(), batch_size=2, max_delay_ms=5, crop=CROP
        )
        with server:
            fut = server.submit(_frames(1, seed=7)[0])
            with pytest.raises(ValueError, match="boom"):
                fut.result(timeout=30)

    def test_http_garbage_fuzz_never_kills_server(self):
        """Random bodies, bogus raw shapes, wrong paths and malformed
        headers: every response is a clean 4xx/5xx and the server keeps
        answering valid requests afterwards."""
        import http.client
        import threading as _threading

        from heuristique_style_transfer_code_tpu.tasks.serving_http import (
            make_http_server,
        )

        variables = _variables()
        rng = np.random.RandomState(50)
        with BatchingInferenceServer(
            _forward, variables, batch_size=4, max_delay_ms=5, crop=CROP
        ) as batcher:
            srv = make_http_server(batcher, ["a", "b", "c", "d"])
            _threading.Thread(target=srv.serve_forever, daemon=True).start()
            try:
                host, port = srv.server_address
                conn = http.client.HTTPConnection(host, port, timeout=60)
                cases = [
                    ("POST", "/predict", b"", {}),
                    ("POST", "/predict", rng.bytes(64), {}),
                    ("POST", "/predict", rng.bytes(10), {"X-Raw-Shape": "5,5,3"}),
                    ("POST", "/predict", rng.bytes(75), {"X-Raw-Shape": "-5,5,3"}),
                    ("POST", "/predict", rng.bytes(75), {"X-Raw-Shape": "abc"}),
                    ("POST", "/predict", rng.bytes(48), {"X-Raw-Shape": "4,4,3,1"}),
                    ("POST", "/predict", rng.bytes(32), {"X-Raw-Shape": "4,4,2"}),
                    ("POST", "/predict", rng.bytes(0), {"X-Raw-Shape": "0,0,3"}),
                    ("POST", "/nope", b"x", {}),
                    ("GET", "/predict", b"", {}),
                ]
                for method, path, body, headers in cases:
                    conn.request(method, path, body=body, headers=headers)
                    status = conn.getresponse().status
                    assert 400 <= status < 600, (method, path, status)
                # still healthy and serving
                conn.request("GET", "/healthz")
                assert conn.getresponse().status == 200
                frame = _frames(1, seed=51)[0]
                conn.request(
                    "POST", "/predict", body=frame.tobytes(),
                    headers={"X-Raw-Shape": f"{CROP},{CROP},3"},
                )
                assert conn.getresponse().status == 200
            finally:
                srv.shutdown()

    def test_healthz_degrades_on_consecutive_device_failures(self):
        """Threads alive but every batch erroring (e.g. accelerator link
        died) must flip healthy() to False; a later success resets it."""
        state = {"fail": True}

        def flaky_forward(variables, images):
            if state["fail"]:
                raise ValueError("link down")
            flat = images.reshape(images.shape[0], -1)
            return flat @ variables["w"] + variables["b"]

        server = BatchingInferenceServer(
            flaky_forward, _variables(), batch_size=2, max_delay_ms=5, crop=CROP
        )
        with server:
            assert server.healthy()
            for i in range(3):
                with pytest.raises(ValueError):
                    server.submit(_frames(1, seed=60 + i)[0]).result(timeout=30)
            assert not server.healthy()  # 3 consecutive whole-batch failures
            state["fail"] = False
            ok = server.submit(_frames(1, seed=70)[0]).result(timeout=60)
            assert ok.shape == (CLASSES,)
            assert server.healthy()  # success resets the failure streak
