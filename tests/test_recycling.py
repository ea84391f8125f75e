"""Worker-process recycling (tasks/recycling.py): the drain->respawn
handover loses no requests, results are identical across workers, crashes
are replayed, and the serve CLIs' --recycle_after_requests wires it up.

Each RecyclingServiceProxy test spawns real worker processes (fresh
interpreter + jax import each), so the suite keeps worker counts small.
"""
import http.client
import json

import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.tasks.recycling import (
    RecyclingServiceProxy,
    strip_flag,
)
from tests.linear_serving import CROP, rgb_frames

LINEAR_BUILDER = "tests.linear_serving:recycling_builder"
STYLE_BUILDER = "tests.linear_serving:style_recycling_builder"


def test_strip_flag():
    assert strip_flag(["--a", "1", "--recycle_after_requests", "5", "--b"],
                      "--recycle_after_requests") == ["--a", "1", "--b"]
    assert strip_flag(["--recycle_after_requests=5", "--b"],
                      "--recycle_after_requests") == ["--b"]


class TestProxy:
    def test_recycles_with_zero_failures_and_identical_results(self):
        """8 requests through recycle_after=3: every Future resolves (the
        handover queues, never fails), >=2 recycles happen, and a frame
        resubmitted to a LATER worker gets the bit-identical probability
        vector (same program, same weights, fresh process)."""
        proxy = RecyclingServiceProxy(
            LINEAR_BUILDER, [], recycle_after=3
        ).start()
        try:
            frames = rgb_frames(8, seed=3)
            futs = [proxy.submit(f) for f in frames]
            results = [f.result(timeout=300) for f in futs]
            for probs in results:
                np.testing.assert_allclose(np.sum(probs), 1.0, rtol=1e-5)
            stats = proxy.stats()
            assert stats["recycles"] >= 2, stats
            assert stats["worker_crashes"] == 0
            assert stats["images"] == 8
            assert stats["pending"] == 0
            assert proxy.healthy()
            # determinism across workers
            again = proxy.submit(frames[0]).result(timeout=300)
            np.testing.assert_array_equal(again, results[0])
        finally:
            proxy.stop(drain=True)
        with pytest.raises(RuntimeError, match="stopped"):
            proxy.submit(frames[0])

    def test_child_submit_error_propagates_to_future(self):
        """Without a parent-side preprocess, the worker's own submit
        validation comes back as the Future's exception (an application
        RESULT — never retried, never a crash)."""
        proxy = RecyclingServiceProxy(LINEAR_BUILDER, []).start()
        try:
            bad = proxy.submit(np.zeros((CROP, CROP, 3), np.float32))
            with pytest.raises(ValueError, match="uint8"):
                bad.result(timeout=300)
            good = proxy.submit(rgb_frames(1)[0]).result(timeout=300)
            np.testing.assert_allclose(np.sum(good), 1.0, rtol=1e-5)
            stats = proxy.stats()
            assert stats["worker_crashes"] == 0
        finally:
            proxy.stop(drain=True)

    def test_crash_replay(self):
        """Requests in flight when the worker process DIES are replayed on
        the respawned worker: the client Futures still resolve."""
        # a long flush deadline holds the batch open so the kill lands
        # while the requests are still in the worker
        proxy = RecyclingServiceProxy(LINEAR_BUILDER, ["3000"]).start()
        try:
            frames = rgb_frames(2, seed=7)
            futs = [proxy.submit(f) for f in frames]
            proxy._proc.kill()  # simulate an OOM-killed / crashed worker
            results = [f.result(timeout=300) for f in futs]
            for probs in results:
                np.testing.assert_allclose(np.sum(probs), 1.0, rtol=1e-5)
            stats = proxy.stats()
            assert stats["worker_crashes"] == 1
            assert stats["pending"] == 0
        finally:
            proxy.stop(drain=True)

    def test_style_flavour_stats_and_parent_side_validation(self):
        """The style service behind the proxy: jobs-keyed stats stay
        complete from request zero, the serve_style preprocess validates
        style picks parent-side (synchronous ValueError), and the identity
        job round-trips pixels bit-exactly across a recycle."""
        from heuristique_style_transfer_code_tpu.cli.serve_style import (
            _recycle_preprocess,
        )

        proxy = RecyclingServiceProxy(
            STYLE_BUILDER, [], recycle_after=2,
            preprocess_factory=_recycle_preprocess,
        ).start()
        try:
            # stats carry every /metrics key before any batch ran
            s0 = proxy.stats()
            for key in ("jobs", "batches", "mean_batch_occupancy",
                        "mean_iterations", "jobs_per_sec", "batch_size_hist",
                        "latency_p50_ms", "latency_p95_ms"):
                assert key in s0, key
            with pytest.raises(ValueError, match="unknown style"):
                proxy.submit(rgb_frames(1)[0], style="nope")
            frames = rgb_frames(5, seed=11)
            futs = [proxy.submit(f, style="duo") for f in frames]
            for f, frame in zip(futs, frames):
                res = f.result(timeout=300)
                np.testing.assert_array_equal(res.image, frame)
                assert res.iterations == 1
            stats = proxy.stats()
            assert stats["recycles"] >= 1, stats
            assert stats["jobs"] == 5
        finally:
            proxy.stop(drain=True)


class TestServeCliRecycling:
    def test_round_trip_with_recycles(self, f1_checkpoint):
        """The serve CLI's --recycle_after_requests end to end: HTTP
        predictions keep answering 200 across worker respawns, /stats shows
        the recycles, /healthz stays ok."""
        from heuristique_style_transfer_code_tpu.cli.serve import (
            build_parser,
            start_recycling,
        )

        cfg, ckpt = f1_checkpoint
        argv = [
            "--family", "truncated_resnet50", "--config_path", cfg,
            "--model_path", ckpt, "--port", "0", "--batch_size", "2",
            "--max_delay_ms", "5", "--request_timeout", "600",
            "--recycle_after_requests", "3",
        ]
        args = build_parser().parse_args(argv)
        srv, proxy = start_recycling(args, argv)
        try:
            host, port = srv.server_address
            frame = np.random.RandomState(2).randint(
                0, 256, (224, 224, 3), dtype=np.uint8
            )
            outs = []
            for _ in range(7):
                conn = http.client.HTTPConnection(host, port, timeout=600)
                conn.request(
                    "POST", "/predict", body=frame.tobytes(),
                    headers={"X-Raw-Shape": "224,224,3"},
                )
                r = conn.getresponse()
                assert r.status == 200
                outs.append(json.loads(r.read()))
                conn.close()
            # identical frame -> identical answer from every worker
            for out in outs[1:]:
                assert out["probs"] == outs[0]["probs"]
            conn = http.client.HTTPConnection(host, port, timeout=60)
            conn.request("GET", "/stats")
            stats = json.loads(conn.getresponse().read())
            assert stats["recycles"] >= 2, stats
            assert stats["images"] == 7
            conn.request("GET", "/healthz")
            assert conn.getresponse().status == 200
            conn.close()
        finally:
            srv.shutdown()
            proxy.stop(drain=True)


class TestWindowKeepsProxyResponsive:
    def test_stats_responsive_while_worker_saturated(self):
        """The max_in_worker window: with more submissions than the window
        and a SLOW device, stats()/health() must answer immediately
        (regression for the lock convoy observed on the relay soak — an
        unbounded forward path filled the worker's inner queue, the pipe
        backed up, and conn.send blocked holding the proxy lock)."""
        import time

        proxy = RecyclingServiceProxy(
            "tests.linear_serving:slow_recycling_builder", ["0.05"],
            max_in_worker=8, max_pending=512,
        ).start()
        try:
            futs = [proxy.submit(f) for f in rgb_frames(64, seed=5)]
            t0 = time.perf_counter()
            stats = proxy.stats()
            health = proxy.health()
            dt = time.perf_counter() - t0
            assert dt < 1.0, f"stats/health blocked {dt:.1f}s"
            assert health[0]
            assert stats["pending"] > 0
            for f in futs:
                np.testing.assert_allclose(
                    np.sum(f.result(timeout=300)), 1.0, rtol=1e-5
                )
        finally:
            proxy.stop(drain=True)


class TestServeStyleCliRecycling:
    def test_net_round_trip_with_recycle(self, tmp_path):
        """serve_style --net with --recycle_after_requests: stylised PNGs
        keep coming across a worker respawn; /stats carries the style keys
        plus the recycle counters."""
        import http.client
        import io

        import jax

        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            save_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.cli.serve_style import (
            build_parser,
            start_recycling,
        )
        from heuristique_style_transfer_code_tpu.nn.transformer_net import (
            transformer_net_init,
        )

        net_path = str(tmp_path / "style_net.npz")
        save_pytree_npz(
            transformer_net_init(jax.random.PRNGKey(0), width=4, n_res=1),
            net_path,
        )
        with open(str(tmp_path / "style_net_hyperparameters.json"), "w") as f:
            json.dump({"crop": 32, "style_image": "warm.png"}, f)

        argv = [
            "--net", net_path, "--port", "0", "--batch_size", "2",
            "--max_delay_ms", "5", "--request_timeout", "600",
            "--recycle_after_requests", "2",
        ]
        args = build_parser().parse_args(argv)
        srv, proxy = start_recycling(args, argv)
        try:
            import threading

            threading.Thread(target=srv.serve_forever, daemon=True).start()
            host, port = srv.server_address[:2]
            img = rgb_frames(1, seed=9)[0]
            for i in range(5):
                conn = http.client.HTTPConnection(host, port, timeout=600)
                conn.request(
                    "POST", "/style", body=img.tobytes(),
                    headers={"X-Raw-Shape": f"{CROP},{CROP},3"},
                )
                r = conn.getresponse()
                assert r.status == 200, r.read()
                png = r.read()
                conn.close()
                from PIL import Image

                out = Image.open(io.BytesIO(png))
                assert out.size == (32, 32)
            conn = http.client.HTTPConnection(host, port, timeout=60)
            conn.request("GET", "/stats")
            stats = json.loads(conn.getresponse().read())
            conn.close()
            assert stats["recycles"] >= 1, stats
            assert stats["jobs"] == 5
            assert "mean_iterations" in stats
        finally:
            srv.shutdown()
            proxy.stop(drain=True)


class TestConsecutiveCrashCap:
    def test_poison_backlog_fails_fast_and_reports_unhealthy(self):
        """A request that reliably kills every worker must not be replayed
        forever: after max_consecutive_crashes the outstanding Futures fail
        with the reason, /healthz-style health() is False, and new
        submissions are rejected."""
        proxy = RecyclingServiceProxy(
            "tests.linear_serving:poison_recycling_builder", [],
            max_consecutive_crashes=2,
        ).start()
        try:
            fut = proxy.submit(rgb_frames(1)[0])
            with pytest.raises(RuntimeError, match="2 times in a row"):
                fut.result(timeout=300)
            ok, reason = proxy.health()
            assert not ok and "giving up" in reason
            stats = proxy.stats()
            assert stats["worker_crashes"] == 2
            with pytest.raises(RuntimeError, match="giving up"):
                proxy.submit(rgb_frames(1)[0])
        finally:
            proxy.stop(drain=False)


def test_balanced_style_indices_remainder_unbiased():
    """When the batch does not divide the gallery, the ceil-count slots
    must rotate over rng-chosen styles — not always styles 0..rem-1
    (which would systematically under-train the last styles)."""
    from heuristique_style_transfer_code_tpu.tasks.fast_style import (
        balanced_style_indices,
    )

    rng = np.random.RandomState(0)
    totals = np.zeros(3, np.int64)
    for _ in range(600):
        idx = balanced_style_indices(8, 3, rng)
        counts = np.bincount(idx, minlength=3)
        assert sorted(counts) == [2, 3, 3]  # still per-batch balanced
        totals += counts
    # 1600 expected per style; the old truncated-tile bias gave style 2
    # a hard 1200 vs 1800 — any style drifting >5% is the regression
    assert totals.max() / totals.min() < 1.05, totals
