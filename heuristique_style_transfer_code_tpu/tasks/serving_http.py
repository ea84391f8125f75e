"""Minimal HTTP front end over BatchingInferenceServer (stdlib only).

POST /predict with an image body (JPEG/PNG — anything PIL decodes; raw
uint8 HxWx3 also accepted via the X-Raw-Shape header) returns JSON
``{"probs": [...], "class": "<name>", "prob": p}``. GET /stats returns the
batcher's counters, GET /healthz returns 200 once the server is up.

The HTTP layer is deliberately thin: each request thread decodes its own
image (GIL-free on the native JPEG path) and blocks on the Future from
``BatchingInferenceServer.submit`` — the batcher packs concurrent requests
into full device batches exactly as it does for camera streams.
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

from .serving import BatchingInferenceServer


def _decode_image(body: bytes, raw_shape: Optional[str], staging: int) -> np.ndarray:
    if raw_shape:
        h, w, c = (int(x) for x in raw_shape.split(","))
        if c != 3 or h <= 0 or w <= 0:
            raise ValueError(f"X-Raw-Shape must be H,W,3 with H,W > 0, got {raw_shape}")
        arr = np.frombuffer(body, dtype=np.uint8)
        if arr.size != h * w * c:
            raise ValueError("X-Raw-Shape does not match body size")
        return arr.reshape(h, w, c)
    # one shared implementation (native JPEG or PIL, identical staged
    # transform) — the same pixels the file loader produces, by construction
    from ..data.loader import decode_image_staged_bytes

    return decode_image_staged_bytes(body, staging)


def make_http_server(
    batcher: BatchingInferenceServer,
    class_names: List[str],
    host: str = "127.0.0.1",
    port: int = 0,
    timeout_s: float = 30.0,
) -> ThreadingHTTPServer:
    """Build (not start) a ThreadingHTTPServer bound to (host, port).
    port=0 picks a free port (read it back from ``server.server_address``)."""
    # native decode stages to the batcher's geometry (crop * 256/224, the
    # canonical resize:crop ratio) so both decode branches keep the same
    # content window for any crop
    staging = max(256, round(batcher.crop * 256 / 224))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                ok, reason = batcher.health()
                if ok:
                    self._json(200, {"ok": True})
                else:
                    self._json(503, {"ok": False, "error": reason})
            elif self.path == "/stats":
                self._json(200, batcher.stats())
            elif self.path == "/metrics":
                # Prometheus text exposition of the batcher counters
                s = batcher.stats()
                lines = [
                    "# TYPE hst_images_total counter",
                    f"hst_images_total {s['images']}",
                    "# TYPE hst_batches_total counter",
                    f"hst_batches_total {s['batches']}",
                    "# TYPE hst_batch_occupancy gauge",
                    f"hst_batch_occupancy {s['mean_batch_occupancy']:.6f}",
                    "# TYPE hst_throughput_images_per_second gauge",
                    f"hst_throughput_images_per_second {s['throughput_imgs_per_sec']:.3f}",
                    "# TYPE hst_latency_ms summary",
                    f'hst_latency_ms{{quantile="0.5"}} {s["latency_p50_ms"]:.3f}',
                    f'hst_latency_ms{{quantile="0.95"}} {s["latency_p95_ms"]:.3f}',
                    "# TYPE hst_healthy gauge",
                    f"hst_healthy {int(batcher.healthy())}",
                ]
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/predict":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                frame = _decode_image(body, self.headers.get("X-Raw-Shape"), staging)
            except Exception as e:  # malformed request: client error
                self._json(400, {"error": str(e) or repr(e)})
                return
            try:
                fut = batcher.submit(frame)
            except ValueError as e:  # submit() rejected the frame: client error
                self._json(400, {"error": str(e) or repr(e)})
                return
            except Exception as e:  # server stopped / queue fault
                self._json(503, {"error": str(e) or repr(e)})
                return
            try:
                probs = fut.result(timeout=timeout_s)
            except Exception as e:  # dispatch/device/timeout: server fault
                self._json(503, {"error": str(e) or repr(e)})
                return
            idx = int(np.argmax(probs))
            self._json(
                200,
                {
                    "probs": [float(p) for p in probs],
                    "class": class_names[idx] if idx < len(class_names) else str(idx),
                    "prob": float(probs[idx]),
                },
            )

    return ThreadingHTTPServer((host, port), Handler)


def serve_http(
    batcher: BatchingInferenceServer,
    class_names: List[str],
    host: str = "127.0.0.1",
    port: int = 8000,
) -> ThreadingHTTPServer:
    """Start the HTTP server on a daemon thread; returns the server (call
    ``.shutdown()`` to stop)."""
    srv = make_http_server(batcher, class_names, host, port)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
