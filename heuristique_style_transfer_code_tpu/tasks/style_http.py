"""Minimal HTTP front end over StyleTransferService (stdlib only).

POST /style with an image body (JPEG/PNG — anything PIL decodes; raw uint8
HxWx3 via the X-Raw-Shape header) returns the stylised canvas as a PNG with
``X-Iterations`` and ``X-Final-Loss`` response headers. When the service
runs in content+style mode, the ``X-Style`` request header picks a gallery
style by name — or blends several: ``X-Style: vangogh:0.7,monet:0.3``
interpolates the target Grams (GET /styles lists names; default: the
first). GET /stats
returns the service counters, GET /healthz returns 200 while the workers
are alive.

Each request thread decodes its own image and blocks on the Future from
``StyleTransferService.submit`` — concurrent requests co-schedule into one
batched while_loop exactly like the classification batcher packs frames.
Style jobs run for seconds, so ``timeout_s`` defaults much higher than the
classification front end's.
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .serving_http import _decode_image
from .style_service import StyleTransferService


def _parse_style_header(value):
    """``None`` | ``"name"`` | ``"a:0.7,b:0.3"`` -> submit()'s style arg.
    A part without an explicit weight gets 1.0 (``"a,b"`` = equal blend)."""
    if value is None or ("," not in value and ":" not in value):
        return value
    style = {}
    for part in value.split(","):
        name, _, wt = part.partition(":")
        name = name.strip()
        if not name:
            raise ValueError(f"empty style name in X-Style: {value!r}")
        try:
            style[name] = float(wt) if wt.strip() else 1.0
        except ValueError:
            raise ValueError(
                f"bad weight {wt.strip()!r} for style {name!r} in X-Style"
            )
    return style


def make_style_http_server(
    service: StyleTransferService,
    host: str = "127.0.0.1",
    port: int = 0,
    timeout_s: float = 300.0,
) -> ThreadingHTTPServer:
    """Build (not start) a ThreadingHTTPServer bound to (host, port).
    port=0 picks a free port (read it back from ``server.server_address``)."""
    staging = max(256, round(service.crop * 256 / 224))

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
                ok, reason = service.health()
                if ok:
                    self._json(200, {"ok": True})
                else:
                    self._json(503, {"ok": False, "error": reason})
            elif self.path == "/stats":
                self._json(200, service.stats())
            elif self.path == "/styles":
                self._json(200, {"styles": list(service.style_names)})
            elif self.path == "/metrics":
                # Prometheus text exposition (same shape as serving_http's)
                s = service.stats()
                lines = [
                    "# TYPE hst_style_jobs_total counter",
                    f"hst_style_jobs_total {s['jobs']}",
                    "# TYPE hst_style_batches_total counter",
                    f"hst_style_batches_total {s['batches']}",
                    "# TYPE hst_style_batch_occupancy gauge",
                    f"hst_style_batch_occupancy {s['mean_batch_occupancy']:.6f}",
                    "# TYPE hst_style_mean_iterations gauge",
                    f"hst_style_mean_iterations {s['mean_iterations']:.3f}",
                    "# TYPE hst_style_jobs_per_second gauge",
                    f"hst_style_jobs_per_second {s['jobs_per_sec']:.4f}",
                    "# TYPE hst_style_latency_ms summary",
                    f'hst_style_latency_ms{{quantile="0.5"}} {s["latency_p50_ms"]:.3f}',
                    f'hst_style_latency_ms{{quantile="0.95"}} {s["latency_p95_ms"]:.3f}',
                    "# TYPE hst_style_healthy gauge",
                    f"hst_style_healthy {int(service.healthy())}",
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
            if self.path != "/style":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                image = _decode_image(body, self.headers.get("X-Raw-Shape"), staging)
            except Exception as e:
                self._json(400, {"error": str(e) or repr(e)})
                return
            try:
                style = _parse_style_header(self.headers.get("X-Style"))
                fut = service.submit(image, style=style)
            except ValueError as e:
                self._json(400, {"error": str(e) or repr(e)})
                return
            except Exception as e:
                self._json(503, {"error": str(e) or repr(e)})
                return
            try:
                result = fut.result(timeout=timeout_s)
            except Exception as e:
                self._json(503, {"error": str(e) or repr(e)})
                return
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(np.asarray(result.image)).save(buf, format="PNG")
            png = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.send_header("X-Iterations", str(result.iterations))
            self.send_header("X-Final-Loss", f"{result.loss:.8g}")
            self.end_headers()
            self.wfile.write(png)

    return ThreadingHTTPServer((host, port), Handler)


def serve_style_http(
    service: StyleTransferService,
    host: str = "127.0.0.1",
    port: int = 8001,
) -> ThreadingHTTPServer:
    """Start the HTTP server on a daemon thread; returns the server (call
    ``.shutdown()`` to stop)."""
    srv = make_style_http_server(service, host, port)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
