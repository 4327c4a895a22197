"""Health/readiness HTTP endpoints — HealthServer parity.

The reference runs a single-daemon-thread HTTP server exposing
``GET /health`` and ``GET /readiness``, both returning 200 with a fixed
JSON body, started before the job and stopped via shutdown hook
(flink-job/.../HealthServer.java:32-97, StreamSentinelJob.java:78-81).
Port validation matches HealthServer.java:46-49.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

#: HealthServer.java fixed response body.
HEALTH_RESPONSE = json.dumps({"status": "UP"}).encode("utf-8")


class HealthServer:
    """Daemon-thread HTTP server with /health and /readiness."""

    def __init__(self) -> None:
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._running = False

    def start(self, port: int) -> None:
        if not 1 <= port <= 65_535:
            raise ValueError(
                f"Health port must be in range [1, 65535], got: {port}"
            )
        if self._running:
            return

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (stdlib casing)
                if self.path in ("/health", "/readiness"):
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(HEALTH_RESPONSE)))
                    self.end_headers()
                    self.wfile.write(HEALTH_RESPONSE)
                else:
                    self.send_response(404)
                    self.end_headers()

            def log_message(self, *args) -> None:  # quiet
                pass

        self._server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="health-server", daemon=True
        )
        self._thread.start()
        self._running = True

    @property
    def port(self) -> int | None:
        return self._server.server_address[1] if self._server else None

    def is_running(self) -> bool:
        return self._running

    def stop(self) -> None:
        if self._server is not None and self._running:
            self._running = False
            self._server.shutdown()
            self._server.server_close()
