"""Health/readiness/metrics HTTP endpoints — HealthServer +
SentinelMetrics exposition parity.

The reference runs a single-daemon-thread HTTP server exposing
``GET /health`` and ``GET /readiness``, both returning 200 with a fixed
JSON body, started before the job and stopped via shutdown hook
(flink-job/.../HealthServer.java:32-97, StreamSentinelJob.java:78-81).
Port validation matches HealthServer.java:46-49.

It also publishes its counters and latency histogram to Prometheus
(flink-job/.../SentinelMetrics.java:25-51; scrape config in
k8s/deployment.yml). The Spark twin serves ``GET /metrics`` in the
Prometheus text exposition format (a public, stable wire format) from
a pluggable snapshot callable — normally
``SentinelMetricsListener.snapshot`` (metrics.py), giving the same
three series: ``events_processed_total``, ``anomalies_detected_total``
and the ``processing_latency_ms`` p50/p95/p99 summary.
"""

from __future__ import annotations

import json
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

#: HealthServer.java fixed response body.
HEALTH_RESPONSE = json.dumps({"status": "UP"}).encode("utf-8")


def render_prometheus(snapshot: dict) -> str:
    """Render a metrics snapshot (the ``SentinelMetricsListener.snapshot``
    shape) as Prometheus text exposition format v0.0.4: counters as
    ``counter`` series, percentile dicts as full ``summary`` families —
    quantile samples plus the ``_count``/``_sum`` samples (from the
    dict's ``count``/``sum`` keys) that client libraries emit and that
    consumers need to compute rates, with ``# HELP`` lines throughout
    (matching the reference's client-library exposition,
    SentinelMetrics.java:25-51)."""
    lines: list[str] = []
    for name, value in snapshot.items():
        help_text = name.removesuffix("_total").replace("_", " ")
        lines.append(f"# HELP {name} {help_text}")
        if isinstance(value, dict):
            lines.append(f"# TYPE {name} summary")
            for pk, pv in value.items():
                if pk.startswith("p") and pk[1:].isdigit():
                    q = float(pk.lstrip("p")) / 100.0
                    lines.append(f'{name}{{quantile="{q}"}} {float(pv)}')
            if "count" in value:
                lines.append(f"{name}_count {int(value['count'])}")
            if "sum" in value:
                lines.append(f"{name}_sum {float(value['sum'])}")
        else:
            lines.append(f"# TYPE {name} counter")
            lines.append(f"{name} {value}")
    return "\n".join(lines) + "\n"


class HealthServer:
    """Daemon-thread HTTP server with /health, /readiness and /metrics."""

    def __init__(
        self, metrics_source: Callable[[], dict] | None = None
    ) -> None:
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._running = False
        self._metrics_source = metrics_source

    def start(self, port: int) -> None:
        if not 1 <= port <= 65_535:
            raise ValueError(
                f"Health port must be in range [1, 65535], got: {port}"
            )
        if self._running:
            return

        metrics_source = self._metrics_source

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (stdlib casing)
                if self.path in ("/health", "/readiness"):
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(HEALTH_RESPONSE)))
                    self.end_headers()
                    self.wfile.write(HEALTH_RESPONSE)
                elif self.path == "/metrics" and metrics_source is not None:
                    body = render_prometheus(metrics_source()).encode("utf-8")
                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
                    )
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
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
