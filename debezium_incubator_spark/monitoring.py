"""M3 — HTTP metrics/health endpoints for a running agent.

Reference: the connector task starts an embedded HTTP server with four
servlets — /ping, /buildinfo, /metrics (Dropwizard registry), /health
(CassandraConnectorTask.java:115-127, network/BuildInfoServlet.java) —
and a JMX reporter over the same registry. JMX is JVM-specific; the
Spark-first analog is the same four endpoints serving JSON from the
engine's checkpoint-derived counters (M1/M2), stdlib-only
(http.server), so a 100-TB agent's driver can be scraped by any
Prometheus-style collector without new dependencies.

Usage::

    server = MetricsServer(orch)     # or a single CDCEngine
    server.start()                   # ephemeral port; server.port
    ...
    server.stop()
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from debezium_incubator_spark import __version__

BUILD_INFO = {
    "version": __version__,
    "service_name": "debezium-incubator-spark",
}


class MetricsServer:
    """Serves the reference's four endpoints from a CDCEngine or a
    MultiTableCDC (anything with ``metrics()``; the orchestrator form
    returns {table: metrics}).

    * ``/ping`` → ``pong`` (PingServlet)
    * ``/buildinfo`` → static build metadata (BuildInfoServlet)
    * ``/metrics`` → the M1/M2 counters JSON (MetricsServlet analog)
    * ``/health`` → 200 + per-table phase when metrics are readable,
      503 when the source raises (HealthCheckServlet analog — the
      reference's check inspects the processor group's liveness; ours
      inspects the checkpoint store, the driver-side liveness truth)
    """

    def __init__(self, source, port: int = 0, host: str = "127.0.0.1"):
        self._source = source
        self._host = host
        self._port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------- data
    def _metrics(self) -> dict:
        m = self._source.metrics()
        return m if isinstance(m, dict) else dict(m)

    def _health(self) -> tuple[int, dict]:
        try:
            m = self._metrics()
        except Exception as e:  # checkpoint store unreadable = unhealthy
            return 503, {"healthy": False, "error": str(e)}
        # orchestrator: {table: {phase: ...}} (empty = no tables yet);
        # single engine: flat {phase: ...} (counters values are dicts,
        # epoch/phase are not — that distinguishes the two shapes)
        if not m:
            phases: dict = {}
        elif all(isinstance(v, dict) for v in m.values()):
            phases = {t: v.get("phase") for t, v in m.items()}
        else:
            phases = {"_table": m.get("phase")}
        return 200, {"healthy": True, "phases": phases}

    # ------------------------------------------------------------- server
    @property
    def port(self) -> int:
        if self._httpd is None:
            raise RuntimeError("server not started")
        return self._httpd.server_address[1]

    def start(self) -> "MetricsServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet: metrics scrapes are noise
                pass

            def do_GET(self):
                if self.path == "/ping":
                    self._send(200, "pong", ctype="text/plain")
                elif self.path == "/buildinfo":
                    self._send(200, json.dumps(BUILD_INFO))
                elif self.path == "/metrics":
                    try:
                        body = json.dumps(outer._metrics())
                        self._send(200, body)
                    except Exception as e:
                        self._send(500, json.dumps({"error": str(e)}))
                elif self.path == "/health":
                    code, body = outer._health()
                    self._send(code, json.dumps(body))
                else:
                    self._send(404, json.dumps({"error": "not found"}))

            def _send(self, code: int, body: str, ctype: str = "application/json"):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self._httpd = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="metrics-http", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
