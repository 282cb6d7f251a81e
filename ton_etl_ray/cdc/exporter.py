"""Prometheus-style metrics endpoint for continuous mode (K7 full form).

The reference serves live pipeline gauges from a dedicated exporter
process (reference prometheus_exporter/gauges/performance/
performance.py:142-150 — events/sec, lag, last-block gauges scraped
over HTTP). The engine analogue: ``DirectoryWatcher._emit_metrics``
appends one gauge row per committed epoch to ``<lake>/metrics.jsonl``
(after the commit, so observability never races state), and this tiny
stdlib HTTP server renders the latest row — plus monotonic totals over
all rows — in the Prometheus text exposition format 0.0.4.

Read-only observability: the exporter never touches lake state, holds no
locks, and lags the lake by at most the one row being appended. It runs
in-process (a daemon thread) next to the watcher, or standalone pointed
at any lake directory — same file contract either way, so a scrape
sidecar on another host only needs the shared filesystem.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# (prometheus metric name, metrics.jsonl field) — latest-row gauges
_GAUGES = (
    ("tonray_epoch", "epoch"),
    ("tonray_epoch_events_routed", "events_routed"),
    ("tonray_lake_rows_total", "rows_total"),
    ("tonray_epoch_flush_seconds", "flush_sec"),
    ("tonray_events_per_sec", "events_per_sec"),
    ("tonray_window_events_per_sec", "window_events_per_sec"),
    ("tonray_watermark_lsn", "watermark_lsn"),
    ("tonray_pending_shards", "pending_shards"),
)


# per-path scrape cursor: metrics.jsonl is append-only, so each scrape
# only parses the NEW tail — re-reading the whole file made scrape cost
# grow without bound on a long-running watcher (a week at one epoch/sec
# is ~600k lines parsed per 15 s scrape)
_SCRAPE_CURSOR: dict[str, dict] = {}


def render_metrics(lake_dir: str) -> str:
    """Render ``<lake>/metrics.jsonl`` as Prometheus text format.

    Latest row → gauges; running totals → the monotonic counters
    ``tonray_epochs_committed_total`` / ``tonray_events_routed_total``
    (maintained incrementally from a per-path file cursor; a shrunken
    file — rotation/replacement — resets the cursor). An absent or
    empty file renders zero committed epochs (a scrape before the first
    commit must succeed, not 500)."""
    path = os.path.join(lake_dir, "metrics.jsonl")
    st = _SCRAPE_CURSOR.setdefault(
        path, {"off": 0, "epochs": 0, "events": 0, "last": None})
    try:
        size = os.path.getsize(path)
    except OSError:
        size = 0
    if size < st["off"]:
        st.update(off=0, epochs=0, events=0, last=None)
    if size > st["off"]:
        with open(path) as f:
            f.seek(st["off"])
            for line in f:
                if not line.endswith("\n"):
                    # torn trailing append: do NOT advance the cursor —
                    # the completed line is parsed on the next scrape
                    break
                stripped = line.strip()
                if stripped:
                    try:
                        r = json.loads(stripped)
                    except json.JSONDecodeError:
                        st["off"] += len(line.encode())
                        continue
                    st["epochs"] += 1
                    st["events"] += int(r.get("events_routed", 0))
                    st["last"] = r
                st["off"] += len(line.encode())
    out = []
    out.append("# TYPE tonray_epochs_committed_total counter")
    out.append(f"tonray_epochs_committed_total {st['epochs']}")
    out.append("# TYPE tonray_events_routed_total counter")
    out.append(f"tonray_events_routed_total {st['events']}")
    if st["last"] is not None:
        for name, field in _GAUGES:
            if field in st["last"]:
                out.append(f"# TYPE {name} gauge")
                out.append(f"{name} {st['last'][field]}")
    return "\n".join(out) + "\n"


class MetricsExporter:
    """Serve ``GET /metrics`` for one lake directory.

    ``port=0`` binds an ephemeral port (exposed as ``self.port``) so
    tests and co-located watchers never collide. The server thread is a
    daemon: an abandoned exporter cannot block process exit."""

    def __init__(self, lake_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.lake_dir = lake_dir

        exporter = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib casing)
                if self.path.rstrip("/") not in ("", "/metrics"):
                    self.send_error(404)
                    return
                body = render_metrics(exporter.lake_dir).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet: no per-scrape stderr spam
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.host = host
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="tonray-metrics", daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}/metrics"

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)

    def __enter__(self) -> "MetricsExporter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
