"""In-process compaction metrics.

Mirrors the reference's registry (``core/src/common/mod.rs:19-109``):
nine counters/histograms labeled ``(catalog_name, table_ident)``, with
the same exponential histogram bucket layouts.
"""

from __future__ import annotations

import bisect
from collections import defaultdict
from dataclasses import dataclass, field

# common/mod.rs:42-49 — 1s * 2^k, 20 buckets.
COMPACTION_DURATION_BUCKETS = [1.0 * (2**k) for k in range(20)]
# common/mod.rs:75-83 — 10ms * 10^k, 5 buckets.
COMMIT_DURATION_BUCKETS = [0.01 * (10**k) for k in range(5)]


@dataclass
class Histogram:
    buckets: list[float]
    counts: list[int] = field(default_factory=list)
    total: float = 0.0
    n: int = 0

    def __post_init__(self):
        if not self.counts:
            self.counts = [0] * (len(self.buckets) + 1)

    def observe(self, value: float) -> None:
        self.counts[bisect.bisect_left(self.buckets, value)] += 1
        self.total += value
        self.n += 1


@dataclass
class CompactionMetrics:
    """Per-(catalog, table) metric set (common/mod.rs:19-109)."""

    labels: tuple[str, str]
    compaction_commit_counter: int = 0
    compaction_counter: int = 0
    compaction_error_counter: int = 0
    compaction_commit_failed_counter: int = 0
    compaction_executor_error_counter: int = 0
    compaction_duration: Histogram = field(
        default_factory=lambda: Histogram(COMPACTION_DURATION_BUCKETS)
    )
    compaction_commit_duration: Histogram = field(
        default_factory=lambda: Histogram(COMMIT_DURATION_BUCKETS)
    )
    compaction_rewritten_bytes: int = 0
    compaction_rewritten_files_count: int = 0
    compaction_added_files_count: int = 0
    compaction_added_bytes: int = 0


class MetricsRegistry:
    def __init__(self):
        import threading

        self._metrics: dict[tuple[str, str], CompactionMetrics] = {}
        # registration vs render race: serve_prometheus scrapes from
        # a daemon thread while the driver's compaction loop registers
        # new tables — iterating the live dict would raise
        # "dictionary changed size during iteration" mid-scrape
        # (review r12). The lock guards registration and the snapshot
        # copy only; metric mutation stays lock-free (single-writer).
        self._lock = threading.Lock()

    def _items(self) -> list:
        with self._lock:
            return list(self._metrics.items())

    def for_table(self, catalog: str, table: str) -> CompactionMetrics:
        key = (catalog, table)
        with self._lock:
            if key not in self._metrics:
                self._metrics[key] = CompactionMetrics(labels=key)
            return self._metrics[key]

    def snapshot(self) -> dict[str, dict]:
        out: dict[str, dict] = defaultdict(dict)
        for (catalog, table), m in self._items():
            out[f"{catalog}.{table}"] = {
                "commits": m.compaction_commit_counter,
                "compactions": m.compaction_counter,
                "errors": m.compaction_error_counter,
                "commit_failures": m.compaction_commit_failed_counter,
                "rewritten_files": m.compaction_rewritten_files_count,
                "rewritten_bytes": m.compaction_rewritten_bytes,
                "added_files": m.compaction_added_files_count,
                "added_bytes": m.compaction_added_bytes,
                "duration_s_total": m.compaction_duration.total,
            }
        return dict(out)


    def prometheus_text(self) -> str:
        """Prometheus exposition-format rendering of every metric —
        the export surface the reference registers its counters and
        histograms for (``core/src/common/mod.rs:19-109`` registers
        into a prometheus registry; this is the text a scrape
        endpoint would serve, generated without any HTTP dependency
        so callers can mount it behind whatever server exists —
        ``serve_prometheus`` below ships the stdlib one)."""
        counters = [
            ("compaction_commit_counter", "compaction_commit_counter"),
            ("compaction_counter", "compaction_counter"),
            ("compaction_error_counter", "compaction_error_counter"),
            ("compaction_commit_failed_counter",
             "compaction_commit_failed_counter"),
            ("compaction_executor_error_counter",
             "compaction_executor_error_counter"),
            ("compaction_rewritten_bytes", "compaction_rewritten_bytes"),
            ("compaction_rewritten_files_count",
             "compaction_rewritten_files_count"),
            ("compaction_added_files_count",
             "compaction_added_files_count"),
            ("compaction_added_bytes", "compaction_added_bytes"),
        ]
        hists = [
            ("compaction_duration", "compaction_duration_seconds"),
            ("compaction_commit_duration",
             "compaction_commit_duration_seconds"),
        ]

        def esc(v: str) -> str:
            return (
                v.replace("\\", "\\\\").replace('"', '\\"')
                .replace("\n", "\\n")
            )

        lines: list[str] = []
        for attr, name in counters:
            lines.append(f"# TYPE {name} counter")
            for (catalog, table), m in sorted(self._items()):
                lbl = (
                    f'catalog_name="{esc(catalog)}",'
                    f'table_ident="{esc(table)}"'
                )
                lines.append(f"{name}{{{lbl}}} {getattr(m, attr)}")
        for attr, name in hists:
            lines.append(f"# TYPE {name} histogram")
            for (catalog, table), m in sorted(self._items()):
                h: Histogram = getattr(m, attr)
                lbl = (
                    f'catalog_name="{esc(catalog)}",'
                    f'table_ident="{esc(table)}"'
                )
                cum = 0
                for bound, c in zip(h.buckets, h.counts):
                    cum += c
                    lines.append(
                        f'{name}_bucket{{{lbl},le="{bound}"}} {cum}'
                    )
                lines.append(
                    f'{name}_bucket{{{lbl},le="+Inf"}} {h.n}'
                )
                lines.append(f"{name}_sum{{{lbl}}} {h.total}")
                lines.append(f"{name}_count{{{lbl}}} {h.n}")
        return "\n".join(lines) + "\n"


def serve_prometheus(
    registry: "MetricsRegistry", port: int = 0
) -> tuple:
    """Minimal stdlib scrape endpoint serving
    ``registry.prometheus_text()`` at ``/metrics`` on a daemon
    thread; returns ``(server, bound_port)``. Zero dependencies —
    the export surface the reference wires its registry into, for
    deployments that scrape the driver."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API name)
            if self.path.rstrip("/") not in ("", "/metrics"):
                self.send_response(404)
                self.end_headers()
                return
            body = registry.prometheus_text().encode("utf-8")
            self.send_response(200)
            self.send_header(
                "Content-Type", "text/plain; version=0.0.4"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence per-scrape stderr noise
            pass

    server = HTTPServer(("127.0.0.1", port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]


GLOBAL_REGISTRY = MetricsRegistry()
