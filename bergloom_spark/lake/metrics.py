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
        self._metrics: dict[tuple[str, str], CompactionMetrics] = {}

    def for_table(self, catalog: str, table: str) -> CompactionMetrics:
        key = (catalog, table)
        if key not in self._metrics:
            self._metrics[key] = CompactionMetrics(labels=key)
        return self._metrics[key]

    def snapshot(self) -> dict[str, dict]:
        out: dict[str, dict] = defaultdict(dict)
        for (catalog, table), m in self._metrics.items():
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


GLOBAL_REGISTRY = MetricsRegistry()
