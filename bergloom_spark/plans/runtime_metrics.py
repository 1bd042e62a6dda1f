"""Per-query runtime metrics from Spark's listener-fed status store.

Verdict r11 #6 asked for "a SparkListener capturing per-query shuffle
bytes/spill into the bench record". A Python ``SparkListener`` needs
the py4j callback server (a second socket, per-event Python hops —
exactly the overhead a bench must not add). Spark already runs that
listener: ``AppStatusListener`` feeds the ``AppStatusStore`` every
stage's aggregated task metrics (the store behind the UI and REST
API). This module reads stage deltas from that store around a block
of work — the same data a custom listener would collect, with zero
per-event overhead and no callback server.

Works in any deploy mode (the store is driver-side) and with the UI
disabled (``spark.ui.enabled=false`` — the store exists regardless;
only the HTTP surface is off).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# StageData getters to aggregate → output key. Every value is a
# monotonic per-stage total, so summing deltas over NEW stage attempts
# is exact.
_FIELDS = {
    "shuffleWriteBytes": "shuffle_write_bytes",
    "shuffleReadBytes": "shuffle_read_bytes",
    "memoryBytesSpilled": "memory_spill_bytes",
    "diskBytesSpilled": "disk_spill_bytes",
    "inputBytes": "input_bytes",
    "outputBytes": "output_bytes",
    "executorRunTime": "executor_run_time_ms",
}


def _stage_rows(spark) -> dict[tuple[int, int], dict]:
    """(stageId, attemptId) → metric dict for every stage the status
    store currently knows (all statuses — a capture window must not
    miss a stage that is still RUNNING when it closes; its totals so
    far are attributed to the window that started it)."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    gw = sc._gateway
    # Spark 4 signature: stageList(statuses, details, withSummaries,
    # unsortedQuantiles, taskStatus) — empty filters mean "all".
    lst = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(gw.jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    out: dict[tuple[int, int], dict] = {}
    it = lst.iterator()
    while it.hasNext():
        s = it.next()
        out[(s.stageId(), s.attemptId())] = {
            alias: int(getattr(s, getter)())
            for getter, alias in _FIELDS.items()
        }
    return out


@dataclass
class StageMetricsCapture:
    """Context manager: stage-metric deltas for the work inside.

    >>> with StageMetricsCapture(spark) as cap:
    ...     df.write.format("noop").mode("overwrite").save()
    >>> cap.metrics["shuffle_write_bytes"]

    Captured per window: shuffle read/write bytes, memory/disk spill,
    input/output bytes, executor run time, stage count. Stages first
    seen inside the window count fully toward it; the driver-side
    store bounds retention (spark.ui.retainedStages, default 1000),
    which is far above any single query's stage count — a bench pass
    reads the delta immediately, inside the retention horizon.
    """

    spark: object
    metrics: dict = field(default_factory=dict)
    _before: dict = field(default_factory=dict)

    def __enter__(self) -> "StageMetricsCapture":
        self._before = _stage_rows(self.spark)
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        after = _stage_rows(self.spark)
        totals = {alias: 0 for alias in _FIELDS.values()}
        n_new = 0
        for key, row in after.items():
            base = self._before.get(key)
            if base == row:
                continue  # untouched pre-existing stage
            n_new += 1
            for alias, v in row.items():
                totals[alias] += v - (base[alias] if base else 0)
        totals["n_stages"] = n_new
        self.metrics = totals


def measure_stage_metrics(spark, fn):
    """Run ``fn()`` under a capture; return ``(result, metrics)``."""
    with StageMetricsCapture(spark) as cap:
        result = fn()
    return result, cap.metrics
