"""Metrics export surfaces (round 12, verdict r11 #6).

Reference parity: ``core/src/common/mod.rs:19-109`` registers nine
prometheus counters/histograms. The rebuild's in-process registry
gains (a) the prometheus exposition rendering + a stdlib scrape
endpoint, and (b) per-query shuffle/spill capture from the
listener-fed AppStatusStore, wired into the bench record.
"""

from __future__ import annotations

import urllib.request

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bergloom_spark.config import CompactionConfig
from bergloom_spark.lake import Compaction, LakeTable
from bergloom_spark.lake.metrics import (
    MetricsRegistry,
    serve_prometheus,
)
from bergloom_spark.plans.runtime_metrics import (
    StageMetricsCapture,
    measure_stage_metrics,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)


def _compact_once(spark, tmp_path, registry):
    t = LakeTable.create(spark, str(tmp_path / "m"), SCHEMA)
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(100)], SCHEMA
    )
    t.append(df)
    t.append(df)
    return Compaction(
        t,
        CompactionConfig(enable_validate_compaction=True),
        registry=registry,
    ).compact()


class TestPrometheusExport:
    def test_compaction_metrics_render_and_serve(self, spark, tmp_path):
        registry = MetricsRegistry()
        result = _compact_once(spark, tmp_path, registry)
        assert result.stat.rewritten_files_count >= 2
        text = registry.prometheus_text()
        # counters carry the labels and the observed values
        assert "# TYPE compaction_counter counter" in text
        assert 'table_ident=' in text
        assert any(
            line.startswith("compaction_rewritten_files_count")
            and line.endswith(f" {result.stat.rewritten_files_count}")
            for line in text.splitlines()
        ), text
        # histogram renders cumulative buckets + sum/count
        assert "compaction_duration_seconds_bucket" in text
        assert 'le="+Inf"' in text
        count_line = next(
            line for line in text.splitlines()
            if line.startswith("compaction_duration_seconds_count")
        )
        assert count_line.endswith(" 1")
        # stdlib scrape endpoint serves the same text
        server, port = serve_prometheus(registry)
        try:
            body = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=10
            ).read().decode()
            assert body == registry.prometheus_text()
            assert (
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/metrics", timeout=10
                ).status == 200
            )
        finally:
            server.shutdown()

    def test_label_escaping(self):
        registry = MetricsRegistry()
        m = registry.for_table('c"x\\y', "db.t\nz")
        m.compaction_counter = 3
        text = registry.prometheus_text()
        assert 'catalog_name="c\\"x\\\\y"' in text
        assert 'table_ident="db.t\\nz"' in text


class TestStageMetricsCapture:
    def test_shuffle_bytes_attributed_to_window(self, spark):
        # outside-window work must not leak in
        spark.range(100000).groupBy(
            (F.col("id") % 3).alias("k")
        ).count().collect()
        with StageMetricsCapture(spark) as cap:
            spark.range(1000000).groupBy(
                (F.col("id") % 7).alias("k")
            ).count().collect()
        m = cap.metrics
        assert m["shuffle_write_bytes"] > 0
        assert m["shuffle_read_bytes"] > 0
        assert m["n_stages"] >= 2  # map + reduce
        assert m["executor_run_time_ms"] >= 0

    def test_no_shuffle_query_reads_zero(self, spark):
        _, m = measure_stage_metrics(
            spark,
            lambda: spark.range(100000).select(
                (F.col("id") * 2).alias("x")
            ).collect(),
        )
        assert m["shuffle_write_bytes"] == 0
        assert m["shuffle_read_bytes"] == 0
        assert m["n_stages"] >= 1

    def test_compaction_io_visible(self, spark, tmp_path):
        registry = MetricsRegistry()
        _, m = measure_stage_metrics(
            spark, lambda: _compact_once(spark, tmp_path, registry)
        )
        # the rewrite reads and writes real parquet bytes
        assert m["input_bytes"] > 0 or m["output_bytes"] > 0
        assert m["n_stages"] >= 1
