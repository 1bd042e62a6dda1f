"""applyInPandasWithState operators: state must persist across
micro-batches (maxFilesPerTrigger=1 forces multiple batches)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bergloom_spark.io import load_table
from bergloom_spark.streaming import events as SE
from bergloom_spark.streaming.stateful import (
    streaming_first_seen,
    streaming_running_total,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_state"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def test_first_seen_emits_each_user_once(spark, events_dir):
    stream = SE.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = streaming_first_seen(stream, "user_id")
    SE.run_stream_to_memory(out, "first_seen_out", output_mode="append")
    got = spark.table("first_seen_out")
    users = [r.user_id for r in got.select("user_id").collect()]
    assert len(users) == len(set(users)), "a user was emitted twice"
    n_users = (
        spark.read.schema(SE.EVENTS_SCHEMA).parquet(events_dir)
        .select("user_id").distinct().count()
    )
    assert len(users) == n_users


def test_running_total_accumulates_across_batches(spark, events_dir):
    stream = SE.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = streaming_running_total(stream, "event_type", "value")
    SE.run_stream_to_memory(out, "running_out", output_mode="append")
    got = spark.table("running_out")
    # Multiple micro-batches → most types appear in >1 batch.
    per_type = got.groupBy("event_type").count().collect()
    assert max(r["count"] for r in per_type) > 1
    # Final totals equal the batch aggregate.
    batch = (
        spark.read.schema(SE.EVENTS_SCHEMA).parquet(events_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    finals = {
        r.event_type: (r.total_rows, r.total_value)
        for r in got.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("event_type")
                .orderBy(F.desc("total_rows"))
            ),
        )
        .filter(F.col("rn") == 1)
        .collect()
    }
    for r in batch.collect():
        assert finals[r.event_type][0] == r.n
        assert abs(finals[r.event_type][1] - r.v) < 0.05


# ---------------------------------------------------------------------------
# streaming_per_key_quota (round 2)
# ---------------------------------------------------------------------------
def test_streaming_quota_caps_across_batches(spark):
    import os
    import tempfile
    import uuid

    import pyspark.sql.functions as F

    from bergloom_spark.streaming import events as SE
    from bergloom_spark.streaming.stateful import streaming_per_key_quota

    with tempfile.TemporaryDirectory() as root:
        # key 1: 10 arrivals split across files; key 2: 3 arrivals
        a = spark.createDataFrame(
            [(1, i) for i in range(6)] + [(2, 0)], "user_id: long, v: long"
        )
        b = spark.createDataFrame(
            [(1, i) for i in range(4)] + [(2, 1), (2, 2)],
            "user_id: long, v: long",
        )
        stream_dir = os.path.join(root, "in")
        a.coalesce(1).write.mode("append").parquet(stream_dir)
        b.coalesce(1).write.mode("append").parquet(stream_dir)
        stream = (
            spark.readStream.schema("user_id long, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        name = f"q_{uuid.uuid4().hex[:8]}"
        SE.run_stream_to_memory(
            streaming_per_key_quota(stream, "user_id", quota=7),
            name,
            output_mode="append",
        )
        rows = spark.table(name).collect()
        final = {}
        for r in rows:
            final[r["user_id"]] = max(
                final.get(r["user_id"], 0), r["total_taken"]
            )
        assert final == {1: 7, 2: 3}  # capped at 7; under-quota untouched
        # admissions are monotone and never exceed the quota per batch
        for r in rows:
            assert 0 <= r["batch_taken"] <= 7
            assert r["total_taken"] <= 7
