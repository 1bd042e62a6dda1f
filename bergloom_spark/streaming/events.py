"""Streaming pipelines over the ``events`` table shape.

Batch/stream parity: each builder takes any DataFrame (static or
streaming) with the events schema and applies the SAME transformation,
so the batch run is the oracle for the streaming run — the property the
tests assert. Watermarks bound state for late data; windowed
aggregations use ``F.window``/``F.session_window`` (incremental,
state-store-backed at scale — no full materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # LTZ (watermarks require TIMESTAMP, not NTZ): callers must pin
        # the session timezone to UTC so NTZ-written sources and window
        # boundaries stay wall-clock-stable — see read_events_stream.
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def hourly_rollup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour window per event type: count + value sum."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sliding_user_activity(
    events: DataFrame, window: str = "2 hours", slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window distinct-ish user activity (approx at scale)."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("window_start"), "approx_users", "n_events")
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based), count + duration."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("s"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    Pins the session timezone to UTC: event-time columns must be LTZ
    for watermarks, and only a UTC session keeps NTZ-written parquet
    and tumbling-window boundaries wall-clock-deterministic.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )


def run_stream_to_memory(
    result: DataFrame, query_name: str, output_mode: str = "append"
) -> None:
    """Drive a streaming DataFrame to completion against a memory sink
    (test/driver harness; real deployments use a parquet/lake sink)."""
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming ingest dedup: drop rows whose key was already seen
    within the watermark horizon (``dropDuplicatesWithinWatermark``).

    The watermark bounds state: Spark keeps one entry per key only
    until event time passes ``watermark``, so state is
    O(keys-per-horizon), not O(stream). This is the standard front
    door of a training-data ingest pipeline — exact dedup of re-sent /
    at-least-once-delivered records before anything expensive runs.
    Content-level near-dup (minhash/simhash) happens downstream in
    batch over the deduped lake table.
    """
    key_cols = key_cols or ["event_id"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def attribute_purchases(
    views: DataFrame,
    purchases: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream event-time join: every (view, purchase) pair for
    one user where the purchase lands within ``max_delay`` after the
    view — the attribution primitive.

    Streaming inputs get watermarks on BOTH sides plus the time-range
    join condition, which is exactly what lets Spark bound the join
    state: each side's buffered rows expire once the other side's
    watermark passes ``ts + max_delay``. Batch inputs run the same
    join, so the batch result is the streaming oracle (append-mode
    output equals it once an availableNow source drains).
    """
    if views.isStreaming:
        views = views.withWatermark("ts", watermark)
    if purchases.isStreaming:
        purchases = purchases.withWatermark("ts", watermark)
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    delay = F.col("purchase_ts").cast("long") - F.col("view_ts").cast("long")
    return v.join(p, cond).select(
        F.col("p_user").alias("user_id"),
        "view_id",
        "purchase_id",
        delay.alias("delay_s"),
    )
