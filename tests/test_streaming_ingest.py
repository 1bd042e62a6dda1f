"""Exactly-once streaming ingest into a LakeTable."""

from __future__ import annotations

import os
import tempfile

from bergloom_spark.lake import LakeTable
from bergloom_spark.lake import metadata as md
from bergloom_spark.streaming.events import read_events_stream
from bergloom_spark.streaming.ingest import (
    LAST_BATCH_PROP,
    checkpoint_query_id,
    guard_key_for_checkpoint,
    ingest_stream,
    make_batch_sink,
)


def _events(spark, sf_dir):
    from bergloom_spark.io import load_table

    return load_table(spark, sf_dir, "events")


def test_ingest_drains_stream_in_batches(spark, sf_dir):
    with tempfile.TemporaryDirectory() as root:
        ev = _events(spark, sf_dir)
        stream_dir = os.path.join(root, "in")
        ev.repartition(4).write.parquet(stream_dir)
        stream = read_events_stream(spark, stream_dir, max_files_per_trigger=2)
        t = LakeTable.create(spark, os.path.join(root, "tbl"), stream.schema)
        ckpt = os.path.join(root, "ckpt")
        t = ingest_stream(stream, t, ckpt)
        assert t.read().count() == ev.count()
        # one snapshot per micro-batch, and >1 batch given the trigger cap
        appends = [s for s in t.meta.snapshots if s.operation == "append"]
        assert len(appends) >= 2
        prop = guard_key_for_checkpoint(ckpt)
        assert int(t.meta.properties[prop]) == len(appends) - 1


def test_restart_with_same_checkpoint_adds_nothing(spark, sf_dir):
    with tempfile.TemporaryDirectory() as root:
        ev = _events(spark, sf_dir)
        stream_dir = os.path.join(root, "in")
        ev.repartition(2).write.parquet(stream_dir)
        ckpt = os.path.join(root, "ckpt")
        t = LakeTable.create(
            spark,
            os.path.join(root, "tbl"),
            read_events_stream(spark, stream_dir).schema,
        )
        t = ingest_stream(read_events_stream(spark, stream_dir), t, ckpt)
        n1 = t.read().count()
        v1 = t.meta.version
        # restart: source exhausted + batch-id guard → no new snapshots
        t = ingest_stream(read_events_stream(spark, stream_dir), t, ckpt)
        assert t.read().count() == n1
        assert t.meta.version == v1


def test_replayed_batch_is_dropped(spark, sf_dir):
    with tempfile.TemporaryDirectory() as root:
        ev = _events(spark, sf_dir).limit(100)
        t = LakeTable.create(spark, os.path.join(root, "tbl"), ev.schema)
        sink = make_batch_sink(t)
        sink(ev, 0)
        n = t.refresh().read().count()
        sink(ev, 0)  # exact replay — must be idempotent
        assert t.refresh().read().count() == n
        sink(ev, 1)  # genuinely new batch — appends
        assert t.refresh().read().count() == 2 * n
        assert t.meta.properties[LAST_BATCH_PROP] == "1"


def test_batch_id_commit_is_atomic_with_rows(spark, sf_dir):
    """The batch id lands in the SAME metadata version as the snapshot
    — no window where rows are committed but the guard isn't."""
    with tempfile.TemporaryDirectory() as root:
        ev = _events(spark, sf_dir).limit(50)
        t = LakeTable.create(spark, os.path.join(root, "tbl"), ev.schema)
        make_batch_sink(t)(ev, 7)
        reloaded = md.read_current(t.meta.table_root)
        assert reloaded.properties[LAST_BATCH_PROP] == "7"
        assert reloaded.current_snapshot().operation == "append"


# ---------------------------------------------------------------------------
# streaming CDC apply (round 2)
# ---------------------------------------------------------------------------
def test_cdc_stream_applies_batches_exactly_once(spark):
    import pyspark.sql.functions as F

    from bergloom_spark.streaming.ingest import apply_changes_stream, make_cdc_sink

    with tempfile.TemporaryDirectory() as root:
        base = spark.range(50).select(
            F.col("id"), (F.col("id") * 10).alias("v")
        )
        t = LakeTable.create(spark, os.path.join(root, "tbl"), base.schema)
        t.append(base)
        # changelog stream: two parquet files = at least two batches
        ch1 = spark.range(10).select(
            F.col("id"), F.lit(-1).cast("long").alias("v"),
            F.lit("U").alias("op"), F.lit(1).cast("long").alias("ord"),
        )
        ch2 = spark.range(5).select(
            (F.col("id") + 100).alias("id"), F.lit(7).cast("long").alias("v"),
            F.lit("I").alias("op"), F.lit(2).cast("long").alias("ord"),
        )
        stream_dir = os.path.join(root, "cdc")
        ch1.coalesce(1).write.mode("append").parquet(stream_dir)
        ch2.coalesce(1).write.mode("append").parquet(stream_dir)
        stream = (
            spark.readStream.schema("id long, v long, op string, ord long")
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        t = apply_changes_stream(
            stream, t, os.path.join(root, "ckpt"), ["id"],
            op_col="op", order_col="ord",
        )
        got = {r["id"]: r["v"] for r in t.read().collect()}
        assert len(got) == 55
        assert all(got[i] == -1 for i in range(10))
        assert all(got[i] == i * 10 for i in range(10, 50))
        assert all(got[i + 100] == 7 for i in range(5))
        merges = [s for s in t.meta.snapshots if s.operation == "merge"]
        assert len(merges) >= 2
        # replaying an already-applied batch id is a no-op — the sink
        # must share the STREAM's guard (keyed by checkpoint lineage)
        n_snaps = len(t.meta.snapshots)
        sink = make_cdc_sink(
            t, ["id"], op_col="op", order_col="ord",
            query_id=checkpoint_query_id(os.path.join(root, "ckpt")),
        )
        sink(ch1, 0)
        assert len(t.refresh().meta.snapshots) == n_snaps


def test_guard_is_namespaced_per_query(spark, sf_dir):
    """Two streams (or a restart with a FRESH checkpoint dir, where
    batch ids reset to 0) into the same table must not share the
    exactly-once guard — ADVICE r2: a shared global property silently
    dropped live batches as 'replays'."""
    with tempfile.TemporaryDirectory() as root:
        ev = _events(spark, sf_dir).limit(100)
        t = LakeTable.create(spark, os.path.join(root, "tbl"), ev.schema)
        # writer A commits batches 0..1 under its own guard
        a = make_batch_sink(t, query_id="stream-a")
        a(ev, 0)
        a(ev, 1)
        n = t.refresh().read().count()
        # writer B starts at batch 0 — must NOT be dropped as a replay
        b = make_batch_sink(t, query_id="stream-b")
        b(ev, 0)
        assert t.refresh().read().count() == n + 100
        # but B's own replay IS dropped
        b(ev, 0)
        assert t.refresh().read().count() == n + 100
        # fresh-checkpoint restart shape: ingest_stream derives the id
        # from the checkpoint dir, so a new dir = a new guard
        assert guard_key_for_checkpoint(
            os.path.join(root, "c1")
        ) != guard_key_for_checkpoint(os.path.join(root, "c2"))


def test_ingest_with_inline_maintenance(spark, sf_dir):
    """Streaming appends are the small-file factory; maintain_every=N
    folds the debt inline — the end state has far fewer data files
    than micro-batches, with identical rows."""
    from bergloom_spark.lake import metadata as md
    from bergloom_spark.lake.maintenance import MaintenancePolicy

    with tempfile.TemporaryDirectory() as root:
        ev = _events(spark, sf_dir)
        stream_dir = os.path.join(root, "in")
        ev.repartition(6).write.parquet(stream_dir)
        stream = read_events_stream(spark, stream_dir, max_files_per_trigger=1)
        t = LakeTable.create(spark, os.path.join(root, "tbl"), stream.schema)
        t = ingest_stream(
            stream,
            t,
            os.path.join(root, "ckpt"),
            maintenance=MaintenancePolicy(
                small_file_threshold=1 << 30, min_small_files=3
            ),
            maintain_every=3,
        )
        assert t.read().count() == ev.count()
        appends = [s for s in t.meta.snapshots if s.operation == "append"]
        rewrites = [s for s in t.meta.snapshots if s.operation == "rewrite"]
        assert len(appends) >= 6
        assert rewrites, "inline maintenance never fired"
        n_files = len(t.meta.current_snapshot().files(md.DATA))
        assert n_files < len(appends)


def test_maintain_rollup_tracks_source_through_mixed_history(
    spark, tmp_path
):
    """Continuous aggregate (round 5): after appends, a MERGE, a
    delete, an INSERT OVERWRITE and a compaction, the incrementally
    maintained rollup equals a one-shot aggregation of the source's
    final state; a group whose last row is deleted leaves the rollup."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from bergloom_spark.config import CompactionConfig
    from bergloom_spark.lake import Compaction, LakeTable
    from bergloom_spark.sources.lakestream import LakeStreamDataSource
    from bergloom_spark.streaming.ingest import maintain_rollup

    spark.dataSource.register(LakeStreamDataSource)
    base = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )
    src_root = str(tmp_path / "src")
    src = LakeTable.create(spark, src_root, base.schema)
    src.append(base.filter(F.col("k") < 60))

    agg_schema = T.StructType(
        [
            T.StructField("g", T.LongType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("sum_micro", T.LongType()),
        ]
    )
    agg = LakeTable.create(spark, str(tmp_path / "agg"), agg_schema)
    ckpt = str(tmp_path / "ck")
    agg = maintain_rollup(spark, src_root, agg, ckpt, ["g"], "v")

    # mixed further history, then an incremental run
    src.upsert(
        spark.range(10, 20).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            F.lit(500.0).alias("v"),
        ),
        ["k"],
    )
    src.delete_where(F.col("k") % 9 == 4)
    Compaction(src, CompactionConfig()).compact()
    src.append(base.filter(F.col("k") >= 60))
    agg = maintain_rollup(spark, src_root, agg, ckpt, ["g"], "v")

    got = {
        r["g"]: (r["cnt"], r["sum_micro"])
        for r in agg.read().collect()
    }
    expected = {
        r["g"]: (r["cnt"], r["sum_micro"])
        for r in src.read()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(
                F.round(F.col("v") * 1_000_000.0).cast("long")
            ).cast("long").alias("sum_micro"),
        )
        .collect()
    }
    assert got == expected

    # delete an entire group -> its rollup row must disappear
    src.delete_where(F.col("g") == 3)
    agg = maintain_rollup(spark, src_root, agg, ckpt, ["g"], "v")
    assert 3 not in {r["g"] for r in agg.read().collect()}
    assert {r["g"] for r in agg.read().collect()} == set(range(7)) - {3}


def test_maintain_minhash_index_matches_fresh_signatures(spark, tmp_path):
    """Round 5: the incrementally maintained signature index must be
    byte-equal to freshly computed signatures of the corpus's final
    state — through append, upsert (changed text ⇒ changed sig),
    delete, and a compaction that must emit nothing."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from bergloom_spark.config import CompactionConfig
    from bergloom_spark.lake import Compaction, LakeTable
    from bergloom_spark.operators.dedup import minhash_signature
    from bergloom_spark.sources.lakestream import LakeStreamDataSource
    from bergloom_spark.streaming.ingest import maintain_minhash_index

    spark.dataSource.register(LakeStreamDataSource)
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox number "), F.col("id").cast("string")
        ).alias("text"),
    )
    src_root = str(tmp_path / "src")
    src = LakeTable.create(spark, src_root, docs.schema)
    src.append(docs.filter(F.col("doc_id") < 25))

    idx = LakeTable.create(
        spark,
        str(tmp_path / "idx"),
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("sig", T.ArrayType(T.LongType())),
            ]
        ),
    )
    ckpt = str(tmp_path / "ck")
    idx = maintain_minhash_index(spark, src_root, idx, ckpt)
    snaps_after_first = len(idx.meta.snapshots)

    # evolve: new docs, one doc's text REWRITTEN, some retired, compact
    src.append(docs.filter(F.col("doc_id") >= 25))
    src.upsert(
        spark.createDataFrame(
            [(7, "completely different replacement text here")],
            "doc_id long, text string",
        ),
        ["doc_id"],
    )
    src.delete_where(F.col("doc_id") % 9 == 2)
    Compaction(src, CompactionConfig()).compact()
    idx = maintain_minhash_index(spark, src_root, idx, ckpt)

    got = {
        r["doc_id"]: tuple(r["sig"]) for r in idx.read().collect()
    }
    fresh = {
        r["doc_id"]: tuple(r["sig"])
        for r in src.read()
        .select("doc_id", minhash_signature("text").alias("sig"))
        .collect()
    }
    assert got == fresh
    # a third run over a compaction-only tail commits nothing
    Compaction(src, CompactionConfig()).compact()
    before = len(idx.refresh().meta.snapshots)
    idx = maintain_minhash_index(spark, src_root, idx, ckpt)
    assert len(idx.meta.snapshots) == before
    assert snaps_after_first < before


def test_maintain_rollup_null_group_key(spark, tmp_path):
    """Review r5: NULL is a legitimate group — the rollup must
    accumulate it across batches (null-safe joins + null-safe
    equality deletes), never duplicate its row."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from bergloom_spark.lake import LakeTable
    from bergloom_spark.sources.lakestream import LakeStreamDataSource
    from bergloom_spark.streaming.ingest import maintain_rollup

    spark.dataSource.register(LakeStreamDataSource)
    src_root = str(tmp_path / "src")
    schema = "k long, g long, v double"
    src = LakeTable.create(
        spark, src_root, spark.createDataFrame([], schema).schema
    )
    src.append(
        spark.createDataFrame(
            [(1, None, 1.5), (2, 0, 2.0), (3, None, 3.0)], schema
        )
    )
    agg = LakeTable.create(
        spark,
        str(tmp_path / "agg"),
        T.StructType(
            [
                T.StructField("g", T.LongType()),
                T.StructField("cnt", T.LongType()),
                T.StructField("sum_micro", T.LongType()),
            ]
        ),
    )
    ckpt = str(tmp_path / "ck")
    agg = maintain_rollup(spark, src_root, agg, ckpt, ["g"], "v")
    # second batch touches the null group again
    src.append(
        spark.createDataFrame([(4, None, 10.0), (5, 0, 1.0)], schema)
    )
    agg = maintain_rollup(spark, src_root, agg, ckpt, ["g"], "v")
    rows = agg.read().collect()
    got = {
        (r["g"] if r["g"] is not None else -1): (r["cnt"], r["sum_micro"])
        for r in rows
    }
    assert len(rows) == 2  # exactly one row per group, no duplicates
    assert got == {-1: (3, 14_500_000), 0: (2, 3_000_000)}
    # delete every null-group source row -> rollup row disappears
    src.delete_where(F.col("g").isNull())
    agg = maintain_rollup(spark, src_root, agg, ckpt, ["g"], "v")
    assert {r["g"] for r in agg.read().collect()} == {0}


def test_maintain_rollup_over_partitioned_source(spark, tmp_path):
    """Round 5: the continuous aggregate composes with partitioned
    sources — the changelog reattaches the (virtualized) partition
    column, which here IS the group key."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from bergloom_spark.lake import LakeTable
    from bergloom_spark.sources.lakestream import LakeStreamDataSource
    from bergloom_spark.streaming.ingest import maintain_rollup

    spark.dataSource.register(LakeStreamDataSource)
    base = spark.range(60).select(
        (F.col("id") % 4).alias("p"),
        F.col("id").alias("k"),
        (F.col("id") * 0.5).alias("v"),
    )
    src_root = str(tmp_path / "src")
    src = LakeTable.create(
        spark, src_root, base.schema, partition_spec=["p"]
    )
    src.append(base.filter(F.col("k") < 40))
    agg = LakeTable.create(
        spark,
        str(tmp_path / "agg"),
        T.StructType(
            [
                T.StructField("p", T.LongType()),
                T.StructField("cnt", T.LongType()),
                T.StructField("sum_micro", T.LongType()),
            ]
        ),
    )
    ckpt = str(tmp_path / "ck")
    agg = maintain_rollup(spark, src_root, agg, ckpt, ["p"], "v")
    src.append(base.filter(F.col("k") >= 40))
    src.overwrite_partitions(
        spark.range(3).select(
            F.lit(1).cast("long").alias("p"),
            (F.col("id") + 500).alias("k"),
            F.lit(7.0).alias("v"),
        )
    )
    agg = maintain_rollup(spark, src_root, agg, ckpt, ["p"], "v")
    got = {
        r["p"]: (r["cnt"], r["sum_micro"]) for r in agg.read().collect()
    }
    expected = {
        r["p"]: (r["cnt"], r["sum_micro"])
        for r in src.read()
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(
                F.round(F.col("v") * 1_000_000.0).cast("long")
            ).cast("long").alias("sum_micro"),
        )
        .collect()
    }
    assert got == expected
