"""LakeTable as a streaming source (sources/lakestream.py)."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from bergloom_spark.lake import LakeTable
from bergloom_spark.sources.lakestream import LakeStreamDataSource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(LakeStreamDataSource)


def _drain(spark, root, ckpt, name, **options):
    # foreachBatch sink: supports checkpoint resume (memory sink does
    # not), which is the whole point of an incremental source test.
    rows: list = []

    def sink(df, _bid):
        rows.extend(df.collect())

    q = (
        spark.readStream.format("lakestream")
        .option("path", root)
        .options(**options)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def test_incremental_append_feed(spark):
    with tempfile.TemporaryDirectory() as root:
        tbl = os.path.join(root, "t")
        base = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
        t = LakeTable.create(spark, tbl, base.schema)
        t.append(base.filter(F.col("id") < 50))
        t.append(base.filter(F.col("id") >= 50))
        ckpt = os.path.join(root, "ckpt")
        out = _drain(spark, tbl, ckpt, "lakestream_t1")
        assert sorted(r.id for r in out) == list(range(100))
        # new append after the drain → ONLY the new rows arrive
        t.append(
            spark.range(100, 120).select(F.col("id"), (F.col("id") * 2).alias("v"))
        )
        out2 = _drain(spark, tbl, ckpt, "lakestream_t2")
        assert sorted(r.id for r in out2) == list(range(100, 120))


def test_non_append_refused_unless_opted_out(spark):
    with tempfile.TemporaryDirectory() as root:
        tbl = os.path.join(root, "t")
        base = spark.range(50).select(F.col("id"), (F.col("id") * 2).alias("v"))
        t = LakeTable.create(spark, tbl, base.schema)
        t.append(base)
        t.delete_where(F.col("id") < 5)
        ckpt1 = os.path.join(root, "c1")
        with pytest.raises(Exception, match="append"):
            _drain(spark, tbl, ckpt1, "lakestream_refuse")
        # appends-only opt-out streams the appended rows, pre-delete
        out = _drain(
            spark, tbl, os.path.join(root, "c2"), "lakestream_skip",
            skipNonAppends="true",
        )
        assert len(out) == 50


def test_compaction_between_batches_is_skippable(spark):
    """After binpack/full compaction the rewritten files must NOT be
    re-delivered under skipNonAppends (they carry no new rows)."""
    from bergloom_spark.config import CompactionConfig
    from bergloom_spark.lake import Compaction

    with tempfile.TemporaryDirectory() as root:
        tbl = os.path.join(root, "t")
        base = spark.range(60).select(F.col("id"), (F.col("id") * 3).alias("v"))
        t = LakeTable.create(spark, tbl, base.schema)
        t.append(base.filter(F.col("id") < 30))
        ckpt = os.path.join(root, "ckpt")
        out = _drain(spark, tbl, ckpt, "lakestream_c1", skipNonAppends="true")
        assert len(out) == 30
        Compaction(t, CompactionConfig()).compact()
        t.append(base.filter(F.col("id") >= 30))
        out2 = _drain(spark, tbl, ckpt, "lakestream_c2", skipNonAppends="true")
        assert sorted(r.id for r in out2) == list(range(30, 60))


def test_partitioned_table_append_feed(spark, tmp_path):
    """Round 5: partitioned tables stream — virtualized partition
    columns come back from the manifest as typed constants."""
    root = str(tmp_path / "t")
    base = spark.range(60).select(
        (F.col("id") % 3).alias("p"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    t = LakeTable.create(spark, root, base.schema, partition_spec=["p"])
    t.append(base.filter(F.col("k") < 40))
    rows = _drain(spark, root, str(tmp_path / "ck"), "p1")
    assert sorted((r["p"], r["k"], r["v"]) for r in rows) == sorted(
        (i % 3, i, i * 2) for i in range(40)
    )
    # incremental batch carries partitions too
    t.append(base.filter(F.col("k") >= 40))
    rows = _drain(spark, root, str(tmp_path / "ck"), "p1")
    assert sorted(r["k"] for r in rows) == list(range(40, 60))
    assert all(r["p"] == r["k"] % 3 for r in rows)


def test_partitioned_table_changelog_replays(spark, tmp_path):
    """Changelog over a partitioned table: inserts, deletes, and a
    dynamic partition overwrite all replay to the table's final
    state, partition values intact."""
    root = str(tmp_path / "t")
    base = spark.range(90).select(
        (F.col("id") % 3).alias("p"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    t = LakeTable.create(spark, root, base.schema, partition_spec=["p"])
    t.append(base)
    t.delete_where(F.col("k") % 7 == 1)
    # replace partition p=2 entirely
    t.overwrite_partitions(
        spark.range(1000, 1010).select(
            F.lit(2).cast("long").alias("p"),
            F.col("id").alias("k"),
            F.lit(0).cast("long").alias("v"),
        )
    )
    changes = _drain(
        spark, root, str(tmp_path / "ck"), "c1", changelog="true"
    )
    state: dict = {}
    for r in sorted(changes, key=lambda r: r["_commit_snapshot_id"]):
        key = (r["p"], r["k"], r["v"])
        if r["_change_type"] == "insert":
            state[key] = state.get(key, 0) + 1
        else:
            state[key] = state.get(key, 0) - 1
            if state[key] == 0:
                del state[key]
    assert set(state) == {tuple(r) for r in t.read().collect()}


def test_schema_evolved_history_streams_with_null_projection(
    spark, tmp_path
):
    """Round 5: files written before an add_columns lack the new
    column — the stream projects nulls for them (the batch reader's
    semantics) instead of failing, and post-evolution appends carry
    real values."""
    from pyspark.sql import types as T

    root = str(tmp_path / "t")
    base = spark.range(20).select(F.col("id").alias("k"))
    t = LakeTable.create(spark, root, base.schema)
    t.append(base.filter(F.col("k") < 10))
    t.add_columns([T.StructField("tag", T.StringType())])
    t.append(
        spark.range(10, 20).select(
            F.col("id").alias("k"), F.lit("new").alias("tag")
        )
    )
    rows = _drain(spark, root, str(tmp_path / "ck"), "ev1")
    got = {r["k"]: r["tag"] for r in rows}
    assert len(got) == 20
    assert all(got[k] is None for k in range(10))
    assert all(got[k] == "new" for k in range(10, 20))


def test_renamed_column_resolves_in_stream(spark, tmp_path):
    """Review r5: files written before a rename store the historical
    name — the stream must read them through the rename history like
    the batch reader does, not project nulls."""
    root = str(tmp_path / "t")
    base = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    t = LakeTable.create(spark, root, base.schema)
    t.append(base.filter(F.col("k") < 5))
    t.rename_column("v", "val")
    t.append(
        spark.range(5, 10).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("val")
        )
    )
    rows = _drain(spark, root, str(tmp_path / "ck"), "rn1")
    got = {r["k"]: r["val"] for r in rows}
    assert got == {i: i * 3 for i in range(10)}
    # and through the batch CDF path (shares the kernel)
    batch = {
        r["k"]: r["val"]
        for r in t.refresh().read_changes().collect()
        if r["_change_type"] == "insert"
    }
    assert batch == got


def test_timestamp_partitioned_table_streams(spark, tmp_path):
    """Review r5: a timestamp partition column maps to a tz-aware
    Arrow type; the Hive directory string must reattach through the
    two-step naive-parse + assume-timezone cast."""
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 12, 30), 1, 10.0),
        (dt.datetime(2024, 1, 1, 12, 30), 2, 20.0),
        (dt.datetime(2024, 6, 2, 8, 0), 3, 30.0),
    ]
    df = spark.createDataFrame(rows, "day timestamp, k long, v double")
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, df.schema, partition_spec=["day"])
    t.append(df)
    out = _drain(spark, root, str(tmp_path / "ck"), "tsp1")
    got = sorted((r["day"], r["k"], r["v"]) for r in out)
    want = sorted(rows)
    assert [(k, v) for _, k, v in got] == [(k, v) for _, k, v in want]
    assert [d for d, _, _ in got] == [d for d, _, _ in want]


def test_starting_snapshot_id_skips_history(spark, tmp_path):
    """Round 5 (Delta startingVersion analog): a fresh stream with
    startingSnapshotId=N begins after snapshot N; the checkpointed
    offset wins on restart; changelog mode honors it too."""
    root = str(tmp_path / "t")
    base = spark.range(30).select("id", (F.col("id") * 2).alias("v"))
    t = LakeTable.create(spark, root, base.schema)
    s1 = t.append(base.filter(F.col("id") < 10))
    t.append(base.filter((F.col("id") >= 10) & (F.col("id") < 20)))

    ckpt = str(tmp_path / "ck")
    rows = _drain(
        spark, root, ckpt, "ss1",
        startingSnapshotId=str(s1.snapshot_id),
    )
    assert sorted(r["id"] for r in rows) == list(range(10, 20))
    # restart: checkpoint wins, only NEW commits flow
    t.append(base.filter(F.col("id") >= 20))
    rows = _drain(
        spark, root, ckpt, "ss1",
        startingSnapshotId=str(s1.snapshot_id),
    )
    assert sorted(r["id"] for r in rows) == list(range(20, 30))
    # changelog mode from the same starting point
    t.delete_where(F.col("id") == 15)
    changes = _drain(
        spark, root, str(tmp_path / "ck2"), "ss2",
        changelog="true", startingSnapshotId=str(s1.snapshot_id),
    )
    ids = sorted(r["id"] for r in changes if r["_change_type"] == "insert")
    assert ids == list(range(10, 30))
    assert [r["id"] for r in changes if r["_change_type"] == "delete"] == [15]


def test_starting_snapshot_id_beyond_tip_fails_fast(spark, tmp_path):
    """Review r5: a typo'd startingSnapshotId past the tip must raise
    at stream start, not silently rewind to the tip later."""
    root = str(tmp_path / "t")
    base = spark.range(5).select("id")
    t = LakeTable.create(spark, root, base.schema)
    t.append(base)
    with pytest.raises(Exception, match="beyond the table"):
        _drain(
            spark, root, str(tmp_path / "ck"), "ssb",
            startingSnapshotId="99",
        )
