"""Streaming changelog read (sources/lakestream.py changelog mode).

Replaying the +/- feed in snapshot order must reconstruct the table's
latest state (the Iceberg changelog-scan contract), MERGE history must
surface as delete+insert pairs, and rewrites must emit nothing.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from bergloom_spark.lake import LakeTable
from bergloom_spark.sources.lakestream import LakeStreamDataSource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(LakeStreamDataSource)


def _drain(spark, root, ckpt):
    rows: list = []

    def sink(df, _bid):
        rows.extend(df.collect())

    q = (
        spark.readStream.format("lakestream")
        .option("path", root)
        .option("changelog", "true")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def _replay(changes):
    """Fold +/- rows in snapshot order into the final multiset."""
    state: dict[tuple, int] = {}
    for r in sorted(changes, key=lambda r: r["_commit_snapshot_id"]):
        key = tuple(
            v for k, v in r.asDict().items()
            if k not in ("_change_type", "_commit_snapshot_id")
        )
        if r["_change_type"] == "insert":
            state[key] = state.get(key, 0) + 1
        else:
            state[key] = state.get(key, 0) - 1
            if state[key] == 0:
                del state[key]
    return state


def test_changelog_replays_merge_and_delete_history(spark, tmp_path):
    root = str(tmp_path / "t")
    base = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    t = LakeTable.create(spark, root, base.schema)
    t.append(base.filter(F.col("id") < 60))
    # MERGE: keys 10..19 get v=99 (eq-delete + re-insert), 100..109 new
    upserts = spark.range(10, 20).select(
        "id", F.lit(99).cast("long").alias("v")
    ).union(
        spark.range(100, 110).select("id", F.lit(99).cast("long").alias("v"))
    )
    t.upsert(upserts, ["id"])
    t.delete_where(F.col("id") % 10 == 3)
    t.append(base.filter(F.col("id") >= 60))

    changes = _drain(spark, root, str(tmp_path / "ck"))
    kinds = {r["_change_type"] for r in changes}
    assert kinds == {"insert", "delete"}
    # replayed state == batch read
    replayed = _replay(changes)
    assert all(c == 1 for c in replayed.values())
    batch = {tuple(r) for r in t.read().collect()}
    assert set(replayed) == batch
    # the MERGE produced a delete for each overwritten key 10..19
    merged_deletes = {
        r["id"]
        for r in changes
        if r["_change_type"] == "delete" and r["v"] != 99
        and 10 <= r["id"] < 20
    }
    assert merged_deletes == set(range(10, 20))


def test_changelog_rewrite_emits_nothing_and_resumes(spark, tmp_path):
    from bergloom_spark.config import CompactionConfig
    from bergloom_spark.lake import Compaction

    root = str(tmp_path / "t")
    base = spark.range(50).select("id", (F.col("id") * 2).alias("v"))
    t = LakeTable.create(spark, root, base.schema)
    t.append(base.filter(F.col("id") < 25))
    t.append(base.filter(F.col("id") >= 25))
    ckpt = str(tmp_path / "ck")
    first = _drain(spark, root, ckpt)
    assert len(first) == 50
    assert {r["_change_type"] for r in first} == {"insert"}
    # compaction rewrites every row into new files — no logical change
    Compaction(t, CompactionConfig()).compact()
    t.delete_where(F.col("id") < 5)
    second = _drain(spark, root, ckpt)  # resume from checkpoint
    assert {r["_change_type"] for r in second} == {"delete"}
    assert sorted(r["id"] for r in second) == [0, 1, 2, 3, 4]
    # deleted rows carry their pre-delete column values
    assert all(r["v"] == r["id"] * 2 for r in second)


def test_changelog_second_delete_not_reemitted(spark, tmp_path):
    """A row killed by an earlier snapshot must not be re-emitted when
    a later delete targets overlapping predicates (prior deletes are
    applied before computing the kill set)."""
    root = str(tmp_path / "t")
    base = spark.range(30).select("id", (F.col("id") % 3).alias("v"))
    t = LakeTable.create(spark, root, base.schema)
    t.append(base)
    t.delete_where(F.col("id") < 10)
    t.delete_where(F.col("id") < 20)  # overlaps rows already dead
    changes = _drain(spark, root, str(tmp_path / "ck"))
    deletes = [r for r in changes if r["_change_type"] == "delete"]
    # every live row deleted exactly once
    assert sorted(r["id"] for r in deletes) == list(range(20))
    replayed = _replay(changes)
    assert set(replayed) == {tuple(r) for r in t.read().collect()}


def test_replicate_changelog_roundtrip(spark, tmp_path):
    """Changelog replication: source history (append + merge + delete +
    compaction) applied to an empty replica equals the source; a second
    incremental run replicates only the new commits."""
    from bergloom_spark.streaming.ingest import replicate_changelog

    src_root = str(tmp_path / "src")
    base = spark.range(80).select("id", (F.col("id") % 9).alias("v"))
    src = LakeTable.create(spark, src_root, base.schema)
    src.append(base.filter(F.col("id") < 50))
    src.upsert(
        spark.range(20, 30).select("id", F.lit(77).cast("long").alias("v")),
        ["id"],
    )
    src.delete_where(F.col("id") % 5 == 4)

    dst = LakeTable.create(spark, str(tmp_path / "dst"), base.schema)
    ckpt = str(tmp_path / "ck")
    dst = replicate_changelog(spark, src_root, dst, ckpt, ["id"])
    assert {tuple(r) for r in dst.read().collect()} == {
        tuple(r) for r in src.read().collect()
    }
    # incremental: more source commits, resume from the checkpoint
    from bergloom_spark.config import CompactionConfig
    from bergloom_spark.lake import Compaction

    Compaction(src, CompactionConfig()).compact()
    src.append(base.filter(F.col("id") >= 50))
    src.upsert(
        spark.range(0, 5).select("id", F.lit(88).cast("long").alias("v")),
        ["id"],
    )
    dst = replicate_changelog(spark, src_root, dst, ckpt, ["id"])
    assert {tuple(r) for r in dst.read().collect()} == {
        tuple(r) for r in src.read().collect()
    }
