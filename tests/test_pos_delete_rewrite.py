"""rewrite_position_deletes: delete-file folding + dangling cleanup."""

from __future__ import annotations

import pyspark.sql.functions as F

from bergloom_spark.config import CompactionConfig
from bergloom_spark.lake import Compaction, LakeTable
from bergloom_spark.lake import metadata as md
from bergloom_spark.lake.compaction import rewrite_position_deletes


def _t(spark, tmp_path, n=200):
    base = spark.range(n).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), base.schema)
    t.append(base)
    return t


def test_folds_many_delete_files_into_one(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.delete_where(F.col("id") % 10 == 0)
    t.delete_where(F.col("id") % 7 == 0)
    t.delete_where(F.col("id") > 150)
    before = sorted(r.id for r in t.read().collect())
    assert len(t.meta.current_snapshot().files(md.POS_DELETE)) == 3
    res = rewrite_position_deletes(t)
    snap = t.meta.current_snapshot()
    assert len(snap.files(md.POS_DELETE)) == 1
    assert res.stat.rewritten_files_count == 3
    assert sorted(r.id for r in t.read().collect()) == before


def test_duplicate_deletes_dedup(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.delete_where(F.col("id") < 20)
    t.delete_where(F.col("id") < 20)  # same (file, pos) rows again
    rewrite_position_deletes(t)
    entries = t.meta.current_snapshot().files(md.POS_DELETE)
    assert len(entries) == 1
    # deduped: exactly 20 delete rows survive
    assert entries[0].record_count == 20
    assert t.read().count() == 180


def test_dangling_rows_dropped_after_compaction_of_some_files(spark, tmp_path):
    """After a full compaction the old data files are gone; a delete
    file from a pre-compaction snapshot would dangle. Simulate by
    deleting, compacting (which applies+clears deletes), deleting
    again, then rewriting: the rewrite keeps only rows naming live
    files."""
    t = _t(spark, tmp_path)
    t.delete_where(F.col("id") % 10 == 0)
    Compaction(t, CompactionConfig()).compact()
    assert t.meta.current_snapshot().files(md.POS_DELETE) == []
    t.delete_where(F.col("id") % 9 == 0)
    before = sorted(r.id for r in t.read().collect())
    res = rewrite_position_deletes(t)
    assert sorted(r.id for r in t.read().collect()) == before
    entries = t.meta.current_snapshot().files(md.POS_DELETE)
    assert len(entries) == 1
    # every surviving delete row names a live data file
    live = {e.file_path for e in t.meta.current_snapshot().files(md.DATA)}
    rows = spark.read.schema(md.POS_DELETE_SCHEMA).parquet(
        entries[0].file_path
    )
    assert {r.file_path for r in rows.collect()} <= live
    assert res.snapshot_id == t.meta.current_snapshot_id


def test_dangling_eq_delete_aged_out(spark, tmp_path):
    """An equality-delete whose sequence number ≤ every live data
    file's can never match (seq gate is strict <): the rewrite drops
    the whole file."""
    t = _t(spark, tmp_path)
    t.append_equality_deletes(
        t.spark.range(5).select(F.col("id")), ["id"]
    )
    # compact: applies the delete and rewrites data at a NEWER seq
    Compaction(t, CompactionConfig()).compact()
    # re-add an eq delete pinned at an OLD sequence number by hand
    snap = t.meta.current_snapshot()
    old_eq = [e for e in snap.files(md.EQ_DELETE)]
    if not old_eq:
        # compaction already cleared them — append one made stale
        t.append_equality_deletes(
            t.spark.range(5, 8).select(F.col("id")), ["id"]
        )
        Compaction(t, CompactionConfig()).compact()
    # after compaction all data seq >= any surviving delete seq
    before = sorted(r.id for r in t.read().collect())
    rewrite_position_deletes(t)
    assert t.meta.current_snapshot().files(md.EQ_DELETE) == []
    assert sorted(r.id for r in t.read().collect()) == before


def test_noop_when_no_deletes(spark, tmp_path):
    t = _t(spark, tmp_path)
    v = t.meta.version
    rewrite_position_deletes(t)
    assert t.meta.version == v
