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


def test_rewrite_deletes_to_vectors(spark, tmp_path):
    """r14: parquet pos-deletes fold into per-file deletion vectors;
    rows identical, every surviving pos entry is a DV, and a second
    run (DV → DV) converges without changing rows."""
    from pyspark.sql import functions as F

    from bergloom_spark.lake import LakeTable
    from bergloom_spark.lake import metadata as md
    from bergloom_spark.lake.compaction import rewrite_deletes_to_vectors
    from bergloom_spark.operators import mor

    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema)
    t.append(df.where("id % 2 = 0"))
    t.append(df.where("id % 2 = 1"))
    hidden = t.scan_data(with_hidden=True)
    t.append_position_deletes(
        hidden.filter("id % 5 = 0").select(
            F.col(mor.SYS_HIDDEN_FILE_PATH).alias("file_path"),
            F.col(mor.SYS_HIDDEN_POS).alias("pos"),
        )
    )
    before = sorted(r.id for r in t.read().collect())
    assert len(before) == 1600
    result = rewrite_deletes_to_vectors(t)
    assert result.stat.added_files_count >= 1
    t.refresh()
    pos = t.meta.current_snapshot().files(md.POS_DELETE)
    assert pos and all(e.dv_referenced_file for e in pos)
    assert all(e.file_path.endswith(".puffin") for e in pos)
    assert sorted(r.id for r in t.read().collect()) == before
    # converges: DV entries re-fold without row changes
    rewrite_deletes_to_vectors(t)
    t.refresh()
    assert sorted(r.id for r in t.read().collect()) == before
    # metadata roundtrips through the native JSON (new DV fields)
    t2 = LakeTable(spark, md.read_current(t.meta.table_root))
    assert sorted(r.id for r in t2.read().collect()) == before


def test_rewrite_deletes_to_vectors_noop_without_deletes(spark, tmp_path):
    from pyspark.sql import functions as F

    from bergloom_spark.lake import LakeTable
    from bergloom_spark.lake.compaction import rewrite_deletes_to_vectors

    df = spark.range(50).select(F.col("id"))
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema)
    t.append(df)
    snap_before = t.meta.current_snapshot_id
    result = rewrite_deletes_to_vectors(t)
    assert result.snapshot_id == snap_before  # no empty commit


def test_dv_downgrade_and_export_guard(spark, tmp_path):
    """rewrite_position_deletes folds DVs BACK into parquet (the v2
    downgrade path), and export refuses a DV-carrying snapshot
    loudly instead of labeling Puffin blobs PARQUET."""
    import pytest
    from pyspark.sql import functions as F

    from bergloom_spark.lake import LakeTable
    from bergloom_spark.lake import metadata as md
    from bergloom_spark.lake.compaction import (
        rewrite_deletes_to_vectors,
        rewrite_position_deletes,
    )
    from bergloom_spark.lake.iceberg_export import export_iceberg_metadata
    from bergloom_spark.operators import mor

    df = spark.range(600).select(F.col("id"))
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema)
    t.append(df)
    hidden = t.scan_data(with_hidden=True)
    t.append_position_deletes(
        hidden.filter("id % 3 = 0").select(
            F.col(mor.SYS_HIDDEN_FILE_PATH).alias("file_path"),
            F.col(mor.SYS_HIDDEN_POS).alias("pos"),
        )
    )
    before = sorted(r.id for r in t.read().collect())
    rewrite_deletes_to_vectors(t)
    t.refresh()
    with pytest.raises(ValueError, match="deletion vectors"):
        export_iceberg_metadata(t.meta)
    rewrite_position_deletes(t)
    t.refresh()
    pos = t.meta.current_snapshot().files(md.POS_DELETE)
    assert pos and all(e.dv_referenced_file is None for e in pos)
    assert sorted(r.id for r in t.read().collect()) == before
    # downgraded table exports cleanly
    export_iceberg_metadata(t.meta)


def test_delete_matching_and_vectors(spark, tmp_path):
    """delete_matching pins EXACTLY the rows matching the key set at
    delete time (later appends with the same keys stay), in both the
    parquet and deletion-vector flavors."""
    from pyspark.sql import functions as F

    from bergloom_spark.lake import LakeTable
    from bergloom_spark.lake import metadata as md

    df = spark.range(500).select(F.col("id"), (F.col("id") % 9).alias("k"))
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema)
    t.append(df)
    losers = spark.range(500).select(F.col("id")).where("id % 4 = 0")
    snap = t.delete_matching(losers, ["id"], as_vectors=True)
    assert snap is not None
    t.refresh()
    pos = t.meta.current_snapshot().files(md.POS_DELETE)
    assert pos and all(e.dv_referenced_file for e in pos)
    kept = sorted(r.id for r in t.read().collect())
    assert kept == [i for i in range(500) if i % 4 != 0]
    # positional semantics: re-appending a deleted key resurrects it
    t.append(spark.createDataFrame([(0, 0)], "id long, k long"))
    assert sorted(r.id for r in t.read().collect()) == sorted(kept + [0])
    # parquet flavor + empty-match no-op
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), df.schema)
    t2.append(df)
    assert t2.delete_matching(
        spark.createDataFrame([(9999,)], "id long"), ["id"]
    ) is None
    t2.delete_matching(losers, ["id"])  # parquet pos-delete flavor
    assert sorted(r.id for r in t2.read().collect()) == [
        i for i in range(500) if i % 4 != 0
    ]


def test_delete_where_as_vectors(spark, tmp_path):
    from pyspark.sql import functions as F

    from bergloom_spark.lake import LakeTable
    from bergloom_spark.lake import metadata as md

    df = spark.range(300).select(F.col("id"))
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema)
    t.append(df)
    assert t.delete_where_as_vectors(F.col("id") > 10_000) is None
    snap = t.delete_where_as_vectors(F.col("id") % 3 == 0)
    assert snap is not None
    t.refresh()
    pos = t.meta.current_snapshot().files(md.POS_DELETE)
    assert pos and all(e.dv_referenced_file for e in pos)
    assert sorted(r.id for r in t.read().collect()) == [
        i for i in range(300) if i % 3 != 0
    ]
