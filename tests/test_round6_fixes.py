"""Round-6 fixes, pinned.

1. Changelog de-amplification (verdict r5 #3): every delete file is
   read ONCE per planning call on the driver and shipped into the
   partition descriptors as per-data-file position slices / pickled
   key frames; executors open no delete file on the fast path, and
   files past the driver caps fall back to path shipping with
   identical results.
2. ``read_changes`` parallelism (verdict r5 #1): one change unit per
   task up to cluster width, no hardcoded 32 cap.
3. ``read_changes`` bound validation (advice r5): off-chain /
   beyond-tip snapshot ids raise instead of silently truncating.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bergloom_spark.lake import LakeTable


def _history(spark, root):
    """appends + MERGE (eq-deletes) + delete_where (pos-deletes)."""
    base = spark.range(80).select("id", (F.col("id") % 7).alias("v"))
    t = LakeTable.create(spark, root, base.schema)
    t.append(base.filter(F.col("id") < 50))
    t.upsert(
        spark.range(10, 20).select(
            "id", F.lit(99).cast("long").alias("v")
        ),
        ["id"],
    )
    t.delete_where(F.col("id") % 10 == 3)
    t.append(base.filter(F.col("id") >= 50))
    return t


def _change_parts(t):
    from pyspark.sql import types as T

    from bergloom_spark.sources.lakestream import _LakeChangelogReader

    out_schema = T.StructType(
        t.schema.fields
        + [
            T.StructField("_change_type", T.StringType(), False),
            T.StructField("_commit_snapshot_id", T.LongType(), False),
        ]
    )
    reader = _LakeChangelogReader({"path": t.meta.table_root}, out_schema)
    return reader.partitions(
        {"last_snapshot_id": 0},
        {"last_snapshot_id": t.meta.current_snapshot_id},
    )


def test_delete_evidence_ships_inline(spark, tmp_path, monkeypatch):
    """Delete-kind partitions carry inline slices (no paths), and the
    planner opens each delete file at most once."""
    import pyarrow.parquet as pq_mod

    import bergloom_spark.sources.lakestream as ls

    t = _history(spark, str(tmp_path / "t"))

    opened: list[str] = []
    real = pq_mod.read_table

    def counting(path, *a, **kw):
        if isinstance(path, str) and (
            "delete" in path or "eq-" in path
        ):
            opened.append(path)
        return real(path, *a, **kw)

    monkeypatch.setattr(pq_mod, "read_table", counting)
    parts = _change_parts(t)
    # each distinct delete file read at most once on the driver
    assert len(opened) == len(set(opened))

    dparts = [p for p in parts if p.kind in ("delete", "drop")]
    assert dparts, "history must produce delete-kind units"
    for p in dparts:
        assert p.prior_pos_paths == ()
        assert p.prior_eq_paths == ()
        assert p.new_pos_paths == ()
        assert p.new_eq_paths == ()
        assert len(p.new_pos) or p.new_eq or p.kind == "drop"
    # and the executor kernel must not open ANY file but its own
    # data file on the inline fast path
    kernel_opens: list[str] = []

    def kernel_counting(path, *a, **kw):
        kernel_opens.append(str(path))
        return real(path, *a, **kw)

    monkeypatch.setattr(pq_mod, "read_table", kernel_counting)
    for p in dparts:
        list(ls.read_change_partition(p))
    assert all(op in {p.file_path for p in dparts} for op in kernel_opens)


def test_path_fallback_matches_inline(spark, tmp_path, monkeypatch):
    """Forcing every delete file past the driver caps must flip the
    partitions to path shipping and produce the identical change
    multiset."""
    import bergloom_spark.sources.lakestream as ls

    t = _history(spark, str(tmp_path / "t"))
    inline = {
        tuple(r)
        for r in t.read_changes().drop("_commit_snapshot_id").collect()
    }
    monkeypatch.setattr(ls, "_driver_readable", lambda e: False)
    t2 = LakeTable.load(spark, t.meta.table_root)
    parts = _change_parts(t2)
    dparts = [p for p in parts if p.kind in ("delete", "drop")]
    assert dparts and all(
        (p.prior_pos_paths or p.new_pos_paths or p.new_eq_paths
         or p.prior_eq_paths or p.kind == "drop")
        for p in dparts
    )
    fallback = {
        tuple(r)
        for r in t2.read_changes().drop("_commit_snapshot_id").collect()
    }
    assert fallback == inline


def test_read_changes_width_scales_past_32(spark, tmp_path):
    """Verdict r5 #1: the batch change query sizes its tasks to the
    cluster, not a hardcoded 32."""
    base = spark.range(4).select("id", F.lit(0).cast("long").alias("v"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base.schema)
    for i in range(40):
        t.append(
            spark.range(i * 4, i * 4 + 4).select(
                "id", F.lit(i).cast("long").alias("v")
            )
        )
    df = t.read_changes()
    width = df.rdd.getNumPartitions()
    # cluster-derived, not the old hardcoded min(len, 32)
    expected = min(40, spark.sparkContext.defaultParallelism * 2)
    assert width == expected != 32
    assert df.count() == 160


def test_replication_batches_snapshots_into_one_commit(spark, tmp_path):
    """Verdict r5 #7 pinned as a property: one availableNow drain
    over an N-snapshot source history applies as ONE replica commit
    (apply_changes per micro-batch, and the drain is one micro-batch)
    — the replica's write amplification is bounded by drain cadence,
    not by the source's commit count."""
    import pyspark.sql.functions as F

    from bergloom_spark.sources.lakestream import LakeStreamDataSource
    from bergloom_spark.streaming.ingest import replicate_changelog

    spark.dataSource.register(LakeStreamDataSource)
    base = spark.range(300).select("id", (F.col("id") % 5).alias("v"))
    src = LakeTable.create(spark, str(tmp_path / "src"), base.schema)
    for i in range(5):
        src.append(
            spark.range(i * 60, (i + 1) * 60).select(
                "id", (F.col("id") % 5).alias("v")
            )
        )
    src.delete_where(F.col("id") % 9 == 2)
    src.upsert(
        spark.range(7, 20, 3).select(
            "id", F.lit(42).cast("long").alias("v")
        ),
        ["id"],
    )
    dst = LakeTable.create(spark, str(tmp_path / "dst"), base.schema)
    dst = replicate_changelog(
        spark, str(tmp_path / "src"), dst, str(tmp_path / "ck"), ["id"]
    )
    assert len(src.refresh().meta.snapshots) >= 7
    assert len(dst.meta.snapshots) == 1  # 7+ source snapshots, 1 commit
    assert {tuple(r) for r in dst.read().collect()} == {
        tuple(r) for r in src.read().collect()
    }


def test_read_changes_pins_its_range_against_later_commits(
    spark, tmp_path
):
    """Snapshot isolation for the batch change query: the partition
    set is planned at call time against the committed chain, so a
    commit that lands between planning and collection neither appears
    in the result nor disturbs it."""
    base = spark.range(20).select("id", (F.col("id") % 3).alias("v"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base.schema)
    t.append(base)
    t.delete_where(F.col("id") % 5 == 0)
    tip = t.meta.current_snapshot_id
    df = t.read_changes(to_snapshot_id=tip)  # planned now
    before = {tuple(r) for r in df.collect()}
    # a later commit must not leak into a re-collection of the SAME df
    t.append(spark.range(100, 120).select("id", (F.col("id") % 3).alias("v")))
    rows = df.collect()
    after = {tuple(r) for r in rows}
    assert after == before
    assert max(r["_commit_snapshot_id"] for r in rows) <= tip
    # 20 inserts + 4 deletes
    assert len(after) == 24


def test_read_changes_rejects_offchain_bounds(spark, tmp_path):
    """Advice r5: a typo'd bound must raise, not silently truncate."""
    base = spark.range(10).select("id")
    t = LakeTable.create(spark, str(tmp_path / "t"), base.schema)
    t.append(base)
    t.append(spark.range(10, 20).select("id"))
    tip = t.meta.current_snapshot_id
    with pytest.raises(ValueError, match="committed snapshot chain"):
        t.read_changes(to_snapshot_id=tip + 999)
    with pytest.raises(ValueError, match="committed snapshot chain"):
        t.read_changes(from_snapshot_id=tip + 1)
    # valid bounds still work
    assert t.read_changes(to_snapshot_id=tip).count() == 20
