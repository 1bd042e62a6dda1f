"""Row-level MoR DML: delete_where + upsert (+ compaction interplay)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import types as T

from bergloom_spark.config import CompactionConfig
from bergloom_spark.lake import Compaction, LakeTable
from bergloom_spark.lake import metadata as md

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), False),
    ]
)


def _t(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(
        spark.range(100).select(
            F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
        )
    )
    return t


def test_delete_where(spark, tmp_path):
    t = _t(spark, tmp_path)
    snap = t.delete_where(F.col("id") % 10 == 0)
    assert snap is not None
    assert snap.files(md.POS_DELETE)
    got = sorted(r.id for r in t.read().collect())
    assert got == [i for i in range(100) if i % 10 != 0]


def test_delete_where_no_match_is_noop(spark, tmp_path):
    t = _t(spark, tmp_path)
    version = t.meta.version
    assert t.delete_where(F.col("id") > 1000) is None
    assert t.meta.version == version


def test_delete_where_idempotent(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.delete_where(F.col("id") < 5)
    t.delete_where(F.col("id") < 5)  # re-deletes same (file,pos): harmless
    assert t.read().count() == 95


def test_upsert_updates_and_inserts(spark, tmp_path):
    t = _t(spark, tmp_path)
    updates = spark.createDataFrame(
        [(3, "UPDATED"), (999, "NEW")], SCHEMA
    )
    t.upsert(updates, ["id"])
    rows = {r.id: r.v for r in t.read().collect()}
    assert len(rows) == 101
    assert rows[3] == "UPDATED"
    assert rows[999] == "NEW"
    assert rows[4] == "v4"


def test_upsert_survives_compaction(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.upsert(spark.createDataFrame([(7, "SEVEN")], SCHEMA), ["id"])
    t.delete_where(F.col("id") == 8)
    before = sorted((r.id, r.v) for r in t.read().collect())
    Compaction(t, CompactionConfig(enable_validate_compaction=True)).compact()
    after = sorted((r.id, r.v) for r in t.read().collect())
    assert after == before
    assert (7, "SEVEN") in after
    assert all(i != 8 for i, _ in after)


# ---------------------------------------------------------------------------
# apply_changes: CDC changelog MERGE (round 2)
# ---------------------------------------------------------------------------
def test_apply_changes_latest_wins_and_atomic(spark, tmp_path):
    import pyspark.sql.functions as F

    from bergloom_spark.lake import LakeTable

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id: long, v: string"
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), base.schema)
    t.append(base)
    n_snaps = len(t.meta.snapshots)
    changes = spark.createDataFrame(
        [
            (2, "b1", "U", 1),   # superseded by the later delete
            (2, "b2", "D", 2),   # wins for key 2 -> delete
            (3, "c1", "U", 1),   # update key 3
            (4, "d0", "I", 1),   # superseded
            (4, "d1", "U", 2),   # wins for key 4 -> insert-as-update
            (9, "zz", "D", 1),   # delete of a missing key: no-op
        ],
        "id: long, v: string, op: string, ord: long",
    )
    t.apply_changes(changes, ["id"], op_col="op", order_col="ord")
    # exactly ONE new snapshot (atomic delete+insert)
    assert len(t.meta.snapshots) == n_snaps + 1
    got = sorted(map(tuple, t.read().collect()))
    assert got == [(1, "a"), (3, "c1"), (4, "d1")]
    # the commit carries both entry kinds at the same sequence number
    snap = t.meta.current_snapshot()
    kinds = {e.content for e in snap.entries
             if e.sequence_number == snap.sequence_number}
    assert kinds == {"eq_delete", "data"}


def test_apply_changes_then_compact_clears_debt(spark, tmp_path):
    import pyspark.sql.functions as F

    from bergloom_spark.config import CompactionConfig
    from bergloom_spark.lake import Compaction, LakeTable

    base = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), base.schema)
    t.append(base)
    changes = spark.range(10).select(
        F.col("id"),
        (F.col("id") * 100).alias("v"),
        F.when(F.col("id") % 2 == 0, "U").otherwise("D").alias("op"),
        F.lit(1).alias("ord"),
    )
    t.apply_changes(changes, ["id"], op_col="op", order_col="ord")
    expected = sorted(map(tuple, t.read().collect()))
    Compaction(t, CompactionConfig(enable_validate_compaction=True)).compact()
    assert sorted(map(tuple, t.read().collect())) == expected
    # post-compaction: no delete files remain live
    snap = t.meta.current_snapshot()
    assert all(e.content == "data" for e in snap.entries)


# ---------------------------------------------------------------------------
# merge_into: general MERGE (round 3)
# ---------------------------------------------------------------------------
def test_merge_into_update_delete_insert(spark, tmp_path):
    t = _t(spark, tmp_path)  # ids 0..99, v = "v{id}"
    source = spark.createDataFrame(
        [
            (3, "UPDATED"),      # matched -> update
            (4, "DELETE_ME"),    # matched -> delete (condition below)
            (500, "NEW"),        # not matched -> insert
        ],
        SCHEMA,
    )
    t.merge_into(
        source,
        key_cols=["id"],
        when_matched_update={"v": "s.v"},
        when_matched_delete="s.v = 'DELETE_ME'",
        when_not_matched_insert=True,
    )
    rows = {r.id: r.v for r in t.read().collect()}
    assert rows[3] == "UPDATED"
    assert 4 not in rows
    assert rows[500] == "NEW"
    assert rows[5] == "v5"  # untouched
    assert len(rows) == 100  # 100 - 1 deleted + 1 inserted
    # single atomic snapshot
    assert t.meta.current_snapshot().operation == "merge"


def test_merge_into_expression_update(spark, tmp_path):
    t = _t(spark, tmp_path)
    source = spark.createDataFrame([(7, "x"), (8, "y")], SCHEMA)
    t.merge_into(
        source,
        key_cols=["id"],
        when_matched_update={"v": "concat(t.v, ':', s.v)"},
        when_not_matched_insert=False,
    )
    rows = {r.id: r.v for r in t.read().collect()}
    assert rows[7] == "v7:x"
    assert rows[8] == "v8:y"
    assert len(rows) == 100


def test_merge_into_rejects_duplicate_source_keys(spark, tmp_path):
    import pytest

    t = _t(spark, tmp_path)
    dup = spark.createDataFrame([(1, "a"), (1, "b")], SCHEMA)
    with pytest.raises(ValueError, match="multiple rows"):
        t.merge_into(dup, key_cols=["id"], when_matched_update={"v": "s.v"})


def test_merge_into_no_insert_clause(spark, tmp_path):
    t = _t(spark, tmp_path)
    source = spark.createDataFrame([(1, "one"), (1000, "ghost")], SCHEMA)
    t.merge_into(
        source, key_cols=["id"],
        when_matched_update={"v": "s.v"},
        when_not_matched_insert=False,
    )
    rows = {r.id: r.v for r in t.read().collect()}
    assert rows[1] == "one"
    assert 1000 not in rows


def test_overwrite_partitions_dynamic(spark, tmp_path):
    """INSERT OVERWRITE by partition: only partitions present in the
    new frame are replaced; untouched partitions keep their exact
    files (no rewrite amplification)."""
    base = spark.range(100).select(
        "id", (F.col("id") % 4).alias("bucket"),
        (F.col("id") * 10).alias("v"),
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), base.schema, partition_spec=["bucket"]
    )
    t.append(base)
    before = {
        e.file_path: e.partition
        for e in t.meta.current_snapshot().files(md.DATA)
    }
    # replace bucket 1 with halved rows, bucket 2 with nothing extra
    repl = base.filter(F.col("bucket") == 1).withColumn(
        "v", F.col("v") + 1
    )
    t.overwrite_partitions(repl)
    snap = t.meta.current_snapshot()
    assert snap.operation == "overwrite"
    after = {e.file_path: e.partition for e in snap.files(md.DATA)}
    # untouched partitions carry the same physical files
    for p, part in before.items():
        if part.get("bucket") != "1":
            assert p in after, f"untouched file {part} was rewritten"
        else:
            assert p not in after
    got = {(r.id, r.v) for r in t.read().collect()}
    want = {
        (i, i * 10 + 1) if i % 4 == 1 else (i, i * 10) for i in range(100)
    }
    assert got == want


def test_overwrite_unpartitioned_is_full_replace(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.delete_where(F.col("id") % 2 == 0)  # pre-existing delete files
    repl = spark.range(10).select(
        "id", F.concat(F.lit("new"), F.col("id")).alias("v")
    )
    t.overwrite_partitions(repl)
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {(i, f"new{i}") for i in range(10)}


def test_overwrite_rows_not_shadowed_by_old_eq_deletes(spark, tmp_path):
    """Replacement rows take the NEW sequence number: an equality
    delete committed before the overwrite must not shadow them."""
    t = _t(spark, tmp_path)
    t.upsert(
        spark.range(5).select(
            "id", F.concat(F.lit("u"), F.col("id")).alias("v")
        ),
        ["id"],
    )  # leaves eq-delete files for ids 0-4
    repl = spark.range(5).select(
        "id", F.concat(F.lit("ow"), F.col("id")).alias("v")
    )
    t.overwrite_partitions(repl)
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {(i, f"ow{i}") for i in range(5)}


def test_overwrite_changelog_emits_drops_and_inserts(spark, tmp_path):
    """The changelog feed for an overwrite snapshot: every previously
    live row becomes a delete, every replacement row an insert —
    replicating the feed reproduces the final state."""
    from bergloom_spark.sources.lakestream import LakeStreamDataSource
    from bergloom_spark.streaming.ingest import replicate_changelog

    spark.dataSource.register(LakeStreamDataSource)
    base = spark.range(30).select("id", (F.col("id") % 3).alias("v"))
    src = LakeTable.create(spark, str(tmp_path / "src"), base.schema)
    src.append(base)
    src.delete_where(F.col("id") % 5 == 0)
    src.overwrite_partitions(
        spark.range(7).select("id", F.lit(99).cast("long").alias("v"))
    )
    dst = LakeTable.create(spark, str(tmp_path / "dst"), base.schema)
    dst = replicate_changelog(
        spark, src.meta.table_root, dst, str(tmp_path / "ck"), ["id"]
    )
    assert {tuple(r) for r in dst.read().collect()} == {
        tuple(r) for r in src.read().collect()
    }
    assert {tuple(r) for r in src.read().collect()} == {
        (i, 99) for i in range(7)
    }


def test_overwrite_detects_concurrent_append_in_touched_partition(
    spark, tmp_path
):
    """Iceberg-style overwrite validation: a concurrent append into a
    partition being replaced must FAIL the overwrite commit (not be
    silently kept alongside the 'replacement')."""
    import pytest

    from bergloom_spark.lake import writer as wr
    from bergloom_spark.lake.commit import (
        CommitFailed,
        RetryConfig,
        RewriteFilesCommitManager,
    )

    base = spark.range(40).select(
        "id", (F.col("id") % 2).alias("bucket"), (F.col("id") * 2).alias("v")
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), base.schema, partition_spec=["bucket"]
    )
    t.append(base)
    # plan the overwrite of bucket 1 (files written, commit not yet)
    repl = base.filter(F.col("bucket") == 1).withColumn("v", F.lit(0).cast("long"))
    add_entries = wr.write_data_files(
        repl, t.meta.table_root, t.meta.last_sequence_number + 1,
        128 * 1024 * 1024, partition_spec=["bucket"],
    )
    touched = {tuple(sorted(e.partition.items())) for e in add_entries}
    cur = t.meta.current_snapshot()
    remove = {
        e.file_path for e in cur.entries
        if e.content == md.DATA
        and tuple(sorted(e.partition.items())) in touched
    }
    # concurrent writer appends into bucket 1 before the commit lands
    w2 = LakeTable.load(spark, t.meta.table_root)
    w2.append(
        spark.range(100, 105).select(
            "id", F.lit(1).cast("long").alias("bucket"),
            F.lit(7).cast("long").alias("v"),
        )
    )
    manager = RewriteFilesCommitManager(
        table_root=t.meta.table_root,
        starting_schema_id=t.meta.schema_id,
        starting_sequence_number=t.meta.last_sequence_number + 1,
        use_starting_sequence_number=False,
        retry=RetryConfig(),
    )
    with pytest.raises(CommitFailed, match="concurrently"):
        manager.rewrite_files(
            add_entries, remove, operation="overwrite",
            overwritten_partitions=touched,
        )
    # and a re-planned overwrite against the current state succeeds
    t = t.refresh()
    t.overwrite_partitions(repl)
    got = {(r.id, r.v) for r in t.read().collect()}
    want = {(i, 0) for i in range(40) if i % 2 == 1} | {
        (i, i * 2) for i in range(40) if i % 2 == 0
    }
    assert got == want
