"""Regression tests for round-4 ADVICE fixes.

- ADVICE r3 #1 (high): ``expire_snapshots`` on a shallow clone must
  never physically delete files it borrowed from the source table.
- ADVICE r3 #2 (medium): the checkpoint-namespaced exactly-once guard
  must fall back to the legacy un-namespaced key so pre-upgrade tables
  keep replay protection.
- ADVICE r3 #3 (low): Bloom pruning must not prune on a type-coerced
  probe (string column probed with an int literal).
- ADVICE r3 #4 (low): lakestream ``maxFilesPerBatch`` counts only the
  files each snapshot ADDED, not carried-forward entries.
- ADVICE r3 #5 (low): lakestream raises when the checkpointed offset
  predates the oldest retained snapshot (expired history), instead of
  silently dropping those appends from the feed.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from bergloom_spark.lake import LakeTable
from bergloom_spark.lake.compaction import expire_snapshots
from bergloom_spark.lake.skipping import bloom_may_contain, build_bloom


def _two_col_table(spark, root, n=100):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.LongType(), False),
        ]
    )
    t = LakeTable.create(spark, root, schema)
    t.append(spark.range(n).select("id", (F.col("id") * 2).alias("v")))
    return t


def test_expire_on_clone_never_deletes_source_files(spark, tmp_path):
    """Clone → rewrite on the clone → expire on the clone: the source's
    physical files (borrowed by absolute path into the clone's first
    snapshot) must survive, and the source must still read in full."""
    from bergloom_spark.config import CompactionConfig
    from bergloom_spark.lake import Compaction

    src = _two_col_table(spark, str(tmp_path / "src"))
    src.append(
        spark.range(100, 150).select("id", (F.col("id") * 2).alias("v"))
    )
    src_files = {
        e.file_path
        for e in src.meta.current_snapshot().entries
    }
    clone = src.clone_to(str(tmp_path / "clone"))
    # Rewrite everything on the clone: borrowed files become dead there.
    Compaction(clone, CompactionConfig()).compact()
    expired = expire_snapshots(clone, keep_last=1)
    assert expired >= 1
    for p in src_files:
        assert os.path.exists(p), f"source file deleted by clone expiry: {p}"
    assert src.read().count() == 150
    # The clone itself still reads correctly from its rewritten files.
    assert clone.read().count() == 150


def test_exactly_once_guard_falls_back_to_legacy_key(spark, tmp_path):
    """A table whose last batch id lives under the LEGACY property only
    (written by the pre-namespacing code) must still drop the replayed
    micro-batch on the first restart with an existing checkpoint."""
    from bergloom_spark.streaming.ingest import (
        LAST_BATCH_PROP,
        _append_sink,
        guard_key_for_checkpoint,
    )

    t = _two_col_table(spark, str(tmp_path / "t"), n=10)
    batch = spark.range(10, 20).select("id", (F.col("id") * 2).alias("v"))
    # Simulate the pre-upgrade writer: batch 0 committed under the
    # legacy key only.
    t.append(batch, properties_update={LAST_BATCH_PROP: "0"})
    assert t.refresh().read().count() == 20
    # Post-upgrade sink replays batch 0 (crash between table commit and
    # checkpoint advance). The namespaced key is absent — the legacy
    # value must still guard.
    sink = _append_sink(
        t, 128 * 1024 * 1024, guard_key_for_checkpoint(str(tmp_path / "ck"))
    )
    sink(batch, 0)
    assert t.refresh().read().count() == 20  # no duplicate rows
    # A genuinely new batch still commits and records the namespaced key.
    sink(batch.withColumn("id", F.col("id") + 10), 1)
    assert t.refresh().read().count() == 30


def test_bloom_type_mismatch_never_prunes():
    b = build_bloom(["5.0", "7.5", "abc"])
    assert b is not None and b.startswith("s:")
    # Spark's coercing filter may match '5.0' = 5 — the bloom must not
    # veto the file just because str(5) != "5.0".
    assert bloom_may_contain(b, 5) is True
    # Same-type probes still prune normally.
    assert bloom_may_contain(b, "5.0") is True
    assert bloom_may_contain(b, "zzz") is False
    bi = build_bloom([1, 2, 3])
    assert bi is not None and bi.startswith("i:")
    assert bloom_may_contain(bi, "1") is True  # str probe of int bloom
    assert bloom_may_contain(bi, 2) is True
    assert bloom_may_contain(bi, 999999) is False
    # Mixed-type columns never build a bloom (cross-coercion hazard).
    assert build_bloom([1, "1"]) is None
    # Legacy untagged blooms are treated as evidence-free.
    assert bloom_may_contain("00" * 2048, "anything") is True


def _reader(root, **opts):
    from bergloom_spark.lake import metadata as md
    from bergloom_spark.sources.lakestream import _LakeStreamReader

    meta = md.read_current(root)
    schema = T.StructType.fromJson(
        meta.schema if isinstance(meta.schema, dict) else json.loads(meta.schema)
    )
    options = {"path": root}
    options.update({k.lower(): v for k, v in opts.items()})
    return _LakeStreamReader(options, schema)


def test_lakestream_max_files_counts_new_files_only(spark, tmp_path):
    """Three 1-file appends with maxFilesPerBatch=2: the offset must
    advance two snapshots per batch (carried-forward entries would have
    collapsed it to one snapshot per batch after the first)."""
    root = str(tmp_path / "t")
    t = _two_col_table(spark, root, n=10)  # snapshot 1: 1 file? (maybe more)
    t.append(spark.range(10, 20).select("id", (F.col("id") * 2).alias("v")))
    t.append(spark.range(20, 30).select("id", (F.col("id") * 2).alias("v")))
    from bergloom_spark.lake import metadata as md

    meta = md.read_current(root)
    new_files = {
        s.snapshot_id: sum(
            1
            for e in s.entries
            if e.content == md.DATA and e.sequence_number == s.sequence_number
        )
        for s in meta.snapshots
    }
    per_snap = max(new_files.values())
    # Cap = files of exactly two snapshots → batch must span two
    # snapshots even though snapshot 3 carries 3 snapshots' files.
    r = _reader(root, maxFilesPerBatch=str(2 * per_snap))
    r.initialOffset()  # fresh stream: the engine sets the floor first
    off = r.latestOffset()
    assert off["last_snapshot_id"] == 2
    # The capped offset must PROGRESS once the engine consumes the
    # batch (review r4: counting from snapshot 1 forever livelocked
    # the stream at the first cap boundary).
    assert r.latestOffset()["last_snapshot_id"] == 2  # not consumed yet
    parts = r.partitions({"last_snapshot_id": 0}, off)
    assert all(p.file_path for p in parts)
    assert r.latestOffset()["last_snapshot_id"] == 3  # floor advanced
    parts = r.partitions({"last_snapshot_id": 2}, {"last_snapshot_id": 3})
    assert all(p.file_path for p in parts)


def test_lakestream_restart_without_floor_waives_cap(spark, tmp_path):
    """A restarted reader that goes straight to latestOffset (no
    initialOffset, no replay) has no floor — the cap is waived for
    that call instead of re-counting from snapshot 1, which could
    return an offset BEHIND the checkpoint."""
    root = str(tmp_path / "t")
    t = _two_col_table(spark, root, n=10)
    t.append(spark.range(10, 20).select("id", (F.col("id") * 2).alias("v")))
    t.append(spark.range(20, 30).select("id", (F.col("id") * 2).alias("v")))
    r = _reader(root, maxFilesPerBatch="1")
    assert r.latestOffset()["last_snapshot_id"] == 3  # uncapped, safe


def test_lakestream_fully_expired_replay_range_raises(spark, tmp_path):
    """Review r4: a replayed batch whose WHOLE range was expired must
    raise, not come back empty (the empty replay would advance the
    checkpoint past appends that were never delivered)."""
    root = str(tmp_path / "t")
    t = _two_col_table(spark, root, n=10)
    t.append(spark.range(10, 20).select("id", (F.col("id") * 2).alias("v")))
    t.append(spark.range(20, 30).select("id", (F.col("id") * 2).alias("v")))
    expire_snapshots(t, keep_last=1)  # only snapshot 3 retained
    r = _reader(root)
    with pytest.raises(ValueError, match="expired"):
        r.partitions({"last_snapshot_id": 0}, {"last_snapshot_id": 2})


def _changelog_reader(root):
    from bergloom_spark.lake import metadata as md
    from bergloom_spark.sources.lakestream import _LakeChangelogReader

    meta = md.read_current(root)
    schema = T.StructType.fromJson(
        meta.schema if isinstance(meta.schema, dict) else json.loads(meta.schema)
    )
    out_schema = T.StructType(
        list(schema.fields)
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_snapshot_id", T.LongType()),
        ]
    )
    return _LakeChangelogReader({"path": root}, out_schema)


def test_changelog_delete_events_survive_expired_parent(spark, tmp_path):
    """Review r4 (two iterations): a delete snapshot whose parent was
    expired must still emit its delete events — the parent's live view
    is reconstructed from the snapshot's own carried-forward entries,
    so a fully caught-up consumer isn't broken by keep-last retention.
    (The first fix raised here, making the retention contract off by
    one; emitting insert-only, the original bug, silently dropped the
    deletes.)"""
    root = str(tmp_path / "t")
    t = _two_col_table(spark, root, n=20)
    t.append(spark.range(20, 40).select("id", (F.col("id") * 2).alias("v")))
    t.delete_where(F.col("id") % 3 == 0)  # snapshot 3: deletes
    expire_snapshots(t, keep_last=1)  # parent (snapshot 2) expired
    r = _changelog_reader(root)
    parts = r.partitions({"last_snapshot_id": 2}, {"last_snapshot_id": 3})
    kinds = {p.kind for p in parts}
    assert "delete" in kinds, kinds
    deleted = set()
    for p in parts:
        if p.kind != "delete":
            continue
        for batch in r.read(p):
            deleted.update(batch.to_pydict()["id"])
    assert deleted == {i for i in range(40) if i % 3 == 0}


def test_changelog_overwrite_with_expired_parent_raises(spark, tmp_path):
    """Only an OVERWRITE genuinely needs its parent (removed files are
    not carried forward) — with the parent expired it must fail, not
    emit insert-only."""
    root = str(tmp_path / "t")
    t = _two_col_table(spark, root, n=20)
    t.append(spark.range(20, 40).select("id", (F.col("id") * 2).alias("v")))
    t.overwrite_partitions(
        spark.range(5).select("id", F.lit(0).cast("long").alias("v"))
    )
    expire_snapshots(t, keep_last=1)  # overwrite's parent expired
    r = _changelog_reader(root)
    with pytest.raises(ValueError, match="overwrite"):
        r.partitions({"last_snapshot_id": 2}, {"last_snapshot_id": 3})


def test_lakestream_expired_history_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _two_col_table(spark, root, n=10)
    t.append(spark.range(10, 20).select("id", (F.col("id") * 2).alias("v")))
    t.append(spark.range(20, 30).select("id", (F.col("id") * 2).alias("v")))
    expire_snapshots(t, keep_last=1)
    r = _reader(root)
    with pytest.raises(ValueError, match="expired"):
        r.partitions({"last_snapshot_id": 0}, r.latestOffset())
    # An offset already at/after the retained horizon still streams.
    parts = r.partitions({"last_snapshot_id": 2}, {"last_snapshot_id": 3})
    assert parts


def test_fresh_lineage_on_legacy_table_commits_its_batches(spark, tmp_path):
    """Review r4: the legacy-key fallback must treat only an EXACT
    batch-id match as a replay. A new checkpoint lineage (ids restart
    at 0) writing to a table whose legacy key says 7 must commit its
    live batches — the old at-or-below fallback silently dropped all
    of 0..7 and the namespaced key could never self-heal."""
    from bergloom_spark.streaming.ingest import (
        LAST_BATCH_PROP,
        _append_sink,
        guard_key_for_checkpoint,
    )

    t = _two_col_table(spark, str(tmp_path / "t"), n=10)
    t.append(
        spark.range(10, 15).select("id", (F.col("id") * 2).alias("v")),
        properties_update={LAST_BATCH_PROP: "7"},
    )
    base_count = t.refresh().read().count()
    sink = _append_sink(
        t, 128 * 1024 * 1024, guard_key_for_checkpoint(str(tmp_path / "ck"))
    )
    for b in range(3):
        sink(
            spark.range(100 + b * 10, 100 + b * 10 + 5).select(
                "id", (F.col("id") * 2).alias("v")
            ),
            b,
        )
    assert t.refresh().read().count() == base_count + 15
    # and the namespaced key now guards replays of those batches
    sink(spark.range(900, 905).select("id", (F.col("id") * 2).alias("v")), 2)
    assert t.refresh().read().count() == base_count + 15


def test_read_delete_only_history_on_empty_table(spark, tmp_path):
    """Hypothesis-found (round-2 property test): a snapshot holding
    equality-delete files but ZERO data files (delete-only changes
    applied to an empty table) must read as empty, not crash the MoR
    anti-join on a missing hidden seq column."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.LongType(), False),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema)
    changes = spark.createDataFrame(
        [(1, 0, "D"), (2, 0, "D")], "id long, v long, op string"
    )
    t.apply_changes(changes, ["id"], op_col="op")
    assert t.read().count() == 0
    # and the table still works after a later real insert
    t.apply_changes(
        spark.createDataFrame([(5, 50, "I")], "id long, v long, op string"),
        ["id"],
        op_col="op",
    )
    assert [(r.id, r.v) for r in t.read().collect()] == [(5, 50)]
