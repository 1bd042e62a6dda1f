"""Named snapshot refs: tags, branches, expiry retention."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from bergloom_spark.lake import LakeTable
from bergloom_spark.lake.compaction import expire_snapshots


def _table(spark, sf_dir, root):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    t = LakeTable.create(spark, os.path.join(root, "li"), li.schema)
    return t, li


def test_tag_reads_pinned_snapshot(spark, sf_dir):
    with tempfile.TemporaryDirectory() as root:
        t, li = _table(spark, sf_dir, root)
        first = t.append(li.filter(F.col("l_orderkey") % 2 == 0))
        t.create_tag("rel")
        t.append(li.filter(F.col("l_orderkey") % 2 == 1))
        assert t.ref_snapshot_id("rel") == first.snapshot_id
        assert (
            t.read(ref="rel").count()
            == t.read(snapshot_id=first.snapshot_id).count()
            == li.filter(F.col("l_orderkey") % 2 == 0).count()
        )


def test_tag_survives_expiry_and_reload(spark, sf_dir):
    with tempfile.TemporaryDirectory() as root:
        t, li = _table(spark, sf_dir, root)
        tagged = t.append(li.filter(F.col("l_orderkey") % 4 == 0))
        t.create_tag("rel")
        t.append(li.filter(F.col("l_orderkey") % 4 == 1))
        t.append(li.filter(F.col("l_orderkey") % 4 == 2))
        n = expire_snapshots(t, keep_last=1)
        assert n >= 1  # something expired...
        assert any(
            s.snapshot_id == tagged.snapshot_id for s in t.meta.snapshots
        )  # ...but not the tagged snapshot
        # refs survive a metadata reload from disk
        t2 = LakeTable.load(spark, t.meta.table_root)
        assert t2.read(ref="rel").count() == li.filter(
            F.col("l_orderkey") % 4 == 0
        ).count()


def test_branch_moves_tag_does_not(spark, sf_dir):
    with tempfile.TemporaryDirectory() as root:
        t, li = _table(spark, sf_dir, root)
        s1 = t.append(li.filter(F.col("l_orderkey") % 2 == 0))
        t.create_branch("dev")
        t.create_tag("v1")
        s2 = t.append(li.filter(F.col("l_orderkey") % 2 == 1))
        t.set_branch("dev", s2.snapshot_id)
        assert t.ref_snapshot_id("dev") == s2.snapshot_id
        assert t.ref_snapshot_id("v1") == s1.snapshot_id
        with pytest.raises(ValueError):
            t.set_branch("v1", s2.snapshot_id)  # tags are immutable


def test_ref_validation(spark, sf_dir):
    with tempfile.TemporaryDirectory() as root:
        t, li = _table(spark, sf_dir, root)
        with pytest.raises(ValueError):
            t.create_tag("empty")  # no snapshot yet
        t.append(li.limit(10))
        t.create_tag("a")
        with pytest.raises(ValueError):
            t.create_tag("a")  # duplicate
        with pytest.raises(KeyError):
            t.create_tag("b", snapshot_id=999)
        with pytest.raises(KeyError):
            t.read(ref="nope")
        t.drop_ref("a")
        with pytest.raises(KeyError):
            t.ref_snapshot_id("a")


def test_refs_survive_commits(spark, sf_dir):
    with tempfile.TemporaryDirectory() as root:
        t, li = _table(spark, sf_dir, root)
        s1 = t.append(li.filter(F.col("l_orderkey") % 2 == 0))
        t.create_tag("keep")
        t.delete_where(F.col("l_quantity") > 25)
        from bergloom_spark.config import CompactionConfig
        from bergloom_spark.lake import Compaction

        Compaction(t, CompactionConfig()).compact()
        assert t.ref_snapshot_id("keep") == s1.snapshot_id
