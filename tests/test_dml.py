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
