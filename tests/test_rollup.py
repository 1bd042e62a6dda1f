from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from bergloom_spark.io import load_table
from bergloom_spark.lake import LakeTable
from bergloom_spark.operators.rollup import IncrementalRollup

LI_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
    "l_linestatus", "l_quantity", "l_extendedprice",
]


def _state(rollup_table):
    return {
        (r.l_returnflag, r.l_linestatus): (
            r.cnt,
            round(r.sum_l_quantity, 2),
            round(r.sum_l_extendedprice, 2),
        )
        for r in rollup_table.read().collect()
    }


def _expected(fact_df):
    rows = (
        fact_df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sq"),
            F.round(F.sum("l_extendedprice"), 2).alias("sp"),
        )
        .collect()
    )
    return {
        (r.l_returnflag, r.l_linestatus): (r.cnt, r.sq, r.sp) for r in rows
    }


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "fact"), str(tmp_path / "rollup")


def test_incremental_equals_recompute_through_lifecycle(spark, sf_dir, roots):
    fact_root, rollup_root = roots
    li = load_table(spark, sf_dir, "lineitem").select(*LI_COLS)
    t = LakeTable.create(spark, fact_root, li.schema)
    r = IncrementalRollup(
        t, rollup_root,
        keys=["l_returnflag", "l_linestatus"],
        sum_cols=["l_quantity", "l_extendedprice"],
    )

    # Phase 1: initial load (full aggregation path).
    t.append(li.filter(F.col("l_orderkey") % 2 == 0))
    rt = r.refresh()
    assert _state(rt) == _expected(t.read())

    # Phase 2: append + delete consumed as one changelog.
    t = t.refresh()
    t.append(li.filter(F.col("l_orderkey") % 2 == 1))
    t.delete_where(F.col("l_suppkey") % 7 == 0)
    rt = r.refresh()
    assert _state(rt) == _expected(t.refresh().read())


def test_refresh_is_idempotent_at_same_snapshot(spark, sf_dir, roots):
    fact_root, rollup_root = roots
    li = load_table(spark, sf_dir, "lineitem").select(*LI_COLS)
    t = LakeTable.create(spark, fact_root, li.schema)
    t.append(li.limit(100))
    r = IncrementalRollup(
        t, rollup_root, keys=["l_returnflag", "l_linestatus"],
        sum_cols=["l_quantity"],
    )
    first = r.refresh()
    snap_before = first.meta.current_snapshot_id
    second = r.refresh()
    assert second.meta.current_snapshot_id == snap_before


def test_vanished_group_is_removed(spark, roots):
    fact_root, rollup_root = roots
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)],
        "id long, grp string, v double",
    )
    t = LakeTable.create(spark, fact_root, df.schema)
    t.append(df)
    r = IncrementalRollup(t, rollup_root, keys=["grp"], sum_cols=["v"])
    r.refresh()
    t = t.refresh()
    t.delete_where(F.col("grp") == "b")
    rt = r.refresh()
    groups = {row.grp for row in rt.read().collect()}
    assert groups == {"a"}
