"""Round-2 regression tests.

Covers: SortCompaction on partitioned tables (partition values must
survive the rewrite), partition-value type round-trips through the
Hive-layout fanout write (date / timestamp / boolean), deterministic
salting, the single-job delete_where/no-match path, and the
type-strict oracle harness (HUGEINT-class driver hash mismatches must
fail locally).
"""

from __future__ import annotations

import datetime

import duckdb
import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from bergloom_spark.config import CompactionConfig
from bergloom_spark.lake import Compaction, LakeTable
from bergloom_spark.lake.compaction import SortCompaction
from tests.oracle_utils import compare


# ---------------------------------------------------------------------------
# SortCompaction × partitioned tables
# ---------------------------------------------------------------------------
def _partitioned_table(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.StringType(), False),
            T.StructField("bucket", T.IntegerType(), False),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "pt"), schema, ["bucket"])
    df = spark.range(2000).select(
        "id",
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % 4).cast("int").alias("bucket"),
    )
    t.append(df)
    return t


def test_sort_compaction_preserves_partition_values(spark, tmp_path):
    t = _partitioned_table(spark, tmp_path)
    before = sorted(map(tuple, t.read().collect()))
    SortCompaction(
        t, CompactionConfig(enable_validate_compaction=True), sort_cols=["id"]
    ).compact()
    after = t.read()
    # The bug: partition columns read back NULL after a sort rewrite of
    # a partitioned table (unpartitioned write + empty manifest dicts).
    assert after.filter(F.col("bucket").isNull()).count() == 0
    assert sorted(map(tuple, after.collect())) == before
    snap = t.meta.current_snapshot()
    assert all(e.partition.get("bucket") is not None for e in snap.entries)


def test_zorder_compaction_preserves_partition_values(spark, tmp_path):
    t = _partitioned_table(spark, tmp_path)
    before = sorted(map(tuple, t.read().collect()))
    SortCompaction(
        t,
        CompactionConfig(enable_validate_compaction=True),
        sort_cols=["id", "bucket"],
        zorder=True,
    ).compact()
    after = t.read()
    assert after.filter(F.col("bucket").isNull()).count() == 0
    assert sorted(map(tuple, after.collect())) == before


# ---------------------------------------------------------------------------
# Partition-value typing round-trips (date / timestamp / boolean)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "dtype, values",
    [
        (
            T.DateType(),
            [datetime.date(2024, 1, 1), datetime.date(2024, 6, 30)],
        ),
        (
            T.TimestampNTZType(),
            [
                datetime.datetime(2024, 1, 1, 12, 30, 0),
                datetime.datetime(2024, 6, 30, 23, 59, 59),
            ],
        ),
        (T.BooleanType(), [True, False]),
        (T.LongType(), [7, 42]),
    ],
    ids=["date", "timestamp_ntz", "boolean", "long"],
)
def test_partition_value_type_roundtrip(spark, tmp_path, dtype, values):
    """Partition values live only in Hive directory names; the scan
    recovers them from the manifest via a cast back to the column type.
    Escaped characters (':' → %3A in timestamps) and each type's string
    form must survive the round trip."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("pk", dtype, True),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "typed"), schema, ["pk"])
    rows = [(i, values[i % len(values)]) for i in range(20)]
    t.append(spark.createDataFrame(rows, schema))
    got = t.read()
    assert got.filter(F.col("pk").isNull()).count() == 0
    got_vals = sorted({r.pk for r in got.select("pk").distinct().collect()})
    assert got_vals == sorted(set(values))
    # Full MoR lifecycle keeps the typed partition values too.
    Compaction(t, CompactionConfig(enable_validate_compaction=True)).compact()
    assert t.read().filter(F.col("pk").isNull()).count() == 0


def test_null_partition_value_roundtrip(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("pk", T.StringType(), True),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "nullpart"), schema, ["pk"])
    t.append(
        spark.createDataFrame([(1, "a"), (2, None), (3, "b")], schema)
    )
    got = sorted(map(tuple, t.read().collect()))
    assert got == [(1, "a"), (2, None), (3, "b")]


# ---------------------------------------------------------------------------
# delete_where: single job, no-match path commits nothing
# ---------------------------------------------------------------------------
def test_delete_where_no_match_commits_nothing(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.StringType(), False),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "dw"), schema)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    version = t.meta.version
    snap_count = len(t.meta.snapshots)
    assert t.delete_where(F.col("id") > 100) is None
    assert t.meta.version == version
    assert len(t.meta.snapshots) == snap_count
    assert t.read().count() == 2
    # Matching path still works.
    assert t.delete_where(F.col("id") == 1) is not None
    assert sorted(map(tuple, t.read().collect())) == [(2, "b")]


# ---------------------------------------------------------------------------
# Deterministic salts
# ---------------------------------------------------------------------------
def test_salted_join_is_deterministic_across_runs(spark):
    from bergloom_spark.operators.joins import salted_join

    fact = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k long, tag string")
    out1 = sorted(map(tuple, salted_join(fact, dim, on=["k"], n_salts=8).collect()))
    out2 = sorted(map(tuple, salted_join(fact, dim, on=["k"], n_salts=8).collect()))
    assert out1 == out2
    plain = sorted(map(tuple, fact.join(dim, "k").collect()))
    assert out1 == plain


def test_salted_join_salt_col_override(spark):
    from bergloom_spark.operators.joins import salted_join

    fact = spark.range(0, 1000).select(
        F.lit(1).cast("long").alias("k"), F.col("id").alias("rid")
    )
    dim = spark.createDataFrame([(1, "hot")], "k long, tag string")
    out = salted_join(fact, dim, on=["k"], n_salts=8, salt_col="rid")
    assert out.count() == 1000


# ---------------------------------------------------------------------------
# Type-strict oracle harness
# ---------------------------------------------------------------------------
def test_oracle_harness_flags_hugeint(spark):
    """The pre-fix events_json_rollup class of bug: DuckDB sum(BIGINT)
    returns HUGEINT (arrow decimal128) while Spark returns BIGINT —
    values identical, driver hash different. compare() must fail it."""
    con = duckdb.connect()
    sdf = spark.createDataFrame([(6,)], "s long")
    bad = compare(sdf, con, "SELECT sum(x)::HUGEINT AS s FROM (VALUES (1),(2),(3)) t(x)")
    assert bad["match"] is False and bad["why"] == "types"
    good = compare(sdf, con, "SELECT sum(x)::BIGINT AS s FROM (VALUES (1),(2),(3)) t(x)")
    assert good["match"] is True


def test_oracle_harness_still_checks_values(spark):
    con = duckdb.connect()
    sdf = spark.createDataFrame([(7,)], "s long")
    bad = compare(sdf, con, "SELECT 6::BIGINT AS s")
    assert bad["match"] is False and bad["why"] == "values"
