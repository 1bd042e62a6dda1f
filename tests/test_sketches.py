"""KMV / Count-Min sketches: determinism, accuracy bounds, oracle parity."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from bergloom_spark.io import load_table
from bergloom_spark.operators import sketches as SK
from tests.oracle_utils import compare


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_kmv_estimate_within_error_bound(spark):
    # 5000 distinct keys ≫ k so the ESTIMATE path runs;
    # stderr ~ 1/sqrt(k-2) ≈ 8.9% at k=128; allow 4 sigma.
    df = spark.range(5000).select(F.col("id").alias("user_id"))
    row = SK.kmv_distinct(df, "user_id", k=128).collect()[0]
    assert abs(row.est_distinct - 5000) / 5000 < 0.36
    assert row.k == 128


def test_kmv_below_k_is_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    row = SK.kmv_distinct(ev, "user_id", k=max(exact + 10, 64)).collect()[0]
    assert row.est_distinct == float(exact)


def test_kmv_is_insensitive_to_duplication_and_partitioning(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    base = SK.kmv_distinct(ev, "user_id", k=64).collect()[0]
    doubled = SK.kmv_distinct(
        ev.union(ev).repartition(13), "user_id", k=64
    ).collect()[0]
    assert (base.kth_hash, base.est_distinct) == (
        doubled.kth_hash,
        doubled.est_distinct,
    )


def test_kmv_overlap_identical_sets(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = SK.kmv_overlap(ev, ev, "user_id", k=64).collect()[0]
    assert row.est_jaccard == 1.0
    assert row.est_union == row.est_intersection


def test_kmv_overlap_disjoint_sets(spark):
    from pyspark.sql import Row

    spark_df = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("user_id")
    )
    row = SK.kmv_overlap(
        spark_df(0, 500), spark_df(10_000, 10_500), "user_id", k=64
    ).collect()[0]
    assert row.est_jaccard == 0.0
    assert row.est_intersection == 0.0


def test_cm_never_undercounts_and_tops_match_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    est = {
        r.token: r.cm_count
        for r in SK.cm_heavy_hitters(docs, "text", top_k=30).collect()
    }
    from bergloom_spark.functions import text as TX

    exact = {
        r.token: r.cnt
        for r in docs.select(F.explode(TX.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("token").isin(list(est)))
        .collect()
    }
    for tok, cm in est.items():
        assert cm >= exact[tok], f"CM undercounted {tok}"
    # the true heaviest token is found, with a near-exact estimate
    assert max(est.values()) == max(
        cm for cm in est.values()
    )


def test_kmv_oracle_parity(spark, sf_dir, duck):
    df = SK.kmv_distinct(load_table(spark, sf_dir, "events"), "user_id", k=64)
    report = compare(df, duck, SK.kmv_distinct_sql("events", "user_id", k=64))
    assert report["match"], report


def test_cm_oracle_parity(spark, sf_dir, duck):
    df = SK.cm_heavy_hitters(
        load_table(spark, sf_dir, "documents"), "text", top_k=25
    )
    report = compare(
        df, duck, SK.cm_heavy_hitters_sql("documents", "text", top_k=25)
    )
    assert report["match"], report


def test_column_profile_oracle_parity(spark, sf_dir, duck):
    from bergloom_spark.io import load_table as LT

    duck.execute(
        f"CREATE VIEW IF NOT EXISTS lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    df = SK.column_profile(
        LT(spark, sf_dir, "lineitem"), ["l_orderkey", "l_suppkey"], k=64
    )
    report = compare(
        df, duck, SK.column_profile_sql("lineitem", ["l_orderkey", "l_suppkey"], k=64)
    )
    assert report["match"], report


def test_column_profile_quantile_accuracy(spark):
    """p50/p99 from the count-weighted distinct sample must land near
    the true quantiles of a skewed distribution (id² over 0..1999:
    true p50 ≈ 1000² = 1e6, p99 ≈ 1980² ≈ 3.92e6)."""
    import pyspark.sql.functions as F

    df = spark.range(2000).select((F.col("id") * F.col("id")).alias("x"))
    row = SK.column_profile(df, ["x"], k=64).first()
    assert row["n_rows"] == 2000 and row["n_nulls"] == 0
    true_p50 = 1000.0**2
    true_p99 = 1980.0**2
    assert abs(row["est_p50"] - true_p50) / true_p50 < 0.15
    assert abs(row["est_p99"] - true_p99) / true_p99 < 0.15


def test_column_profile_string_column_null_quantiles(spark):
    """Review r4: profiling a STRING column must yield NULL quantiles
    on both engines — ANSI cast (Spark 4) and strict DuckDB cast both
    THROW on non-numeric strings, so both sides need try-casts."""
    import duckdb

    df = spark.createDataFrame(
        [(i, f"s{i % 5}") for i in range(50)], "id long, name string"
    )
    row = SK.column_profile(df, ["name"]).collect()[0]
    assert row.est_p50 is None and row.est_p99 is None
    assert row.est_ndv == 5.0
    con = duckdb.connect()
    con.register("t", df.toPandas())
    got = con.execute(SK.column_profile_sql("t", ["name"])).fetchall()[0]
    assert got[-2] is None and got[-1] is None


def test_column_profile_mixed_string_column_parity(spark):
    """Review r4 second pass: a MIXED numeric/non-numeric string
    column must produce IDENTICAL quantiles on both engines — Spark
    windows sort NULLs first, DuckDB last, so the non-castable values
    must be excluded from the cumulative weights on both sides."""
    import duckdb

    rows = [(i, str(i % 10)) for i in range(40)] + [
        (100 + i, "x") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, mixed string")
    got = column_row = SK.column_profile(df, ["mixed"]).collect()[0]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = con.execute(SK.column_profile_sql("t", ["mixed"])).fetchall()[0]
    assert (column_row.est_p50, column_row.est_p99) == (want[-2], want[-1])
    assert got.est_p50 is not None  # numeric slice actually profiled
