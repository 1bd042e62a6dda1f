"""as-of and interval join tests (vs DuckDB ASOF JOIN / correlated SQL)."""

from __future__ import annotations

import pyspark.sql.functions as F

from bergloom_spark.io import load_table
from bergloom_spark.operators.joins import asof_join, interval_count_join
from tests.oracle_utils import compare, duck_connection


def test_asof_join_semantics(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("A", 9, 12.0), ("B", 3, 99.0)],
        "sym string, t long, px double",
    ).withColumn("ts", F.timestamp_seconds("t")).drop("t")
    trades = spark.createDataFrame(
        [("A", 4), ("A", 5), ("A", 20), ("B", 1), ("C", 7)],
        "sym string, t long",
    ).withColumn("ts", F.timestamp_seconds("t")).drop("t")
    out = asof_join(trades, quotes, on="sym", right_value_cols=["px"])
    by_key = {(r.sym, int(r.ts.timestamp())): r.px_asof for r in out.collect()}
    assert by_key[("A", 4)] == 10.0   # latest quote at t<=4 is t=1
    assert by_key[("A", 5)] == 11.0   # inclusive: quote at t=5 matches
    assert by_key[("A", 20)] == 12.0
    assert by_key[("B", 1)] is None   # quote at t=3 is in the future
    assert by_key[("C", 7)] is None   # no key match


def test_asof_join_vs_duckdb_asof(spark, sf_dir):
    # purchases matched to the latest prior-or-equal view of same user.
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts"), F.col("event_id").alias("view_event_id")
    )
    out = asof_join(
        purchases, views, on="user_id", right_value_cols=["view_event_id"]
    ).select("event_id", "user_id", "view_event_id_asof", F.col("ts_asof"))
    con = duck_connection(sf_dir)
    report = compare(
        out,
        con,
        """
        SELECT p.event_id, p.user_id,
               v.event_id AS view_event_id_asof, v.ts AS ts_asof
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts
        """,
    )
    con.close()
    assert report["match"], report


def test_interval_count_join_vs_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = interval_count_join(
        ev,
        key="user_id",
        ts_col="ts",
        anchor_filter=(F.col("event_type") == "error"),
        window_seconds=600,
        id_col="event_id",
    )
    con = duck_connection(sf_dir)
    report = compare(
        out,
        con,
        """
        SELECT e.event_id,
               (SELECT count(*) FROM events o
                WHERE o.user_id = e.user_id
                  AND o.ts >= e.ts - INTERVAL 10 MINUTE
                  AND o.ts < e.ts) AS n_prior
        FROM events e WHERE e.event_type = 'error'
        """,
    )
    con.close()
    assert report["match"], report


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must not change the result — only the key distribution."""
    from bergloom_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(orders, on=["l_orderkey"]).groupBy("o_orderpriority").count()
    salted = (
        salted_join(li, orders, on=["l_orderkey"], n_salts=8)
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    """A monster key must spread across n_salts distinct salt values."""
    from bergloom_spark.operators.joins import salted_join

    hot = spark.range(10000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([(7, "x")], "k long, tag string")
    out = salted_join(hot, dim, on=["k"], n_salts=8)
    assert out.count() == 10000
    # Re-derive the salt distribution the operator used.
    salt = F.pmod(F.xxhash64(F.col("k"), F.monotonically_increasing_id()), F.lit(8))
    n_distinct = hot.select(salt.alias("s")).distinct().count()
    assert n_distinct == 8


def test_asof_join_bucketed_parity(spark, sf_dir):
    """Bucketed (hot-key-safe) as-of must equal the plain as-of on real
    events — including tight buckets that force many carry boundaries."""
    from bergloom_spark.operators.joins import asof_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts"), F.col("event_id").alias("view_event_id")
    )
    plain = asof_join(
        purchases, views, on="user_id", right_value_cols=["view_event_id"]
    ).select("event_id", "user_id", "view_event_id_asof", "ts_asof")
    for bucket_seconds in (3600, 86400 * 30):
        bucketed = asof_join_bucketed(
            purchases,
            views,
            on="user_id",
            right_value_cols=["view_event_id"],
            bucket_seconds=bucket_seconds,
        ).select("event_id", "user_id", "view_event_id_asof", "ts_asof")
        assert sorted(map(tuple, bucketed.collect())) == sorted(
            map(tuple, plain.collect())
        ), f"bucket_seconds={bucket_seconds}"


def test_asof_join_bucketed_hot_key(spark):
    """One monster key: every left row still gets the right carry value
    even when its bucket holds no right rows at all."""
    import datetime

    from bergloom_spark.operators.joins import asof_join_bucketed

    base = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, "hot", base + datetime.timedelta(minutes=i)) for i in range(500)]
        + [(9000, "cold", base + datetime.timedelta(hours=3))],
        "event_id long, user_id string, ts timestamp_ntz",
    )
    # Right rows only in the first hour → later buckets rely on carry.
    right = spark.createDataFrame(
        [("hot", base + datetime.timedelta(minutes=m), m) for m in (0, 30, 59)],
        "user_id string, ts timestamp_ntz, v long",
    )
    out = asof_join_bucketed(
        left, right, on="user_id", right_value_cols=["v"], bucket_seconds=600
    )
    got = {r.event_id: r.v_asof for r in out.collect()}
    assert got[9000] is None  # cold key: nothing to match
    assert got[0] == 0 and got[29] == 0 and got[30] == 30
    assert got[59] == 59 if 59 in got else True
    assert got[60] == 59 and got[499] == 59  # carried across empty buckets


# ---------------------------------------------------------------------------
# range_lookup (round 2): bucketized scalar-vs-interval join
# ---------------------------------------------------------------------------
def test_range_lookup_semantics_and_plan(spark):
    import pyspark.sql.functions as F

    from bergloom_spark.operators.joins import range_lookup
    from bergloom_spark.plans import explain as X

    fact = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 25.0), (4, 99.0), (5, -3.0)],
        "id: long, v: double",
    )
    dim = spark.createDataFrame(
        [
            (0.0, 9.99, "a"),
            (10.0, 19.99, "b"),
            (15.0, 30.0, "c"),   # overlaps b
        ],
        "lo: double, hi: double, tag: string",
    )
    out = range_lookup(fact, dim, "v", bucket_width=10.0, how="left")
    rows = sorted((r["id"], r["tag"]) for r in out.collect())
    # 1→a; 2→b (10.0 inclusive lo); 3→c; 4→no match; 5→no match
    assert rows == [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, None)]
    # the plan must be a hash join on the bucket, not a nested loop
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_lookup_overlapping_ranges_emit_per_match(spark):
    from bergloom_spark.operators.joins import range_lookup

    fact = spark.createDataFrame([(1, 17.0)], "id: long, v: double")
    dim = spark.createDataFrame(
        [(10.0, 19.99, "b"), (15.0, 30.0, "c")],
        "lo: double, hi: double, tag: string",
    )
    out = range_lookup(fact, dim, "v", bucket_width=10.0, how="inner")
    assert sorted(r["tag"] for r in out.collect()) == ["b", "c"]


def test_range_lookup_wide_range_spans_buckets(spark):
    from bergloom_spark.operators.joins import range_lookup

    fact = spark.createDataFrame(
        [(1, 5.0), (2, 95.0)], "id: long, v: double"
    )
    dim = spark.createDataFrame(
        [(0.0, 100.0, "all")], "lo: double, hi: double, tag: string"
    )
    out = range_lookup(fact, dim, "v", bucket_width=10.0, how="inner")
    assert sorted(r["id"] for r in out.collect()) == [1, 2]
