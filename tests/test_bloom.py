"""Bloom-filter pre-filtered join tests: exactness vs plain anti/semi
join, the zero-false-negative guarantee, and the routing property that
makes it a 100 TB pattern (the maybe-slice is small when overlap is)."""

from __future__ import annotations

import pyspark.sql.functions as F

from bergloom_spark.io import load_table
from bergloom_spark.operators.bloom import (
    bloom_anti_join,
    bloom_build,
    bloom_maybe_contains,
    bloom_semi_join,
)

N_BITS = 1 << 14
N_HASHES = 5


def _ids(df, col):
    return sorted(r[0] for r in df.select(col).collect())


def test_bloom_anti_join_equals_plain_anti(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    bad = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    got = bloom_anti_join(
        li, bad, "l_orderkey", "o_orderkey", n_bits=N_BITS, n_hashes=N_HASHES
    )
    want = li.join(
        bad.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey",
        "left_anti",
    )
    key = lambda df: sorted(  # noqa: E731
        (r.l_orderkey, r.l_linenumber) for r in df.collect()
    )
    assert key(got) == key(want)


def test_bloom_semi_join_equals_plain_semi(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select("o_orderkey")
    )
    got = bloom_semi_join(
        li, keys, "l_orderkey", "o_orderkey", n_bits=N_BITS, n_hashes=N_HASHES
    )
    want = li.join(
        keys.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey",
        "left_semi",
    )
    key = lambda df: sorted(  # noqa: E731
        (r.l_orderkey, r.l_linenumber) for r in df.collect()
    )
    assert key(got) == key(want)


def test_no_false_negatives(spark):
    """Every inserted key must probe as 'maybe' — the property the
    exactness proof rests on."""
    keys = spark.range(0, 5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    words = bloom_build(keys, "k", n_bits=N_BITS, n_hashes=N_HASHES)
    words_df = spark.createDataFrame([(words,)], "__bloom_words: array<bigint>")
    probed = keys.crossJoin(F.broadcast(words_df)).select(
        bloom_maybe_contains(
            F.col("k"), F.col("__bloom_words"), N_BITS, N_HASHES
        ).alias("m")
    )
    assert probed.filter(~F.col("m")).count() == 0


def test_false_positive_rate_reasonable(spark):
    """Non-members should mostly probe 'definitely absent' — that is
    the routing property: at 10 bits/key the maybe-slice of a
    disjoint corpus stays ~1%, so ~99% of rows skip the join."""
    keys = spark.range(0, 1000).select(
        F.concat(F.lit("in"), F.col("id")).alias("k")
    )
    words = bloom_build(keys, "k", n_bits=N_BITS, n_hashes=N_HASHES)
    words_df = spark.createDataFrame([(words,)], "__bloom_words: array<bigint>")
    outside = spark.range(0, 10000).select(
        F.concat(F.lit("out"), F.col("id")).alias("k")
    )
    n_maybe = (
        outside.crossJoin(F.broadcast(words_df))
        .filter(
            bloom_maybe_contains(
                F.col("k"), F.col("__bloom_words"), N_BITS, N_HASHES
            )
        )
        .count()
    )
    assert n_maybe / 10000 < 0.05


def test_build_is_deterministic(spark):
    keys = spark.range(0, 300).select(F.col("id").cast("string").alias("k"))
    w1 = bloom_build(keys, "k", n_bits=N_BITS, n_hashes=N_HASHES)
    w2 = bloom_build(keys.repartition(7), "k", n_bits=N_BITS, n_hashes=N_HASHES)
    assert w1 == w2


def test_rejects_non_power_of_two():
    import pytest

    with pytest.raises(ValueError):
        bloom_build(None, "k", n_bits=1000)


def test_passthrough_branch_is_join_free(spark, sf_dir):
    """The scale property itself: with a literal-sized filter, the
    definitely-absent branch must be a pure scan→filter projection —
    no join, no shuffle — and the whole bloom anti join carries exactly
    one real join (the exact verify on the maybe-slice)."""
    from bergloom_spark.plans import explain as X

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    keys = load_table(spark, sf_dir, "orders").select("o_orderkey").limit(100)
    words = bloom_build(keys, "o_orderkey", n_bits=N_BITS, n_hashes=N_HASHES)
    flagged = li.withColumn("__bloom_words", F.lit(words))
    passed = flagged.filter(
        ~bloom_maybe_contains(
            F.col("l_orderkey"), F.col("__bloom_words"), N_BITS, N_HASHES
        )
    ).drop("__bloom_words")
    plan = X.executed_plan(passed)
    assert "Join" not in plan, plan
    assert X.count_shuffles(passed) == 0
    full = bloom_anti_join(
        li, keys, "l_orderkey", "o_orderkey", n_bits=N_BITS, n_hashes=N_HASHES
    )
    fplan = X.executed_plan(full)
    assert fplan.count("Join") <= 2  # exact anti join (+key distinct exchange)
