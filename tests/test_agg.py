"""Skew-aware aggregation tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from bergloom_spark.io import load_table
from bergloom_spark.operators.agg import (
    approx_distinct,
    salted_group_count,
    two_phase_distinct_count,
)


def test_two_phase_distinct_equals_count_distinct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r.l_suppkey: r.n_parts
        for r in two_phase_distinct_count(
            li, "l_suppkey", "l_partkey", "n_parts"
        ).collect()
    }
    want = {
        r.l_suppkey: r.n
        for r in li.groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert got == want


def test_salted_group_count_equals_plain_count(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        r.event_type: r.n
        for r in salted_group_count(ev, "event_type", n_salts=8).collect()
    }
    want = {
        r.event_type: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    assert got == want


def test_approx_distinct_within_tolerance(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r.event_type: r.approx_distinct
        for r in approx_distinct(ev, "event_type", "user_id").collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)
