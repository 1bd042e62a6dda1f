from __future__ import annotations

import datetime as dt

from bergloom_spark.io import load_table
from bergloom_spark.operators import funnel as FN
from tests.oracle_utils import compare, duck_connection


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (uid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), et)
            for uid, m, et in rows
        ],
        "user_id long, ts timestamp_ntz, event_type string",
    )


def test_funnel_requires_order(spark):
    # u1 completes in order; u2 purchased BEFORE clicking (depth 2);
    # u3 only viewed (depth 1); u4 never viewed (depth 0).
    ev = _ev(
        spark,
        [
            (1, 0, "view"), (1, 5, "click"), (1, 9, "purchase"),
            (2, 0, "view"), (2, 8, "click"), (2, 4, "purchase"),
            (3, 2, "view"),
            (4, 1, "click"), (4, 2, "purchase"),
        ],
    )
    depths = {
        r.user_id: r.depth
        for r in FN.funnel_depths(ev, ["view", "click", "purchase"]).collect()
    }
    assert depths == {1: 3, 2: 2, 3: 1, 4: 0}


def test_funnel_tie_does_not_advance(spark):
    # Click at the SAME timestamp as the view: strict > rejects it.
    ev = _ev(spark, [(1, 0, "view"), (1, 0, "click")])
    depths = {
        r.user_id: r.depth
        for r in FN.funnel_depths(ev, ["view", "click"]).collect()
    }
    assert depths == {1: 1}


def test_funnel_counts_monotone_and_labeled(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = FN.funnel_counts(ev, ["view", "click", "purchase"]).collect()
    by_step = {r.step: (r.step_name, r.users) for r in out}
    assert [by_step[i][0] for i in (1, 2, 3)] == ["view", "click", "purchase"]
    users = [by_step[i][1] for i in (1, 2, 3)]
    assert users[0] >= users[1] >= users[2] >= 0


def test_funnel_matches_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = FN.funnel_counts(ev, ["view", "click", "purchase"])
    report = compare(
        out,
        duck_connection(sf_dir),
        FN.funnel_counts_sql(["view", "click", "purchase"]),
    )
    assert report["match"], report


def test_retention_matches_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = FN.retention_matrix(ev, period="week")
    report = compare(
        out, duck_connection(sf_dir), FN.retention_matrix_sql(period="week")
    )
    assert report["match"], report


def test_retention_offsets_start_at_zero(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = FN.retention_matrix(ev, period="week").collect()
    assert all(r.days_offset >= 0 for r in rows)
    # Every cohort has an offset-0 row (its own first week).
    cohorts = {r.cohort for r in rows}
    zero = {r.cohort for r in rows if r.days_offset == 0}
    assert cohorts == zero
