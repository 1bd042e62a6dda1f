from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from bergloom_spark.io import load_table
from bergloom_spark.operators import timeseries as TS
from tests.oracle_utils import compare


def _mk_series(spark):
    # One key, observations at 15-min buckets 0, 2, 5 (values 1, 5, 11):
    # gaps at 1, 3, 4 exercise both fill modes deterministically.
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(minutes=15 * i + 3), float(v))
        for i, v in [(0, 1), (2, 5), (5, 11)]
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp_ntz, value double")


def _vals(df):
    return {
        (r.k, r.bucket_ts.isoformat()): (r.v, r.v_filled)
        for r in df.collect()
    }


def test_locf_carries_forward(spark):
    out = TS.gapfill(
        _mk_series(spark), ["k"], "ts", "value", 15, method="locf"
    )
    got = _vals(out)
    assert len(got) == 6  # dense grid buckets 0..5
    assert got[("a", "2024-01-01T00:15:00")] == (None, 1.0)
    assert got[("a", "2024-01-01T00:45:00")] == (None, 5.0)
    assert got[("a", "2024-01-01T01:00:00")] == (None, 5.0)
    assert got[("a", "2024-01-01T01:15:00")] == (11.0, 11.0)


def test_interpolate_is_linear_between_neighbors(spark):
    out = TS.gapfill(
        _mk_series(spark), ["k"], "ts", "value", 15, method="interpolate"
    )
    got = _vals(out)
    # Between (0, 1.0) and (2, 5.0): bucket 1 = 3.0.
    assert got[("a", "2024-01-01T00:15:00")] == (None, 3.0)
    # Between (2, 5.0) and (5, 11.0): buckets 3, 4 = 7.0, 9.0.
    assert got[("a", "2024-01-01T00:45:00")] == (None, 7.0)
    assert got[("a", "2024-01-01T01:00:00")] == (None, 9.0)


def test_interpolate_edges_fall_back_to_nearest(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("a", base + dt.timedelta(minutes=20), 4.0),
            ("a", base + dt.timedelta(minutes=50), 8.0),
        ],
        "k string, ts timestamp_ntz, value double",
    )
    out = TS.gapfill(df, ["k"], "ts", "value", 15, method="interpolate")
    got = _vals(out)
    assert got[("a", "2024-01-01T00:30:00")] == (None, 6.0)


@pytest.mark.parametrize("method", ["locf", "interpolate"])
def test_gapfill_matches_duckdb_on_events(spark, sf_dir, method):
    ev = load_table(spark, sf_dir, "events")
    out = TS.gapfill(
        ev, ["event_type"], "ts", "value", bucket_minutes=15, method=method
    )
    sql = TS.gapfill_sql(
        ["event_type"], "ts", "value", "events",
        bucket_minutes=15, method=method,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    report = compare(out, con, sql)
    assert report["match"], report


# ---------------------------------------------------------------------------
# time_weighted_avg (round 2)
# ---------------------------------------------------------------------------
def test_twa_weighs_by_held_duration(spark):
    import datetime

    from bergloom_spark.operators.timeseries import time_weighted_avg

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def at(m, s=0):
        return t0 + datetime.timedelta(minutes=m, seconds=s)

    # one key, one 60-min bucket: value 10 held 0:00→0:30 (1800 s),
    # value 20 held 0:30→1:00 (1800 s) → twa = 15. The arithmetic mean
    # of a burst-skewed series would be wrong; plant a burst to prove
    # the weighting: three samples of 100 in the last minute hold
    # almost no time.
    rows = [
        ("k", at(0), 10.0),
        ("k", at(30), 20.0),
        ("b", at(0), 10.0),
        ("b", at(59), 100.0),
        ("b", at(59, 20), 100.0),
        ("b", at(59, 40), 100.0),
    ]
    df = spark.createDataFrame(rows, "key: string, ts: timestamp, value: double")
    out = {
        r["key"]: r["twa"]
        for r in time_weighted_avg(df, ["key"], "ts", "value", 60).collect()
    }
    assert out["k"] == 15.0
    # key b: 10 for 59 min, 100 for 1 min → (10*3540 + 100*60)/3600 = 11.5
    assert out["b"] == 11.5
    # the arithmetic mean would have said 77.5 — the burst dominates


def test_twa_duplicate_timestamps_deterministic(spark):
    import datetime

    from bergloom_spark.operators.timeseries import time_weighted_avg

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("k", t0, 5.0),
        ("k", t0, 7.0),  # same instant: 5.0 weighs 0, 7.0 holds on
    ]
    df = spark.createDataFrame(rows, "key: string, ts: timestamp, value: double")
    out = time_weighted_avg(df, ["key"], "ts", "value", 60).collect()
    assert out[0]["twa"] == 7.0


# ---------------------------------------------------------------------------
# hot-series pre-split (round 5, VERDICT r4 #4)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("method", ["locf", "interpolate"])
def test_gapfill_range_presplit_stitches_boundaries(spark, sf_dir, method):
    """With range_buckets small enough that every key spans MANY
    coarse ranges (including fully-empty ones), fill state must carry
    across range edges and match the range-agnostic DuckDB twin."""
    ev = load_table(spark, sf_dir, "events")
    out = TS.gapfill(
        ev, ["event_type"], "ts", "value",
        bucket_minutes=15, method=method, range_buckets=7,
    )
    sql = TS.gapfill_sql(
        ["event_type"], "ts", "value", "events",
        bucket_minutes=15, method=method,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    report = compare(out, con, sql)
    assert report["match"], report


def test_gapfill_empty_range_carries_through(spark):
    """A coarse range with ZERO observations sits between two observed
    ones: locf must carry the older value through it, interpolate must
    bridge across it."""
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("a", base, 2.0),
            # next observation 9 buckets later: with range_buckets=3
            # ranges 0,1,2 exist and range 1 is fully empty
            ("a", base + dt.timedelta(minutes=15 * 9), 20.0),
        ],
        "k string, ts timestamp_ntz, value double",
    )
    locf = _vals(
        TS.gapfill(df, ["k"], "ts", "value", 15, "locf", range_buckets=3)
    )
    assert locf[("a", "2024-01-01T01:00:00")] == (None, 2.0)  # range 1
    assert locf[("a", "2024-01-01T01:45:00")] == (None, 2.0)  # range 2
    interp = _vals(
        TS.gapfill(
            df, ["k"], "ts", "value", 15, "interpolate", range_buckets=3
        )
    )
    assert interp[("a", "2024-01-01T01:00:00")] == (None, 10.0)  # bucket 4
    assert interp[("a", "2024-01-01T01:30:00")] == (None, 14.0)  # bucket 6


def test_gapfill_fill_window_partitions_on_key_and_range(spark):
    """The expensive per-bucket window must partition on
    (keys, range_idx), not keys alone — one key's series is split
    across tasks (VERDICT r4 #4's 'done' criterion)."""
    out = TS.gapfill(
        _mk_series(spark), ["k"], "ts", "value", 15, method="interpolate"
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    # every window ordered by bucket_idx partitions by k AND range_idx
    ordered_by_bucket = [s for s in specs if "bucket_idx" in s]
    assert ordered_by_bucket
    for s in ordered_by_bucket:
        assert "range_idx" in s, s
