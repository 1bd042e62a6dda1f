"""Event-sequence analytics: ordered funnels and retention cohorts.

Product-analytics operators over an append-only event stream (the
shape ClickHouse's ``windowFunnel``/``retention`` and the reference's
rollup consumers serve). Both are single-shuffle plans:

- Funnel: one hash aggregation per user computes the earliest
  *ordered* completion time of each step with conditional ``min``
  composed left-to-right (step k's timestamp only counts when it
  follows step k-1's). A second tiny aggregation counts users per
  reached depth. No self-joins — the classic N-way join formulation
  shuffles the event table once per step; this shuffles it once total.
- Retention: each user's cohort (first-activity period) computes in
  the same per-user aggregation as their activity periods; the
  (cohort, period) matrix is a second small aggregation.

Both stay entirely in JVM expressions — no UDFs, no driver loops —
and scale as one wide shuffle keyed by user, with AQE handling skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_depths(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered-funnel depth: how many of ``steps`` each user
    completed *in order* (step k counted only when it occurs strictly
    after the user's earliest ordered completion of step k-1).

    Returns (user_col, depth). Ties (equal timestamps) do not advance
    the funnel — strict ``>`` keeps semantics deterministic.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    # One aggregation collects each step's timestamps per user (nested
    # aggregates are illegal, so the ordered-min chain runs as scalar
    # array expressions on the aggregated row: t0 = min(step0 times),
    # tk = min(step k times AFTER t(k-1)) via filter + array_min —
    # null propagation gives "never reached" for free). Per-user array
    # size is the user's per-step event count — bounded by the same
    # per-key skew every groupBy(user) already has.
    per_user = events.groupBy(user_col).agg(
        *[
            F.collect_list(
                F.when(F.col(type_col) == step, F.col(ts_col))
            ).alias(f"__s{i}")
            for i, step in enumerate(steps)
        ]
    )
    def _after(lo):
        # Closure, not a default arg: F.filter reads the lambda's arity
        # and a defaulted second parameter would become a (x, i) lambda.
        return lambda x: x > lo

    t_prev = F.array_min(F.col("__s0"))
    depth = t_prev.isNotNull().cast("int")
    for i in range(1, len(steps)):
        t_prev = F.array_min(F.filter(F.col(f"__s{i}"), _after(t_prev)))
        depth = depth + t_prev.isNotNull().cast("int")
    return per_user.select(F.col(user_col), depth.alias("depth"))


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion table: for each step index (1-based), the
    number of users whose ordered depth reaches at least that step.
    Returns (step, step_name, users) — monotonically non-increasing.
    """
    depths = funnel_depths(events, steps, user_col, ts_col, type_col)
    by_depth = depths.filter(F.col("depth") > 0).groupBy("depth").agg(
        F.count(F.lit(1)).alias("n")
    )
    # users(step) = Σ n over observed depths ≥ step — a ≥-join against
    # the depth histogram (≤ len(steps) rows; an exact-depth join would
    # drop steps no user stopped at exactly).
    steps_df = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, step_name string"
    )
    return (
        steps_df.join(by_depth, by_depth.depth >= steps_df.step, "left")
        .groupBy("step", "step_name")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("users"))
    )


def funnel_counts_sql(
    steps: Sequence[str],
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`funnel_counts` (same collected-array
    ordered-min construction, same strict-inequality tie rule)."""
    collects = ", ".join(
        f"list({ts_col}) FILTER (WHERE {type_col} = '{step}') AS s{i}"
        for i, step in enumerate(steps)
    )
    # Chain the ordered mins through CTE stages (t(k) references
    # t(k-1), which a single SELECT list cannot do).
    stages = ["SELECT *, list_min(s0) AS t0 FROM per_user"]
    for i in range(1, len(steps)):
        stages.append(
            f"SELECT *, list_min(list_filter(s{i}, x -> x > t{i - 1}))"
            f" AS t{i} FROM stage{i - 1}"
        )
    stage_ctes = ", ".join(
        f"stage{i} AS ({sql})" for i, sql in enumerate(stages)
    )
    depth = " + ".join(
        f"(t{i} IS NOT NULL)::INT" for i in range(len(steps))
    )
    names = ", ".join(
        f"({i + 1}, '{s}')" for i, s in enumerate(steps)
    )
    return f"""
      WITH per_user AS (
        SELECT {user_col}, {collects}
        FROM {table} GROUP BY {user_col}
      ), {stage_ctes},
      depths AS (
        SELECT {depth} AS depth FROM stage{len(steps) - 1}
      ), steps(step, step_name) AS (VALUES {names})
      SELECT s.step, s.step_name,
             (SELECT count(*) FROM depths d WHERE d.depth >= s.step)
               AS users
      FROM steps s
    """


def retention_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention: users bucketed by first-activity period; for
    each (cohort_period, periods_since) the count of cohort users
    active that period. Returns (cohort, period_offset, active_users).

    One shuffle on (user, period) for distinct activity, a per-user
    window min for the cohort, then a small matrix aggregation.
    """
    active = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc(period, F.col(ts_col)).alias("p"),
    ).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("u")
    with_cohort = active.withColumn("cohort", F.min("p").over(w))
    return (
        with_cohort.groupBy(
            F.col("cohort"),
            F.datediff(F.col("p"), F.col("cohort")).alias("days_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
        .select("cohort", "days_offset", "active_users")
    )


def retention_matrix_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> str:
    """DuckDB twin of :func:`retention_matrix`."""
    return f"""
      WITH active AS (
        -- ::TIMESTAMP: DuckDB date_trunc yields DATE, Spark yields
        -- TIMESTAMP; the driver hash is type-aware.
        SELECT DISTINCT {user_col} AS u,
               date_trunc('{period}', {ts_col})::TIMESTAMP AS p
        FROM {table}
      ), with_cohort AS (
        SELECT u, p, min(p) OVER (PARTITION BY u) AS cohort
        FROM active
      )
      SELECT cohort,
             datediff('day', cohort::DATE, p::DATE) AS days_offset,
             count(*) AS active_users
      FROM with_cohort
      GROUP BY ALL
    """
