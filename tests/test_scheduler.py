"""Fleet maintenance scheduler (lake/scheduler.py, round 4) — the
reference roadmap's standalone scheduler component
(/root/reference/README.md:50-52)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bergloom_spark.lake import LakeTable
from bergloom_spark.lake import metadata as md
from bergloom_spark.lake.maintenance import MaintenancePolicy
from bergloom_spark.lake.scheduler import (
    MaintenanceScheduler,
    SchedulerConfig,
)


def _fragmented_table(spark, root, n_appends, rows_per=40, deletes=False):
    base = spark.range(200).select(
        "id", (F.col("id") % 7).alias("v")
    )
    t = LakeTable.create(spark, root, base.schema)
    for i in range(n_appends):
        t.append(
            base.filter(
                (F.col("id") >= i * rows_per)
                & (F.col("id") < (i + 1) * rows_per)
            )
        )
    if deletes:
        t.delete_where(F.col("id") % 10 == 3)
        t.delete_where(F.col("id") % 10 == 4)
        t.delete_where(F.col("id") % 10 == 5)
    return t


POLICY = MaintenancePolicy(min_small_files=4, max_delete_files=2)


def test_scores_rank_by_debt(spark, tmp_path):
    hot = _fragmented_table(spark, str(tmp_path / "hot"), 5, deletes=True)
    cool = _fragmented_table(spark, str(tmp_path / "cool"), 2)
    sched = MaintenanceScheduler(
        spark,
        [cool.meta.table_root, hot.meta.table_root],
        policy=POLICY,
    )
    scores = sched.scores()
    assert [s.root for s in scores] == [
        hot.meta.table_root,
        cool.meta.table_root,
    ]
    assert scores[0].debt > 1.0 > scores[1].debt
    assert scores[0].delete_files == 3
    assert scores[0].est_rewrite_bytes > 0


def test_budget_one_table_per_cycle_then_cooldown(spark, tmp_path):
    """With budget 1, the highest-debt table goes first; next cycle the
    cooled-down winner is skipped and the runner-up gets the slot."""
    a = _fragmented_table(spark, str(tmp_path / "a"), 6, deletes=True)
    b = _fragmented_table(spark, str(tmp_path / "b"), 5)
    expected = {
        root: {tuple(r) for r in LakeTable.load(spark, root).read().collect()}
        for root in (a.meta.table_root, b.meta.table_root)
    }
    sched = MaintenanceScheduler(
        spark,
        [a.meta.table_root, b.meta.table_root],
        policy=POLICY,
        config=SchedulerConfig(max_tables_per_cycle=1, cooldown_cycles=1),
    )
    r1 = sched.run_cycle()
    assert r1.scheduled == [a.meta.table_root]
    assert r1.skipped_budget == [b.meta.table_root]
    assert r1.reports[a.meta.table_root].binpacked

    r2 = sched.run_cycle()
    assert r2.scheduled == [b.meta.table_root]
    # the maintained table is below its thresholds now, so it isn't
    # even a candidate (actionability is checked before cooldown)
    assert a.meta.table_root not in r2.scheduled

    for root, want in expected.items():
        got = {
            tuple(r) for r in LakeTable.load(spark, root).read().collect()
        }
        assert got == want, f"maintenance changed reads for {root}"


def test_byte_budget_defers_but_first_pick_always_runs(spark, tmp_path):
    big = _fragmented_table(spark, str(tmp_path / "big"), 5, deletes=True)
    small = _fragmented_table(spark, str(tmp_path / "small"), 4)
    sched = MaintenanceScheduler(
        spark,
        [big.meta.table_root, small.meta.table_root],
        policy=POLICY,
        # budget of 1 byte: nothing fits, but the first pick runs
        # anyway so a single huge table can't deadlock the queue
        config=SchedulerConfig(
            max_rewrite_bytes_per_cycle=1, cooldown_cycles=0
        ),
    )
    rep = sched.run_cycle()
    assert rep.scheduled == [big.meta.table_root]
    assert rep.skipped_budget == [small.meta.table_root]


def test_failure_isolated_per_table(spark, tmp_path):
    """A root that cannot even be SCORED (missing/corrupt metadata)
    lands in errors and the rest of the fleet still gets its cycle."""
    ok = _fragmented_table(spark, str(tmp_path / "ok"), 5)
    bogus = str(tmp_path / "missing")
    with pytest.raises(Exception):
        LakeTable.load(spark, bogus)
    sched = MaintenanceScheduler(
        spark, [bogus, ok.meta.table_root], policy=POLICY
    )
    rep = sched.run_cycle()
    assert rep.scheduled == [ok.meta.table_root]
    assert list(rep.errors) == [bogus]


def test_sub_threshold_debt_never_scheduled(spark, tmp_path):
    """A table whose fractional debt components SUM past 1.0 while
    each stays below its action threshold (here 2/4 small + 2/3
    deletes = 1.17) must not be scheduled — run_maintenance would do
    nothing and the scheduler would reschedule it forever (caught by
    the lakehouse demo's fleet converging loop)."""
    t = _fragmented_table(spark, str(tmp_path / "t"), 2)
    t.delete_where(F.col("id") % 10 == 3)
    t.delete_where(F.col("id") % 10 == 4)
    sched = MaintenanceScheduler(
        spark, [t.meta.table_root], policy=POLICY,
    )
    score = sched.scores()[0]
    assert score.debt > 1.0 and not score.actionable
    reps = sched.run_until_clean(max_cycles=4)
    assert all(not rep.scheduled for rep in reps)
    assert len(reps) == 1  # terminates immediately, no cooldown churn


def test_run_until_clean_converges(spark, tmp_path):
    a = _fragmented_table(spark, str(tmp_path / "a"), 6, deletes=True)
    b = _fragmented_table(spark, str(tmp_path / "b"), 5)
    sched = MaintenanceScheduler(
        spark,
        [a.meta.table_root, b.meta.table_root],
        policy=POLICY,
        config=SchedulerConfig(max_tables_per_cycle=1, cooldown_cycles=1),
    )
    reps = sched.run_until_clean()
    maintained = [r for rep in reps for r in rep.scheduled]
    assert set(maintained) >= {a.meta.table_root, b.meta.table_root}
    # converged: no table would trigger any maintenance action
    for score in sched.scores():
        assert not score.actionable
    # delete files actually folded (rewrite merges N → 1; it never
    # applies deletes to data, so 1 file legitimately remains)
    snap = LakeTable.load(spark, a.meta.table_root).meta.current_snapshot()
    assert len(list(snap.files(md.POS_DELETE))) <= 1
