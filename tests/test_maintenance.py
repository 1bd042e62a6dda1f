"""Threshold-driven maintenance loop (lake/maintenance.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bergloom_spark.lake import LakeTable
from bergloom_spark.lake import metadata as md
from bergloom_spark.lake.maintenance import MaintenancePolicy, run_maintenance


def _debt_table(spark, tmp_path, n_appends=5):
    base = spark.range(500).select(F.col("id"), (F.col("id") * 2).alias("v"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base.schema)
    per = 500 // n_appends
    for i in range(n_appends):
        t.append(base.filter((F.col("id") >= i * per) & (F.col("id") < (i + 1) * per)))
    return t, base


def test_below_thresholds_is_noop(spark, tmp_path):
    t, _ = _debt_table(spark, tmp_path, n_appends=2)
    v = t.meta.version
    report = run_maintenance(
        t, MaintenancePolicy(min_small_files=10, max_delete_files=5)
    )
    assert not report.binpacked and not report.deletes_rewritten
    assert t.meta.version == v


def test_binpack_fires_on_small_file_debt(spark, tmp_path):
    t, _ = _debt_table(spark, tmp_path, n_appends=5)
    before = sorted(r.id for r in t.read().collect())
    n_files = len(t.meta.current_snapshot().files(md.DATA))
    assert n_files >= 5
    report = run_maintenance(t, MaintenancePolicy(min_small_files=4))
    assert report.binpacked
    assert len(t.meta.current_snapshot().files(md.DATA)) < n_files
    assert sorted(r.id for r in t.read().collect()) == before


def test_delete_rewrite_fires_then_binpack(spark, tmp_path):
    t, _ = _debt_table(spark, tmp_path, n_appends=5)
    for m in (7, 11, 13):
        t.delete_where(F.col("id") % m == 0)
    before = sorted(r.id for r in t.read().collect())
    report = run_maintenance(
        t, MaintenancePolicy(min_small_files=4, max_delete_files=2)
    )
    assert report.deletes_rewritten and report.binpacked
    assert report.delete_files_before == 3
    snap = t.meta.current_snapshot()
    assert len(snap.files(md.POS_DELETE)) <= 1
    assert sorted(r.id for r in t.read().collect()) == before


def test_retention_runs_when_configured(spark, tmp_path):
    t, _ = _debt_table(spark, tmp_path, n_appends=4)
    report = run_maintenance(
        t,
        MaintenancePolicy(
            min_small_files=3,
            expire_keep_last=1,
            orphan_older_than_s=0.0,
        ),
    )
    assert report.binpacked
    assert report.snapshots_expired > 0
    assert len(t.refresh().meta.snapshots) >= 1
    # the table still reads fine after expiry + orphan sweep
    assert t.read().count() == 500


def test_maintenance_honors_declared_sort_order(spark, tmp_path):
    """A table with write.sort-order set re-clusters during the
    maintenance compaction: post-maintenance file min/max ranges on
    the sort key are disjoint (pruning-effective), and rows are
    unchanged."""
    from bergloom_spark.lake import metadata as md
    from bergloom_spark.lake.table import SORT_ORDER_PROP

    base = spark.range(2000).select(
        "id", (F.col("id") % 97).alias("k"), (F.col("id") * 3).alias("v")
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), base.schema)
    # interleaved appends: every file spans nearly the full k range
    for i in range(4):
        t.append(
            base.filter(F.col("id") % 4 == i),
            properties_update={SORT_ORDER_PROP: "k"} if i == 0 else None,
        )
    before = {tuple(r) for r in t.read().collect()}
    rep = run_maintenance(
        t, MaintenancePolicy(min_small_files=2)
    )
    assert rep.binpacked
    entries = t.refresh().meta.current_snapshot().files(md.DATA)
    ranges = sorted(
        (e.column_stats["k"][0], e.column_stats["k"][1]) for e in entries
    )
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping sorted ranges: {ranges}"
    assert {tuple(r) for r in t.read().collect()} == before


def test_sort_order_typo_rejected_at_write_site(spark, tmp_path):
    """Review r4: a typo'd sort-order column must fail the COMMIT that
    sets it, not every later maintenance run far from the cause."""
    from bergloom_spark.lake.table import SORT_ORDER_PROP

    base = spark.range(10).select("id", (F.col("id") % 3).alias("k"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base.schema)
    with pytest.raises(ValueError, match="unknown columns"):
        t.append(base, properties_update={SORT_ORDER_PROP: "nope"})
    # nothing committed
    assert t.refresh().meta.current_snapshot() is None


def test_maintenance_survives_preexisting_bad_sort_order(spark, tmp_path):
    """A bad property that predates validation (or a column dropped by
    schema evolution) must not brick maintenance — it falls back to
    plain binpack."""
    from bergloom_spark.lake.table import SORT_ORDER_PROP

    base = spark.range(200).select("id", (F.col("id") % 7).alias("k"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base.schema)
    for i in range(4):
        t.append(base.filter(F.col("id") % 4 == i))
    # plant the bad value behind the validator's back
    t.meta.properties[SORT_ORDER_PROP] = "gone"
    md.write_version(
        md.TableMetadata(**{**t.meta.__dict__, "version": t.meta.version + 1})
    )
    t = LakeTable.load(spark, t.meta.table_root)
    rep = run_maintenance(t, MaintenancePolicy(min_small_files=2))
    assert rep.binpacked and rep.strategy == "binpack"
    assert t.refresh().read().count() == 200


def test_sorted_rewrite_runtime_failure_degrades_to_binpack(
    spark, tmp_path, monkeypatch
):
    """Advice r4 + r5 refinement: parse-time validation can't prove a
    sort order is runtime-viable; a sorted rewrite failing with a
    DETERMINISTIC planning/expression error (AnalysisException /
    ValueError — e.g. zorder over a non-interleavable column) must
    fall back to plain binpack this tick instead of bricking every
    maintenance cycle. A TRANSIENT runtime failure (executor loss,
    OOM) must re-raise instead — a plain retry would have preserved
    the declared clustering (advice r5)."""
    import pytest

    import bergloom_spark.lake.maintenance as mt
    from bergloom_spark.lake.table import SORT_ORDER_PROP

    base = spark.range(500).select(F.col("id"), (F.col("id") * 2).alias("v"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base.schema)
    for i in range(4):
        t.append(
            base.filter(F.col("id") % 4 == i),
            properties_update={SORT_ORDER_PROP: "id"} if i == 0 else None,
        )

    real_compact = mt.BinpackCompaction.compact
    boom: dict = {"exc": ValueError("zorder: non-interleavable column")}

    def flaky(self):
        if getattr(self, "sort_cols", None):
            raise boom["exc"]
        return real_compact(self)

    monkeypatch.setattr(mt.BinpackCompaction, "compact", flaky)
    # transient failure first: must re-raise, debt untouched
    boom["exc"] = RuntimeError("executor lost mid-rewrite")
    with pytest.raises(RuntimeError, match="executor lost"):
        mt.run_maintenance(t, mt.MaintenancePolicy(min_small_files=2))
    # deterministic planning error: degrades to plain binpack
    boom["exc"] = ValueError("zorder: non-interleavable column")
    rep = mt.run_maintenance(t, mt.MaintenancePolicy(min_small_files=2))
    assert rep.binpacked and rep.strategy == "binpack(sorted-fallback)"
    assert t.refresh().read().count() == 500


def test_commit_conflict_does_not_degrade_sorted_rewrite(
    spark, tmp_path, monkeypatch
):
    """Review r5: a CAS loss is not a sort-order problem — degrading
    to unsorted binpack on CommitFailed would consume the small-file
    debt unsorted and defer the declared clustering indefinitely.
    Conflicts must re-raise for the caller's next tick."""
    import bergloom_spark.lake.maintenance as mt
    from bergloom_spark.lake.commit import CommitFailed
    from bergloom_spark.lake.table import SORT_ORDER_PROP

    base = spark.range(400).select(F.col("id"), (F.col("id") * 2).alias("v"))
    t = LakeTable.create(spark, str(tmp_path / "t"), base.schema)
    for i in range(4):
        t.append(
            base.filter(F.col("id") % 4 == i),
            properties_update={SORT_ORDER_PROP: "id"} if i == 0 else None,
        )

    def conflicted(self):
        raise CommitFailed("lost the CAS race")

    monkeypatch.setattr(mt.BinpackCompaction, "compact", conflicted)
    with pytest.raises(CommitFailed):
        mt.run_maintenance(t, mt.MaintenancePolicy(min_small_files=2))
