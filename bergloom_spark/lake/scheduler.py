"""Fleet maintenance scheduler — the reference roadmap's "Standalone
scheduler component" (/root/reference/README.md:50-52).

``run_maintenance`` (lake/maintenance.py) answers *what to do* for ONE
table; a compaction service also has to answer *which tables, when,
and how much* across a whole catalog. This module is that layer as a
deterministic, testable policy:

- **Debt scoring** — each cycle every table's manifest is read
  driver-side (O(n_files) metadata, no Spark job, no data scan) and
  scored for how far past its maintenance thresholds it is. Scoring a
  10k-table fleet costs 10k manifest reads and zero cluster work.
- **Budgeted selection** — tables are taken in debt order until the
  cycle budget (``max_tables_per_cycle``/``max_rewrite_bytes_per_cycle``)
  is spent, so a fleet-wide debt spike degrades to *prioritized
  backlog*, never to an unbounded rewrite storm competing with
  production queries for the cluster.
- **Cooldown** — a just-maintained table is skipped for
  ``cooldown_cycles`` so steady trickle-appends don't starve other
  tables of the budget.
- **Failure isolation** — one table's failure (corrupted metadata, a
  concurrent writer exhausting commit retries) is recorded and the
  cycle continues; the scheduler itself never dies with a table.

Every action goes through ``run_maintenance``'s retrying CAS commits,
so a crashed scheduler leaves every table consistent and the next
cycle picks up where it stopped — the same crash contract as the
single-table daemon. Reads are unchanged by construction (maintenance
only rewrites).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from bergloom_spark.lake import metadata as md
from bergloom_spark.lake.maintenance import (
    MaintenancePolicy,
    MaintenanceReport,
    run_maintenance,
)
from bergloom_spark.lake.table import LakeTable

__all__ = [
    "SchedulerConfig",
    "TableDebt",
    "CycleReport",
    "MaintenanceScheduler",
]


@dataclass
class SchedulerConfig:
    # hard cap on tables maintained per cycle (None = unbounded)
    max_tables_per_cycle: int | None = 4
    # budget on estimated bytes rewritten per cycle (None = unbounded);
    # the first over-budget table still runs if nothing ran yet, so a
    # single huge table can't deadlock the queue
    max_rewrite_bytes_per_cycle: int | None = None
    # a maintained table is not rescored for this many cycles
    cooldown_cycles: int = 1
    # extra debt floor on top of actionability (raise above 1.0 to
    # only service tables well past their thresholds)
    min_debt: float = 1.0


@dataclass
class TableDebt:
    root: str
    debt: float
    est_rewrite_bytes: int
    small_files: int
    delete_files: int
    # True iff run_maintenance would actually DO something — the
    # scheduling gate mirrors the action triggers exactly, so a
    # scheduled table always reduces its debt (a sum-of-fractions
    # gate could otherwise schedule a table on which no action
    # fires, rescheduling it forever)
    actionable: bool = False


@dataclass
class CycleReport:
    cycle: int
    scheduled: list[str] = field(default_factory=list)
    skipped_budget: list[str] = field(default_factory=list)
    skipped_cooldown: list[str] = field(default_factory=list)
    reports: dict[str, MaintenanceReport] = field(default_factory=dict)
    errors: dict[str, str] = field(default_factory=dict)


def _score(table: LakeTable, policy: MaintenancePolicy) -> TableDebt:
    """Debt = how many thresholds the table has crossed, fractionally.

    1.0 means "exactly at a threshold"; 3.0 means "3× past" — the
    units make debt comparable across tables with different policies.
    The rewrite estimate is the bytes binpack + delete-fold would
    re-read/write (small data files + delete files), which is what the
    byte budget meters.
    """
    snap = table.meta.current_snapshot()
    if snap is None:
        return TableDebt(table.meta.table_root, 0.0, 0, 0, 0)
    small = [
        e
        for e in snap.files(md.DATA)
        if e.file_size_bytes < policy.small_file_threshold
    ]
    deletes = list(snap.files(md.POS_DELETE))
    debt = 0.0
    if policy.min_small_files > 0:
        debt += len(small) / policy.min_small_files
    debt += len(deletes) / (policy.max_delete_files + 1)
    est = sum(e.file_size_bytes for e in small) + sum(
        e.file_size_bytes for e in deletes
    )
    actionable = (
        len(small) >= policy.min_small_files
        or len(deletes) > policy.max_delete_files
    )
    return TableDebt(
        table.meta.table_root,
        debt,
        est,
        len(small),
        len(deletes),
        actionable,
    )


class MaintenanceScheduler:
    """Round-robin-free, debt-ordered maintenance over a table fleet."""

    def __init__(
        self,
        spark,
        table_roots: list[str],
        policy: MaintenancePolicy | None = None,
        config: SchedulerConfig | None = None,
        policies: dict[str, MaintenancePolicy] | None = None,
    ) -> None:
        self.spark = spark
        self.roots = list(table_roots)
        self.policy = policy or MaintenancePolicy()
        self.policies = policies or {}
        self.config = config or SchedulerConfig()
        self._cooldown_until: dict[str, int] = {}
        self._cycle = 0

    def _policy_for(self, root: str) -> MaintenancePolicy:
        return self.policies.get(root, self.policy)

    def scores(
        self, errors: dict[str, str] | None = None
    ) -> list[TableDebt]:
        """Current debt per table, highest first (driver-side only).
        A table that cannot even be scored (missing root, corrupt
        metadata) is recorded in ``errors`` and skipped — one broken
        table must not blind the scheduler to the rest of the fleet."""
        out = []
        for root in self.roots:
            try:
                table = LakeTable.load(self.spark, root)
                out.append(_score(table, self._policy_for(root)))
            except Exception as exc:  # noqa: BLE001 — isolate per table
                if errors is not None:
                    errors[root] = f"{type(exc).__name__}: {exc}"
        out.sort(key=lambda d: (-d.debt, d.root))
        return out

    def run_cycle(self) -> CycleReport:
        self._cycle += 1
        cfg = self.config
        report = CycleReport(cycle=self._cycle)
        spent_bytes = 0
        for debt in self.scores(errors=report.errors):
            if not debt.actionable or debt.debt < cfg.min_debt:
                continue
            if self._cooldown_until.get(debt.root, 0) >= self._cycle:
                report.skipped_cooldown.append(debt.root)
                continue
            if (
                cfg.max_tables_per_cycle is not None
                and len(report.scheduled) >= cfg.max_tables_per_cycle
            ):
                report.skipped_budget.append(debt.root)
                continue
            if (
                cfg.max_rewrite_bytes_per_cycle is not None
                and report.scheduled  # first pick always runs
                and spent_bytes + debt.est_rewrite_bytes
                > cfg.max_rewrite_bytes_per_cycle
            ):
                report.skipped_budget.append(debt.root)
                continue
            report.scheduled.append(debt.root)
            spent_bytes += debt.est_rewrite_bytes
            try:
                table = LakeTable.load(self.spark, debt.root)
                report.reports[debt.root] = run_maintenance(
                    table, self._policy_for(debt.root)
                )
                self._cooldown_until[debt.root] = (
                    self._cycle + cfg.cooldown_cycles
                )
            except Exception as exc:  # noqa: BLE001 — isolate per table
                report.errors[debt.root] = f"{type(exc).__name__}: {exc}"
        return report

    def run_until_clean(self, max_cycles: int = 16) -> list[CycleReport]:
        """Cycle until no table is past a threshold (or max_cycles).

        Cooldowns still apply between cycles, so convergence is
        gradual by design — the steady-state behavior of a daemon
        ticking on a schedule.
        """
        out = []
        for _ in range(max_cycles):
            rep = self.run_cycle()
            out.append(rep)
            if not rep.scheduled and not rep.skipped_cooldown:
                break
        return out
