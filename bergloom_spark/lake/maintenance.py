"""Threshold-driven table maintenance — the compaction-daemon loop.

The reference IS a compaction service: something watches tables and
rewrites them when debt accumulates (README.md:1-12). This module is
that watcher's decision logic as a deterministic, testable policy:
given a table's manifest (a driver-side O(n_files) read — no data
scan), decide which maintenance actions are due and run them:

1. ``rewrite_position_deletes`` when delete files exceed a cap or any
   delete row dangles (every MoR read pays per delete file);
2. ``BinpackCompaction`` when enough small files accumulate (every
   scan pays per-file open/footers);
3. ``expire_snapshots`` + ``remove_orphan_files`` on retention policy.

Ordering matters: delete maintenance first (shrinks the anti-join
side binpack will re-read), then binpack, then metadata retention.
Each action commits separately through the retrying CAS, so a crashed
daemon leaves a consistent table and the next run picks up where it
stopped. Reads are unchanged by construction — every action is a
rewrite, never a semantic change.

At 100 TB the same policy runs per-table on a schedule; thresholds
are the knobs (more frequent small appends ⇒ lower
``min_small_files``, streaming CDC ⇒ lower ``max_delete_files``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from bergloom_spark.config import CompactionConfig
from bergloom_spark.lake import metadata as md
from bergloom_spark.lake.compaction import (
    BinpackCompaction,
    expire_snapshots,
    remove_orphan_files,
    rewrite_position_deletes,
)
from bergloom_spark.lake.table import LakeTable

__all__ = ["MaintenancePolicy", "MaintenanceReport", "run_maintenance"]


@dataclass
class MaintenancePolicy:
    # binpack when at least this many data files are below the size cut
    small_file_threshold: int = 32 * 1024 * 1024
    min_small_files: int = 4
    # fold delete files when more than this many positional-delete
    # files are live
    max_delete_files: int = 2
    # snapshot retention; None disables
    expire_keep_last: int | None = None
    orphan_older_than_s: float | None = None
    compaction: CompactionConfig = field(default_factory=CompactionConfig)


@dataclass
class MaintenanceReport:
    deletes_rewritten: bool = False
    binpacked: bool = False
    # which compaction strategy the binpack step ran ("" = none)
    strategy: str = ""
    snapshots_expired: int = 0
    orphans_removed: int = 0
    small_files_before: int = 0
    delete_files_before: int = 0


def _counts(table: LakeTable, policy: MaintenancePolicy) -> tuple[int, int]:
    snap = table.meta.current_snapshot()
    if snap is None:
        return 0, 0
    small = sum(
        1
        for e in snap.files(md.DATA)
        if e.file_size_bytes < policy.small_file_threshold
    )
    n_deletes = len(snap.files(md.POS_DELETE))
    return small, n_deletes


def run_maintenance(
    table: LakeTable, policy: MaintenancePolicy | None = None
) -> MaintenanceReport:
    """One maintenance cycle; safe to run on any table at any time."""
    policy = policy or MaintenancePolicy()
    table.refresh()
    report = MaintenanceReport()
    report.small_files_before, report.delete_files_before = _counts(
        table, policy
    )

    if report.delete_files_before > policy.max_delete_files:
        rewrite_position_deletes(table, policy.compaction)
        report.deletes_rewritten = True

    if report.small_files_before >= policy.min_small_files:
        # A declared clustering (write.sort-order) makes the fold
        # write its output range-clustered on the sort key — the cost
        # stays O(small-file debt), NEVER a full-table rewrite per
        # tick (a streaming table with maintain_every would otherwise
        # rewrite everything every N batches); a periodic full
        # re-cluster remains an explicit SortCompaction run. A
        # malformed property must not brick maintenance ("safe to run
        # on any table at any time") — fall back to plain binpack.
        try:
            order = table.sort_order()
        except ValueError:
            order = None
        cols, zorder = order if order is not None else (None, False)
        try:
            BinpackCompaction(
                table,
                policy.compaction,
                small_file_threshold=policy.small_file_threshold,
                sort_cols=cols,
                zorder=zorder,
            ).compact()
            report.strategy = "sorted-binpack" if cols else "binpack"
        except Exception as exc:
            # Parse-time validation can't prove runtime viability
            # (e.g. zorder over a parseable-but-non-interleavable
            # column): a failing SORTED rewrite must degrade to plain
            # binpack, not brick every maintenance tick for this table
            # (advice r4). A failed attempt commits nothing (commit is
            # the rewrite's last step), so the retry is clean.
            # The fallback is for DETERMINISTIC planning/expression
            # errors only (advice r5): a transient runtime failure
            # (executor loss, OOM, filesystem hiccup) would succeed on
            # a plain retry WITH the declared clustering — degrading it
            # to unsorted binpack folds the debt without the sort, so
            # re-raise those, exactly like the CAS-conflict path
            # (CommitConflict/CommitFailed, which degrading would also
            # defer indefinitely — review r5).
            from pyspark.errors import AnalysisException

            deterministic = isinstance(
                exc, (AnalysisException, ValueError, TypeError)
            )
            if not cols or not deterministic:
                raise
            BinpackCompaction(
                table,
                policy.compaction,
                small_file_threshold=policy.small_file_threshold,
            ).compact()
            report.strategy = "binpack(sorted-fallback)"
        report.binpacked = True

    if policy.expire_keep_last is not None:
        report.snapshots_expired = expire_snapshots(
            table, keep_last=policy.expire_keep_last
        )
    if policy.orphan_older_than_s is not None:
        report.orphans_removed = remove_orphan_files(
            table, older_than_s=policy.orphan_older_than_s
        )
    return report
