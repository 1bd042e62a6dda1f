"""Operator unit tests mirroring the reference's inline suites for
``split_n_vecs`` (balance/determinism, iceberg_file_task_scan.rs:545-556),
``RecordBatchBuffer`` (:579-767) and the rolling thresholds
(rolling_iceberg_writer.rs:138-179)."""

from __future__ import annotations

from bergloom_spark.lake.writer import need_build_new_file, plan_output_files
from bergloom_spark.operators.tasks import coalesce_batches, split_n_vecs


def test_split_balance():
    tasks = [100, 100, 100, 100, 50, 50, 50, 50]
    groups = split_n_vecs(tasks, 4, weight=lambda t: t)
    assert sorted(sum(g) for g in groups) == [150, 150, 150, 150]


def test_split_empty_single_uneven():
    assert split_n_vecs([], 3, weight=lambda t: t) == [[], [], []]
    assert split_n_vecs([7], 3, weight=lambda t: t) == [[7], [], []]
    groups = split_n_vecs([10, 1, 1, 1], 2, weight=lambda t: t)
    assert sorted(sum(g) for g in groups) == [3, 10]


def test_split_deterministic_10k():
    tasks = [(i * 37) % 101 + 1 for i in range(50)]
    first = split_n_vecs(tasks, 8, weight=lambda t: t)
    for _ in range(10_000):
        assert split_n_vecs(tasks, 8, weight=lambda t: t) == first


def test_coalesce_passthrough_and_overflow():
    # Large batch passes through alone; small ones accumulate to ~max.
    assert coalesce_batches([2000], 1024) == [[2000]]
    assert coalesce_batches([500, 500, 500], 1024) == [[500, 500], [500]]
    assert coalesce_batches([500, 2000, 500], 1024) == [[500], [2000], [500]]
    # Exact fill then finish.
    assert coalesce_batches([512, 512, 100], 1024) == [[512, 512], [100]]
    assert coalesce_batches([], 1024) == []


def test_rolling_thresholds_boundaries():
    # rolling_iceberg_writer.rs:138-179 uses target=1000 with boundary
    # values 700/701 and 1500/1501.
    target = 1000
    assert not need_build_new_file(0, 1501, target)      # <10% written
    assert not need_build_new_file(99, 2000, target)     # still <10%
    assert need_build_new_file(100, 1500, target)        # hard: >150%
    assert not need_build_new_file(100, 1400, target)    # ≤150%, written ≤70%
    assert need_build_new_file(701, 400, target)         # soft: >target & >70%
    assert not need_build_new_file(700, 400, target)     # exactly 70% fails >
    assert not need_build_new_file(701, 299, target)     # not past target


def test_plan_output_files():
    target = 1000
    assert plan_output_files([100] * 5, target) == 1
    assert plan_output_files([800, 800, 800], target) == 3
    assert plan_output_files([], target) == 1
