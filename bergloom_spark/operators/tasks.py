"""Balanced task assignment (O3) and batch coalescing policy (O4).

In Spark these are built-in (file split packing via
``spark.sql.files.maxPartitionBytes`` / ``openCostInBytes``; batch
sizing via ``spark.sql.parquet.columnarReaderBatchSize``), but the
reference's deterministic heuristics are kept as pure, unit-tested
functions for parity and for driver-side planning of scan groups.

Reference: ``split_n_vecs`` (min-heap bin packing,
``iceberg_file_task_scan.rs:186-254``) and ``RecordBatchBuffer``
(``iceberg_file_task_scan.rs:44-98``).
"""

from __future__ import annotations

import heapq
from typing import Callable, Iterable, Sequence, TypeVar

T = TypeVar("T")


def split_n_vecs(
    tasks: Sequence[T], split_num: int, weight: Callable[[T], int]
) -> list[list[T]]:
    """Distribute ``tasks`` into ``split_num`` groups balanced by weight.

    Deterministic and stable: ties broken by group index, input order
    preserved within a group (the reference asserts 10k-iteration
    stability, ``iceberg_file_task_scan.rs:545-556``).
    """
    if split_num <= 0:
        raise ValueError("split_num must be positive")
    heap = [(0, idx) for idx in range(split_num)]
    heapq.heapify(heap)
    groups: list[list[T]] = [[] for _ in range(split_num)]
    for task in tasks:
        total, idx = heapq.heappop(heap)
        groups[idx].append(task)
        heapq.heappush(heap, (total + weight(task), idx))
    return groups


def coalesce_batches(
    sizes: Iterable[int], max_rows: int
) -> list[list[int]]:
    """Batch-coalescing policy (O4): group incoming batch row-counts so
    each emitted group holds ~``max_rows`` rows; an oversized batch
    passes through alone (``RecordBatchBuffer::add``,
    ``iceberg_file_task_scan.rs:44-98``)."""
    out: list[list[int]] = []
    buf: list[int] = []
    buffered = 0
    for size in sizes:
        if size >= max_rows:
            if buf:
                out.append(buf)
                buf, buffered = [], 0
            out.append([size])
            continue
        if buffered + size > max_rows:
            out.append(buf)
            buf, buffered = [], 0
        buf.append(size)
        buffered += size
    if buf:
        out.append(buf)
    return out
