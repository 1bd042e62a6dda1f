"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2.8); these are the
unbounded counterparts of the batch dedup/session operators, with
explicit per-key state so semantics hold across micro-batches.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_seen(
    df: DataFrame,
    key_col: str,
    output_schema: str | None = None,
) -> DataFrame:
    """Exactly-once first-seen emission per key (streaming exact dedup).

    State per key: a single "seen" flag. A key's first arrival in any
    micro-batch emits one row; every later arrival is swallowed. This
    is the streaming analog of ``dedup.exact_dedup`` — state size is
    O(distinct keys), so at scale pair it with a TTL timeout or an
    upstream time-bucketed key.
    """
    output_schema = output_schema or f"{key_col} long, first_batch_rows long"

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            (seen,) = state.get
            if seen:
                return
        state.update((True,))
        yield pd.DataFrame({key_col: [key[0]], "first_batch_rows": [n]})

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_running_total(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running totals that survive micro-batch boundaries:
    emits (key, batch_rows, total_rows, total_value) once per key per
    micro-batch in which the key appears."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        rows = 0
        value = 0.0
        for pdf in pdfs:
            rows += len(pdf)
            value += float(pdf[value_col].sum())
        if state.exists:
            prev_rows, prev_value = state.get
        else:
            prev_rows, prev_value = 0, 0.0
        total_rows = prev_rows + rows
        total_value = prev_value + value
        state.update((total_rows, total_value))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "batch_rows": [rows],
                "total_rows": [total_rows],
                "total_value": [round(total_value, 2)],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{key_col} string, batch_rows long, total_rows long,"
            " total_value double"
        ),
        stateStructType="rows long, value double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_per_key_quota(
    df: DataFrame,
    key_col: str,
    quota: int,
) -> DataFrame:
    """Streaming ingestion cap: admit at most ``quota`` rows per key
    over the stream's lifetime — the unbounded counterpart of the
    batch ``per_key_quota`` (spam/flood control at the front door).

    State per key: rows consumed so far. Each micro-batch in which a
    key arrives emits one row (key, batch_taken, total_taken) with
    ``total_taken`` capped at the quota. ``total_taken`` of a key's
    LAST emission equals min(total_arrivals, quota) regardless of how
    arrivals split into micro-batches — the batch-invariant projection
    the oracle checks. State is one long per key; pair with a TTL
    timeout when the key space is unbounded and the cap is per epoch.
    """

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        arrived = 0
        for pdf in pdfs:
            arrived += len(pdf)
        taken_before = state.get[0] if state.exists else 0
        take = max(0, min(arrived, quota - taken_before))
        total = taken_before + take
        state.update((total,))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "batch_taken": [take],
                "total_taken": [total],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} long, batch_taken long, total_taken long",
        stateStructType="taken long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
