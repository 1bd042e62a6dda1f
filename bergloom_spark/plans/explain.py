"""Plan introspection: assert the physical plan is the one you'd want.

At 100 TB a wrong plan isn't slow, it's dead. These helpers make plan
properties testable so regressions (a lost broadcast, a filter that
stopped pushing down, an extra shuffle) fail CI instead of burning a
cluster. Used by tests/test_plans.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded)."""
    return len(
        re.findall(
            r"(?<!Broadcast)Exchange (hashpartitioning|rangepartitioning|"
            r"RoundRobinPartitioning|SinglePartition)",
            executed_plan(df),
        )
    )


def count_broadcast_joins(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def count_sortmerge_joins(df: DataFrame) -> int:
    return executed_plan(df).count("SortMergeJoin")


def anti_join_count(df: DataFrame) -> int:
    return len(re.findall(r"Join LeftAnti|LeftAnti", executed_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from the scan nodes (formatted explain)."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column-pruning check)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # Under AQE the codegen stages only appear in the *final* plan, so
    # force execution first (callers pass small/test-scale frames).
    # Codegen'd operators print with "*(n)" stage markers.
    df.foreach(lambda _: None)
    plan = executed_plan(df)
    return "WholeStageCodegen" in plan or re.search(r"\*\(\d+\)", plan) is not None
