"""Deterministic, engine-reproducible sampling for training pipelines.

``df.sample``/``sampleBy`` use Spark's internal RNG: results depend on
partition layout and are not reproducible by another engine, which
makes them unusable where a training corpus must be auditable. Here the
keep decision is a pure function of the row's id — ``hash64`` (md5-
based, bit-identical in Spark and DuckDB, see functions/hashing.py) —
so the same rows are selected on every engine, every run, at every
parallelism.

At 100 TB the filter is a scan-side codegen expression: no shuffle, no
state, prunes before anything expensive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bergloom_spark.functions.hashing import hash64, hash64_sql

SCALE = 1_000_000


def stratified_sample_hash(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff ``hash64(id) % SCALE < fraction[stratum] * SCALE``.

    ``fractions`` maps stratum value → sampling rate in [0, 1]; strata
    not listed use ``default_fraction``. Per-stratum rates are how a
    pipeline rebalances a corpus (e.g. downsample boilerplate web text,
    keep all rare-language docs) in one deterministic pass.
    """
    gate = None
    for value, frac in fractions.items():
        thr = F.lit(int(frac * SCALE))
        gate = (
            F.when(F.col(strata_col) == value, thr)
            if gate is None
            else gate.when(F.col(strata_col) == value, thr)
        )
    gate = (
        gate.otherwise(F.lit(int(default_fraction * SCALE)))
        if gate is not None
        else F.lit(int(default_fraction * SCALE))
    )
    bucket = F.pmod(hash64(F.col(id_col).cast("string")), F.lit(SCALE))
    return df.filter(bucket < gate)


def stratified_sample_sql(
    strata_expr: str,
    id_expr: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> str:
    """DuckDB WHERE-clause twin of :func:`stratified_sample_hash`."""
    whens = " ".join(
        f"WHEN '{value}' THEN {int(frac * SCALE)}"
        for value, frac in fractions.items()
    )
    gate = f"CASE {strata_expr} {whens} ELSE {int(default_fraction * SCALE)} END"
    return f"({hash64_sql(f'({id_expr})::VARCHAR')}) % {SCALE} < {gate}"


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    seed: int = 0,
) -> DataFrame:
    """Attach a ``split`` column partitioning the corpus into named
    fractions (e.g. ``{"train": 0.9, "val": 0.05, "test": 0.05}``) —
    the train/val/test assignment every dataset release needs.

    The split is a pure function of ``hash64(seed, id)``: stable under
    re-runs, engine changes, repartitioning, and corpus growth (a row's
    split never changes when other rows are added — the property that
    prevents test-set leakage across dataset versions). Cumulative
    thresholds over one hash draw the boundaries, so fractions sum to
    at most 1; any remainder gets split ``None``.

    At 100 TB this is a scan-side codegen expression: no shuffle, no
    RNG state, no driver involvement.
    """
    bucket = F.pmod(hash64(F.col(id_col).cast("string"), seed=seed), F.lit(SCALE))
    expr = None
    acc = 0
    for name, frac in splits.items():
        acc += int(frac * SCALE)
        cond = bucket < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def split_assign_sql(id_expr: str, splits: dict[str, float], seed: int = 0) -> str:
    """DuckDB SELECT-expression twin of :func:`split_assign`."""
    bucket = f"({hash64_sql(f'({id_expr})::VARCHAR', seed=seed)}) % {SCALE}"
    whens, acc = [], 0
    for name, frac in splits.items():
        acc += int(frac * SCALE)
        whens.append(f"WHEN {bucket} < {acc} THEN '{name}'")
    return "CASE " + " ".join(whens) + " END"
