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
