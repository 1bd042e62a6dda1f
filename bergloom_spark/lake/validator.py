"""Compaction validation: input (MoR) vs output must be identical.

Reference: ``CompactionValidator`` (``core/src/compaction/validator.rs``)
compares row *counts* of the delete-applied input plan and the compacted
output plan. Here the check is strengthened to an order-independent
full-row fingerprint: count + sum of per-row ``xxhash64`` over all
columns — one distributed aggregate per side, no collect, catches value
corruption that count parity misses (SURVEY.md §7.1 step 6).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ValidationError(Exception):
    """Mirror of ``CompactionError::CompactionValidator`` (validator.rs:150-155)."""


@dataclass
class Fingerprint:
    rows: int
    hash_sum: int


def fingerprint(df: DataFrame) -> Fingerprint:
    """Order-independent content fingerprint in one pass."""
    cols = [F.col(c) for c in df.columns]
    agg = df.select(
        F.count(F.lit(1)).alias("rows"),
        # Sum in decimal(38) so 2^63-magnitude hashes can't overflow.
        F.coalesce(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")), F.lit(0)
        ).alias("hash_sum"),
    ).collect()[0]
    return Fingerprint(rows=int(agg["rows"]), hash_sum=int(agg["hash_sum"]))


def validate_compaction(input_df: DataFrame, output_df: DataFrame) -> Fingerprint:
    """Raise :class:`ValidationError` unless both sides hold identical rows.

    Both sides are fingerprinted in ONE Spark job: tag each side, union,
    aggregate grouped by the tag — the expensive input-side MoR plan and
    the output scan execute together instead of as two scheduled jobs.
    """
    if sorted(input_df.columns) != sorted(output_df.columns):
        raise ValidationError(
            f"schema mismatch: {input_df.columns} vs {output_df.columns}"
        )
    cols = sorted(input_df.columns)
    tagged = input_df.select(*cols).withColumn(
        "__side", F.lit(0)
    ).unionByName(output_df.select(*cols).withColumn("__side", F.lit(1)))
    hash_cols = [F.col(c) for c in cols]
    rows = tagged.groupBy("__side").agg(
        F.count(F.lit(1)).alias("rows"),
        # Sum in decimal(38) so 2^63-magnitude hashes can't overflow.
        F.coalesce(
            F.sum(F.xxhash64(*hash_cols).cast("decimal(38,0)")), F.lit(0)
        ).alias("hash_sum"),
    ).collect()
    by_side = {
        int(r["__side"]): Fingerprint(rows=int(r["rows"]), hash_sum=int(r["hash_sum"]))
        for r in rows
    }
    fin = by_side.get(0, Fingerprint(rows=0, hash_sum=0))
    fout = by_side.get(1, Fingerprint(rows=0, hash_sum=0))
    if fin != fout:
        raise ValidationError(
            f"compaction validation failed: input {fin} != output {fout}"
        )
    return fin
