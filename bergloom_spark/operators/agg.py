"""Aggregation patterns for skewed and high-cardinality keys.

- ``two_phase_distinct_count``: exact COUNT(DISTINCT x) per key without
  a single-reducer hotspot. Phase 1 groups on (key, x) — Spark's
  map-side partial aggregation absorbs hot-key skew because duplicate
  (key, x) pairs collapse before the shuffle; phase 2 counts rows per
  key. Two small shuffles instead of one skewed one.
- ``salted_group_count``: explicit salting for pathologically hot keys
  in non-algebraic aggregations: a random-ish (but deterministic,
  hash-derived) salt spreads one key over ``n_salts`` reducers, a
  second tiny aggregation merges the partials.
- ``approx_distinct``: HyperLogLog++ via ``approx_count_distinct`` —
  one pass, mergeable sketches, the 100 TB default when ±2% is fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_phase_distinct_count(
    df: DataFrame, key: str, value: str, out_col: str = "n_distinct"
) -> DataFrame:
    pairs = df.select(key, value).groupBy(key, value).agg(F.lit(1))
    return pairs.groupBy(key).agg(F.count(F.lit(1)).alias(out_col))


def salted_group_count(
    df: DataFrame, key: str, n_salts: int = 16, out_col: str = "n"
) -> DataFrame:
    """Salt from ``spark_partition_id`` — deterministic on task retry
    (a recomputed partition re-derives the same id; rand/
    monotonically_increasing_id in a shuffle key is the SPARK-23207
    bug class) and spreads a hot key across exactly the partitions
    that hold it, which is the skew being treated."""
    salt = F.pmod(F.spark_partition_id().cast("long"), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(F.col(key), salt)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__pn"))
    )
    return partial.groupBy(key).agg(F.sum("__pn").cast("long").alias(out_col))


def approx_distinct(
    df: DataFrame, key: str, value: str, rsd: float = 0.02,
    out_col: str = "approx_distinct",
) -> DataFrame:
    return df.groupBy(key).agg(
        F.approx_count_distinct(value, rsd=rsd).alias(out_col)
    )
