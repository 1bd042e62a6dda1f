"""Bucketed tables: co-located, shuffle-free joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both
sides on the join key. Bucketing pays that shuffle ONCE at write time:
both tables are hash-partitioned into the same number of buckets on
the key (and sorted within buckets), so every later join on that key
is a zero-exchange sort-merge join — Spark matches bucket i of the
left to bucket i of the right locally. (The within-bucket Sort node
remains: Spark ≥3.0 ignores bucket sort order on read by default,
SPARK-28632 — sorting already-sorted runs is linear and local, while
the avoided Exchange is the cost that grows with cluster size.)

The reference has no bucketing (its one query joins against small
delete sets), but for the repeated-join workloads this engine targets
(dedup candidates re-verified daily, fact-fact enrichment) it is the
single biggest shuffle saver. Plan property is asserted in
tests/test_sources.py: joining two co-bucketed tables produces a plan
with NO Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external bucketed+sorted parquet table.

    ``n_buckets`` should be sized so one bucket of the LARGER table
    fits an executor's memory at target scale (buckets are the unit of
    join parallelism — at 100 TB / 1000 executors think thousands of
    buckets, not 32).
    """
    # Pre-partition on the bucket key with the same hash the bucketing
    # uses: each task then owns whole buckets and writes ONE file per
    # bucket. Without this every task emits a file for every bucket it
    # touches (tasks × buckets small files).
    from pyspark.sql import functions as F

    df = df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
    writer = df.write.format("parquet").mode("overwrite").option("path", path)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on (a prefix of) their bucket key.

    With matching bucket counts Spark plans a SortMergeJoin whose
    children are bare scans — no Exchange: the bucketing IS the hash
    partitioning.
    """
    return spark.table(left_name).join(spark.table(right_name), on=on, how=how)
