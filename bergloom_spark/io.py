"""Test-data loading helpers for the driver-provided parquet tables."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet has shipped with two ts encodings across data
        # generations: TIMESTAMP(NANOS) — which Spark only reads as raw
        # long nanos under the legacy flag — and plain TIMESTAMP(MICROS).
        # Set the conf defensively (the driver's session may not come
        # from session.get_spark), then branch on the type that actually
        # materialized. Long nanos → NTZ via a timezone-independent
        # timestampadd (timestamp_micros().cast() would bake in the
        # session TZ); native timestamps pass through (Spark already
        # reads isAdjustedToUTC=false as TIMESTAMP_NTZ).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_spread_seq = 0


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan a narrow scan out to the cluster's cores before per-row-heavy
    compute (text hashing, vector math).

    At real scale the input has more file splits than cores and this is
    a no-op (guarded by the partition count). It exists because a small
    single-row-group parquet file scans as ONE task — which would pin
    all downstream per-row compute to a single core no matter how many
    executors the cluster has. The shuffle it introduces moves only the
    projected columns, and only when the input is too small for the
    shuffle to matter.

    The ``observe`` below is a deliberate predicate-pushdown barrier:
    Catalyst pushes filters through a bare Repartition, which would
    land expensive text/vector predicates BACK on the single pre-fanout
    task (measured 2.5× on the corpus-pipeline query). CollectMetrics
    is not a node PushDownPredicates crosses, costs one accumulator,
    and — unlike the nondeterministic-column tricks — keeps the plan
    deterministic and column pruning intact. Scale note: the barrier
    only exists on the small-input path; real multi-split scans return
    above, so scan-level filter pushdown at 100 TB is unaffected.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    global _spread_seq
    _spread_seq += 1
    return df.repartition(target).observe(
        f"__spread_barrier_{_spread_seq}", F.count(F.lit(1)).alias("rows")
    )


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
