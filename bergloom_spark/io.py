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

# Session-scoped parquet-schema cache (optimization r14, guide §1/§6):
# a bare ``spark.read.parquet(path)`` runs footer schema inference —
# measured ~0.4-0.6 s of driver+job latency PER CALL even for a
# single-file table — while ``read.schema(s).parquet(path)`` builds in
# ~0.07 s. The schema itself is metadata derived from the same parquet
# inputs at first use in each process (nothing persists across runs;
# every bench/oracle invocation still computes results from the
# parquet), so caching it is the same class of session caching Spark
# already does for file listings. Keyed by resolved path so distinct
# SF dirs never collide.
_schema_cache: dict = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    key = os.path.abspath(path)
    schema = _schema_cache.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _schema_cache[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


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
        df = _read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return _read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


_spread_seq = 0


def table_bytes(sf_dir: str, name: str) -> int | None:
    """On-disk bytes of a test table — the driver-side input-size probe
    behind :func:`spread`'s hint path. File or directory; None when
    the path cannot be sized (caller falls back to the plan probe)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total
    except OSError:
        return None


def table_rows(sf_dir: str, name: str) -> int | None:
    """Exact row count of a test table from parquet footers (driver
    side, no Spark job). ``num_rows`` in the footer is definitionally
    ``count(*)`` — same number a count() job returns, for ~0.5 ms
    instead of ~0.5 s of job latency (optimization r14, guide §1).
    Computed from the parquet inputs at call time — nothing is
    persisted or assumed. None when the path cannot be read (caller
    falls back to a count() job)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isfile(path):
            return pq.read_metadata(path).num_rows
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.read_metadata(os.path.join(root, f)).num_rows
        return total
    except OSError:
        return None


def spread(
    df: DataFrame,
    min_partitions: int | None = None,
    input_bytes: int | None = None,
) -> DataFrame:
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
    if input_bytes is not None:
        # Optimization r14 (guide §1): the caller sized the input on
        # the driver (one stat call), so the split-count estimate —
        # ceil(bytes / maxPartitionBytes), Spark's own packing rule
        # modulo the per-file open cost, which only ever ADDS splits —
        # replaces the ``df.rdd.getNumPartitions()`` probe, whose
        # analyze→optimize→plan→RDD conversion costs ~0.25 s of
        # driver latency per call. Underestimating splits is safe:
        # the repartition then runs on data that already had enough
        # parallelism — one redundant (tiny) shuffle, never a loss of
        # parallelism. At real scale bytes >> cores×128 MB and the
        # fan-out is skipped, same as the probe path.
        try:
            # exact byte value, pre-parsed by Spark's own conf layer
            max_split = int(
                spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
            )
        except Exception:
            max_split = 128 * 1024 * 1024
        est_splits = max(1, (input_bytes + max_split - 1) // max_split)
        if est_splits >= target:
            return df
    elif df.rdd.getNumPartitions() >= target:
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
