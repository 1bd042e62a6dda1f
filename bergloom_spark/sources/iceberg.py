"""Real-Iceberg connector: the deployment path for `lake/` semantics.

This environment ships no ``iceberg-spark-runtime`` jar, so every call
is gated on :func:`iceberg_available`. On a cluster with the jar +
catalog configured, these map the engine onto native Iceberg 1:1:

- snapshot-pinned MoR read      → ``spark.read.option("snapshot-id", s)``
  (the Iceberg runtime applies delete files on read — the J1/J2
  cascade comes built in; ``operators.mor`` remains the explicit,
  testable re-implementation);
- hidden columns                → Iceberg metadata columns ``_file``,
  ``_pos`` and the ``.entries`` metadata table for per-file sequence
  numbers;
- full/binpack compaction       → ``CALL <cat>.system.rewrite_data_files``
  with ``use-starting-sequence-number`` (default true) matching
  ``lake/commit.py``'s pinning (reference
  ``compaction/mod.rs:546-566``);
- snapshot expiration           → ``CALL <cat>.system.expire_snapshots``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IcebergUnavailable(RuntimeError):
    def __init__(self) -> None:
        super().__init__(
            "iceberg-spark-runtime is not on the classpath; use "
            "bergloom_spark.lake.LakeTable for the self-contained format, "
            "or submit with --packages org.apache.iceberg:iceberg-spark-"
            "runtime-<spark_ver>"
        )


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise IcebergUnavailable()


def read_snapshot(
    spark: SparkSession, table: str, snapshot_id: int | None = None
) -> DataFrame:
    """Snapshot-pinned MoR read (deletes applied by the runtime)."""
    _require(spark)
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    return reader.load(table)


def scan_with_hidden_columns(spark: SparkSession, table: str) -> DataFrame:
    """Data scan + Iceberg's `_file`/`_pos` metadata columns (exact
    ``sys_hidden_file_path``/``sys_hidden_pos`` semantics)."""
    _require(spark)
    return spark.read.format("iceberg").load(table).selectExpr(
        "*", "_file AS sys_hidden_file_path", "_pos AS sys_hidden_pos"
    )


def rewrite_data_files(
    spark: SparkSession,
    catalog: str,
    table: str,
    strategy: str = "binpack",
    target_file_size_bytes: int | None = None,
    use_starting_sequence_number: bool = True,
) -> DataFrame:
    """Full/binpack compaction via the Iceberg Spark procedure —
    the built-in equivalent of ``lake.Compaction``."""
    _require(spark)
    options = [f"'strategy', '{strategy}'"]
    if target_file_size_bytes is not None:
        options.append(
            "map('target-file-size-bytes', "
            f"'{target_file_size_bytes}', 'use-starting-sequence-number', "
            f"'{str(use_starting_sequence_number).lower()}')"
        )
    return spark.sql(
        f"CALL {catalog}.system.rewrite_data_files(table => '{table}', "
        + ", ".join(options)
        + ")"
    )


def expire_snapshots(
    spark: SparkSession, catalog: str, table: str, retain_last: int = 1
) -> DataFrame:
    _require(spark)
    return spark.sql(
        f"CALL {catalog}.system.expire_snapshots(table => '{table}', "
        f"retain_last => {retain_last})"
    )
