"""Parquet footer introspection — the data-lake triage pass: a
maintenance fleet (compaction scheduling, small-file detection,
encoding audits, stats-coverage checks) decides from FOOTERS, never
data pages, so the per-file cost is a few KB of metadata regardless
of file size. This is the same decide-before-work stance as the
media/archive triage batteries, applied to the lake's own format.

Built on pyarrow's footer reader (vectorized parquet decode is
already delegated to the engines — SURVEY §2 S5; re-implementing
Thrift here would add risk, not capability). The DuckDB
``parquet_metadata()`` table function reads the same footers and is
the natural oracle: both engines' views of every row group and
column chunk must agree exactly.

Scale: one file = one work item over a path-list DataFrame —
map-only, no shuffle until the per-file/per-codec aggregation of
short strings and longs. 100k lake files profile in one pass with
zero data-page I/O."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "parquet_column_chunks",
    "parquet_file_summary",
    "parquet_compression_report",
]

_CHUNK_SCHEMA = (
    "file_name string, row_group_id int, column_id int, "
    "path_in_schema string, num_values long, compression string, "
    "total_compressed_size long, total_uncompressed_size long, "
    "null_count long"
)


def parquet_column_chunks(
    spark: SparkSession, paths: list[str], slices: int = 32
) -> DataFrame:
    """One row per (file, row group, column chunk) from footers
    only: value counts, codec, compressed/uncompressed bytes, null
    counts — the raw material of every lake-health report. Field
    names and values align with DuckDB's ``parquet_metadata()`` so
    the two engines hash-compare directly."""
    pdf = spark.createDataFrame(
        [(p,) for p in paths], "file_name string"
    ).repartition(min(slices, max(1, len(paths))))

    def kernel(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for b in batches:
            rows = []
            for path in b["file_name"]:
                md = pq.ParquetFile(path).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        st = c.statistics
                        rows.append(
                            (
                                path,
                                rg,
                                ci,
                                # pyarrow renders nested paths as
                                # 'a.list.element'; DuckDB as
                                # 'a, list, element' — emit the
                                # DuckDB form so the oracle compares
                                # verbatim (leaf names in this
                                # engine's tables never contain '.')
                                c.path_in_schema.replace(".", ", "),
                                c.num_values,
                                c.compression,
                                c.total_compressed_size,
                                c.total_uncompressed_size,
                                None if st is None
                                else st.null_count,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name", "row_group_id", "column_id",
                    "path_in_schema", "num_values", "compression",
                    "total_compressed_size",
                    "total_uncompressed_size", "null_count",
                ],
            )

    return pdf.mapInPandas(kernel, _CHUNK_SCHEMA)


def parquet_file_summary(
    spark: SparkSession, paths: list[str], slices: int = 32
) -> DataFrame:
    """One row per file: ``(file_name, num_rows, num_row_groups,
    num_columns, created_by)`` — the small-file/compaction-candidate
    report a scheduler consumes (compare
    ``lake/compaction.py``'s binpack selection, which this feeds at
    the file-format level)."""
    pdf = spark.createDataFrame(
        [(p,) for p in paths], "file_name string"
    ).repartition(min(slices, max(1, len(paths))))

    def kernel(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for b in batches:
            rows = []
            for path in b["file_name"]:
                md = pq.ParquetFile(path).metadata
                rows.append(
                    (path, md.num_rows, md.num_row_groups,
                     md.num_columns, md.created_by)
                )
            yield pd.DataFrame(
                rows,
                columns=["file_name", "num_rows", "num_row_groups",
                         "num_columns", "created_by"],
            )

    return pdf.mapInPandas(
        kernel,
        "file_name string, num_rows long, num_row_groups int, "
        "num_columns int, created_by string",
    )


def parquet_compression_report(chunks: DataFrame) -> DataFrame:
    """Per (column, codec) aggregate over
    :func:`parquet_column_chunks` output: chunk counts, bytes, and
    the compression ratio in integer permille (repo convention —
    integers hash identically across engines). One partial-agg
    shuffle on short keys."""
    return (
        chunks.groupBy("path_in_schema", "compression")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("total_compressed_size").alias("compressed"),
            F.sum("total_uncompressed_size").alias("uncompressed"),
        )
        .withColumn(
            "ratio_permille",
            (F.col("compressed") * 1000 / F.col("uncompressed"))
            .cast("long"),
        )
    )
