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
zero data-page I/O; a corrupt or truncated footer becomes an error
ROW naming the file (the thing a lake-health pass exists to
surface), never a dead job."""

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
    "null_count long, error string"
)


def _paths_df(spark: SparkSession, paths: list[str],
              slices: int) -> DataFrame:
    n = max(1, min(slices, max(1, len(paths))))
    return spark.createDataFrame(
        [(p,) for p in paths], "file_name string"
    ).repartition(n)


def _duck_path(dotted: str, top_names: set[str]) -> str:
    """pyarrow renders a leaf's schema path dotted
    (``col.list.element``); DuckDB renders components comma-joined
    (``col, list, element``). A FLAT column whose NAME contains a
    literal dot must stay intact (review r10 pass 5 — verified
    DuckDB returns ``a.b`` verbatim), so split only past the
    longest matching top-level field name; dots inside DEEPER
    component names remain a documented approximation."""
    if dotted in top_names:
        return dotted
    best = ""
    for name in top_names:
        if dotted.startswith(name + ".") and len(name) > len(best):
            best = name
    if not best:
        return dotted.replace(".", ", ")
    rest = dotted[len(best) + 1 :]
    return best + ", " + rest.replace(".", ", ")


def parquet_column_chunks(
    spark: SparkSession, paths: list[str], slices: int = 32
) -> DataFrame:
    """One row per (file, row group, column chunk) from footers
    only: value counts, codec, compressed/uncompressed bytes, null
    counts — the raw material of every lake-health report. Field
    names and values align with DuckDB's ``parquet_metadata()`` so
    the two engines hash-compare directly. Unreadable footers yield
    one row with ``error`` set and metadata fields NULL."""

    def kernel(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        cols = [
            "file_name", "row_group_id", "column_id",
            "path_in_schema", "num_values", "compression",
            "total_compressed_size", "total_uncompressed_size",
            "null_count", "error",
        ]
        for b in batches:
            rows = []
            for path in b["file_name"]:
                try:
                    md = pq.read_metadata(path)
                    top = {f.name for f in pq.read_schema(path)}
                except Exception as exc:  # noqa: BLE001 — the
                    # error row IS the product for a bad file
                    rows.append(
                        (path, None, None, None, None, None, None,
                         None, None,
                         f"{type(exc).__name__}: {exc}"[:500])
                    )
                    continue
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
                                _duck_path(c.path_in_schema, top),
                                c.num_values,
                                c.compression,
                                c.total_compressed_size,
                                c.total_uncompressed_size,
                                None if st is None
                                else st.null_count,
                                None,
                            )
                        )
            yield pd.DataFrame(rows, columns=cols)

    return _paths_df(spark, paths, slices).mapInPandas(
        kernel, _CHUNK_SCHEMA
    )


def parquet_file_summary(
    spark: SparkSession, paths: list[str], slices: int = 32
) -> DataFrame:
    """One row per file: ``(file_name, num_rows, num_row_groups,
    num_columns, created_by, error)`` — the small-file/compaction-
    candidate report a scheduler consumes (compare
    ``lake/compaction.py``'s binpack selection, which this feeds at
    the file-format level)."""

    def kernel(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        cols = ["file_name", "num_rows", "num_row_groups",
                "num_columns", "created_by", "error"]
        for b in batches:
            rows = []
            for path in b["file_name"]:
                try:
                    md = pq.read_metadata(path)
                except Exception as exc:  # noqa: BLE001
                    rows.append(
                        (path, None, None, None, None,
                         f"{type(exc).__name__}: {exc}"[:500])
                    )
                    continue
                rows.append(
                    (path, md.num_rows, md.num_row_groups,
                     md.num_columns, md.created_by, None)
                )
            yield pd.DataFrame(rows, columns=cols)

    return _paths_df(spark, paths, slices).mapInPandas(
        kernel,
        "file_name string, num_rows long, num_row_groups int, "
        "num_columns int, created_by string, error string",
    )


def parquet_compression_report(chunks: DataFrame) -> DataFrame:
    """Per (column, codec) aggregate over
    :func:`parquet_column_chunks` output (error rows excluded):
    chunk counts, bytes, and the compression ratio in integer
    permille (repo convention — integer arithmetic, NULL only for a
    zero-byte column). One partial-agg shuffle on short keys."""
    return (
        chunks.filter(F.col("error").isNull())
        .groupBy("path_in_schema", "compression")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("total_compressed_size").alias("compressed"),
            F.sum("total_uncompressed_size").alias("uncompressed"),
        )
        .withColumn(
            "ratio_permille",
            F.when(
                F.col("uncompressed") > 0,
                F.expr("compressed * 1000 div uncompressed"),
            ),
        )
    )
