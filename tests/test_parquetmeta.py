"""Parquet footer introspection tests (round 10): the Spark/pyarrow
view of every row group and column chunk in the REAL testdata files
must agree exactly with DuckDB's parquet_metadata() — two
independent footer readers over the same bytes."""

from __future__ import annotations

import glob

import duckdb
import pytest

from bergloom_spark.operators.parquetmeta import (
    parquet_column_chunks,
    parquet_compression_report,
    parquet_file_summary,
)


@pytest.fixture(scope="module")
def paths(sf_dir):
    out = sorted(glob.glob(f"{sf_dir}/*.parquet"))
    assert len(out) == 10
    return out


def test_column_chunks_match_duckdb(spark, paths):
    got = sorted(
        tuple(r)
        for r in parquet_column_chunks(spark, paths)
        .select(
            "file_name", "row_group_id", "path_in_schema",
            "num_values", "compression", "total_compressed_size",
            "total_uncompressed_size",
        )
        .collect()
    )
    exp = sorted(
        tuple(r)
        for r in duckdb.sql(
            "SELECT file_name, row_group_id, path_in_schema, "
            "num_values, compression, total_compressed_size, "
            "total_uncompressed_size FROM parquet_metadata("
            + "[" + ",".join(f"'{p}'" for p in paths) + "])"
        ).fetchall()
    )
    assert len(got) > 10
    assert got == exp


def test_null_counts_match_duckdb(spark, paths):
    got = {
        (r.file_name, r.row_group_id, r.path_in_schema): r.null_count
        for r in parquet_column_chunks(spark, paths).collect()
    }
    for fn, rg, col, nulls in duckdb.sql(
        "SELECT file_name, row_group_id, path_in_schema, "
        "stats_null_count FROM parquet_metadata("
        + "[" + ",".join(f"'{p}'" for p in paths) + "])"
    ).fetchall():
        assert got[(fn, rg, col)] == nulls, (fn, col)


def test_file_summary_match_duckdb(spark, paths):
    got = sorted(
        (r.file_name, r.num_rows, r.num_row_groups)
        for r in parquet_file_summary(spark, paths).collect()
    )
    exp = sorted(
        tuple(r)
        for r in duckdb.sql(
            "SELECT file_name, num_rows, num_row_groups "
            "FROM parquet_file_metadata("
            + "[" + ",".join(f"'{p}'" for p in paths) + "])"
        ).fetchall()
    )
    assert got == exp
    # sanity against the actual table
    rows = dict(
        (fn.split("/")[-1], n) for fn, n, _ in got
    )
    assert rows["region.parquet"] == 5


def test_compression_report_shape(spark, paths):
    chunks = parquet_column_chunks(spark, paths)
    rep = {
        (r.path_in_schema, r.compression): r
        for r in parquet_compression_report(chunks).collect()
    }
    assert rep  # at least one (column, codec) group
    for r in rep.values():
        assert r.n_chunks >= 1
        assert 0 < r.ratio_permille  # compressed bytes are nonzero
        assert r.compressed <= r.uncompressed * 2  # sane bound


def test_plan_map_only_until_agg(spark, paths):
    chunks = parquet_column_chunks(spark, paths)
    rep = parquet_compression_report(chunks)
    rep.collect()
    plan = rep._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # path-list repartition + the one agg shuffle
    assert final.count("Exchange") <= 2
