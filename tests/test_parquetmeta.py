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


def test_corrupt_file_yields_error_row(spark, paths, tmp_path):
    """Review r10 pass 5: a truncated footer becomes an error ROW
    naming the file, never a dead job."""
    bad = tmp_path / "truncated.parquet"
    bad.write_bytes(open(paths[0], "rb").read()[:100])
    mixed = [paths[0], str(bad)]
    rows = parquet_column_chunks(spark, mixed).collect()
    errs = [r for r in rows if r.error is not None]
    good = [r for r in rows if r.error is None]
    assert len(errs) == 1
    assert errs[0].file_name == str(bad)
    assert errs[0].num_values is None
    assert good and all(r.file_name == paths[0] for r in good)
    summ = {r.file_name: r for r in
            parquet_file_summary(spark, mixed).collect()}
    assert summ[str(bad)].error is not None
    assert summ[paths[0]].error is None


def test_dotted_flat_column_name_kept_verbatim(spark, tmp_path):
    """Review r10 pass 5 (verified vs DuckDB): a flat column NAMED
    'a.b' stays 'a.b' — only genuine nesting splits."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "dotted.parquet")
    pq.write_table(pa.table({"a.b": [1, 2, 3]}), p)
    ours = {
        r.path_in_schema
        for r in parquet_column_chunks(spark, [p]).collect()
    }
    duck = {
        r[0]
        for r in duckdb.sql(
            f"SELECT path_in_schema FROM parquet_metadata('{p}')"
        ).fetchall()
    }
    assert ours == duck == {"a.b"}


def test_ratio_is_integer_division(spark, paths):
    chunks = parquet_column_chunks(spark, paths)
    for r in parquet_compression_report(chunks).collect():
        assert r.ratio_permille == r.compressed * 1000 // r.uncompressed


def test_zero_slices_guarded(spark, paths):
    assert parquet_file_summary(spark, paths[:2], slices=0).count() == 2
