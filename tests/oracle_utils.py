"""Local replica of the driver's DuckDB-oracle comparison: row count +
column names + order-insensitive values."""

from __future__ import annotations

import os

import duckdb
import pandas as pd

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


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Returns a report dict; 'match' True iff counts, columns and values
    all agree (floats compared exactly, as a value-hash would)."""
    got = spark_df.toPandas()
    want = con.execute(sql).fetch_df()
    report: dict = {
        "rows": (len(got), len(want)),
        "cols": (sorted(got.columns), sorted(want.columns)),
    }
    if sorted(got.columns) != sorted(want.columns):
        report["match"] = False
        report["why"] = "columns"
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
