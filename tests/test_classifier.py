"""Hashing-trick linear classifier: exactness, both application
strategies agree, and DuckDB oracle parity."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from bergloom_spark.operators import classifier as CL
from tests.oracle_utils import compare

DIM = 64
W = CL.default_weights_millis(DIM)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_default_weights_deterministic_and_bounded():
    again = CL.default_weights_millis(DIM)
    assert again == W
    assert all(-1000 <= w <= 1000 for w in W)
    assert CL.default_weights_millis(DIM, seed=1) != W


def test_logit_exact_on_known_doc(spark):
    # Compute the expected logit in plain Python with the same md5
    # bucket hash the engines use.
    import hashlib

    def bucket(feat: str) -> int:
        return int(hashlib.md5(feat.encode()).hexdigest()[:15], 16) % DIM

    text = "the quick brown fox"
    feats = ["the", "quick", "brown", "fox", "the quick", "quick brown", "brown fox"]
    expected = sum(W[bucket(f)] for f in feats) + 7
    row = (
        _docs(spark, [(1, text)])
        .select(CL.hashed_linear_logit_millis("text", W, bias_millis=7).alias("l"))
        .collect()[0]
    )
    assert row["l"] == expected


def test_zero_token_doc_scores_bias(spark):
    row = (
        _docs(spark, [(1, "   ")])
        .select(CL.hashed_linear_logit_millis("text", W, bias_millis=42).alias("l"))
        .collect()[0]
    )
    assert row["l"] == 42


def test_null_doc_scores_bias_on_both_paths(spark):
    """ADVICE r2: NULL text made the inline fold return a NULL logit
    while the weight-table explode_outer path scored bias_millis —
    both paths must agree (bias-only) on NULL docs."""
    docs = _docs(spark, [(1, None), (2, "alpha beta")])
    inline = {
        r["doc_id"]: r["l"]
        for r in docs.select(
            "doc_id",
            CL.hashed_linear_logit_millis("text", W, bias_millis=5).alias("l"),
        ).collect()
    }
    assert inline[1] == 5
    weights = docs.sparkSession.createDataFrame(
        [(b, w) for b, w in enumerate(W)], "bucket: long, w_milli: long"
    )
    joined = {
        r["doc_id"]: r["logit_millis"]
        for r in CL.score_with_weight_table(
            docs, "text", "doc_id", weights, DIM, bias_millis=5
        ).collect()
    }
    assert joined == inline


def test_weight_table_path_matches_literal_path(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "beta beta beta"),
            (3, ""),
            (4, "zeta"),
        ],
    )
    lit = {
        r["doc_id"]: r["l"]
        for r in docs.select(
            "doc_id",
            CL.hashed_linear_logit_millis("text", W, bias_millis=5).alias("l"),
        ).collect()
    }
    wdf = spark.createDataFrame(
        [(b, w) for b, w in enumerate(W)], "bucket: long, w_milli: long"
    )
    joined = {
        r["doc_id"]: r["logit_millis"]
        for r in CL.score_with_weight_table(
            docs, "text", "doc_id", wdf, DIM, bias_millis=5
        ).collect()
    }
    assert joined == lit


def test_sigmoid_monotone(spark):
    rows = (
        spark.range(3)
        .select(
            CL.sigmoid((F.col("id") * 1000 - 1000).cast("long")).alias("p")
        )
        .collect()
    )
    ps = [r["p"] for r in rows]
    assert ps == sorted(ps)
    assert 0.0 < ps[0] < 0.5 < ps[2] < 1.0


def test_oracle_parity_on_testdata(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = docs.select(
        "doc_id",
        CL.hashed_linear_logit_millis("text", W, bias_millis=3).alias("logit_millis"),
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    sql = (
        "SELECT doc_id, "
        + CL.hashed_linear_logit_millis_sql("text", W, bias_millis=3)
        + " AS logit_millis FROM documents"
    )
    compare(out, con, sql)
