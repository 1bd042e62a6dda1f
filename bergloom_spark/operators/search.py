"""Text retrieval and fuzzy matching over the documents corpus.

Training-data-pipeline extensions (SURVEY.md §2 extension surface):

- :func:`bm25_score` — BM25 ranking for a bounded query-term set,
  expressed entirely as per-row higher-order-function expressions plus
  ONE global 1-row aggregate (N, avgdl, per-term document frequency)
  broadcast back. No explode, no per-term shuffle: at 100 TB the corpus
  is scanned once and the only exchange is the final top-k.
- :func:`fuzzy_match` — bounded-probe Levenshtein matching with a
  length-band prefilter so the expensive edit-distance only runs on
  candidates that could possibly qualify.

Both have exact DuckDB twins (``bm25_sql``) for oracle checking; the
arithmetic is written in the same left-to-right order on both engines
so rounded scores are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bergloom_spark.functions import text as TX

BM25_K1 = 1.2
BM25_B = 0.75


def _tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = 10,
) -> DataFrame:
    """Top-``top_k`` docs by BM25 for a fixed query-term list.

    Output: (doc_id, bm25) ordered by rounded score desc, doc_id asc —
    ordering on the ROUNDED score keeps the ranking identical across
    engines whose float sums differ in the last ulp.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = TX.tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    ).withColumn("__dl", F.size("__toks"))
    for i, t in enumerate(query_terms):
        base = base.withColumn(f"__tf_{i}", _tf(F.col("__toks"), t))
    base = base.drop("__toks")
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.join(F.broadcast(stats))
    score: Column | None = None
    for i in range(len(query_terms)):
        tf = F.col(f"__tf_{i}").cast("double")
        df_t = F.col(f"__df_{i}").cast("double")
        idf = F.log(
            (F.col("__n") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5)) + F.lit(1.0)
        )
        term = (
            idf
            * tf
            * F.lit(k1 + 1.0)
            / (
                tf
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("__dl").cast("double") / F.col("__avgdl")
                )
            )
        )
        score = term if score is None else score + term
    return (
        scored.select("doc_id", F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(top_k)
    )


def bm25_sql(
    query_terms: list[str],
    text_expr: str = "text",
    id_expr: str = "doc_id",
    table: str = "documents",
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = 10,
) -> str:
    """DuckDB twin of :func:`bm25_score` — same tokenizer, same term
    order, same arithmetic shape, rounded the same way."""
    tf_cols = ",\n                 ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(query_terms)
    )
    df_cols = ",\n                 ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df_{i}"
        for i in range(len(query_terms))
    )
    score_terms = " + ".join(
        f"(ln((n - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * tf_{i} * {k1 + 1.0!r}"
        f" / (tf_{i} + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl)))"
        for i in range(len(query_terms))
    )
    return f"""
        WITH base AS (
          SELECT {id_expr} AS doc_id, {TX.tokens_sql(text_expr)} AS toks
          FROM {table}),
        feat AS (
          SELECT doc_id, len(toks) AS dl,
                 {tf_cols}
          FROM base),
        stats AS (
          SELECT count(*) AS n, avg(dl) AS avgdl,
                 {df_cols}
          FROM feat)
        SELECT doc_id, round({score_terms}, 6) AS bm25
        FROM feat, stats
        WHERE round({score_terms}, 6) > 0
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT {top_k}
    """


def fuzzy_match(
    corpus: DataFrame,
    probes: DataFrame,
    text_col: str,
    id_col: str,
    probe_text_col: str,
    probe_id_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """All (probe, corpus) pairs within Levenshtein ``max_dist``.

    Probe side must be bounded (broadcast). The length-band prefilter
    (|len(a) − len(b)| ≤ d, a lower bound on edit distance) is a cheap
    codegen comparison that prunes most of the corpus before the
    O(len²) Levenshtein runs. Output: (probe_id, match_id, dist),
    self-matches excluded.
    """
    c = corpus.select(
        F.col(id_col).alias("match_id"), F.col(text_col).alias("__mt")
    )
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        F.col(probe_text_col).alias("__pt"),
    )
    joined = c.crossJoin(F.broadcast(p)).filter(
        (F.abs(F.length("__mt") - F.length("__pt")) <= max_dist)
        & (F.col("match_id") != F.col("probe_id"))
    )
    return (
        joined.select(
            "probe_id",
            "match_id",
            F.levenshtein(F.col("__mt"), F.col("__pt")).alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
