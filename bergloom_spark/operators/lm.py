"""Corpus-derived unigram language-model scoring.

The classic cheap quality signal a CCNet-style pipeline computes with a
pretrained LM is approximated here with the corpus's OWN unigram
distribution: two aggregations and one join, all built-in expressions.

Operators:
- :func:`unigram_logprob` — per-document mean log10 unigram
  probability (how "typical" a document's vocabulary is for the
  corpus). Low scores flag gibberish / vocabulary outliers, high
  scores flag stopword soup; pipelines keep the middle band.
- :func:`source_unigram_kl` — per-source KL(source ‖ corpus) unigram
  divergence in bits: which sources' vocabulary distributions drift
  from the mixture. The mixture-diagnostics counterpart: resampling
  weights (see ``mixture_resample``) change these numbers.

Scale shape (100 TB corpus):
- Token explosion happens scan-side; the vocab aggregation is
  map-side-combinable (distinct tokens per task, not rows) and its
  result is (token, count) — data-dependent but ~10⁵–10⁸ rows even
  for web corpora, orders of magnitude under the corpus.
- ``unigram_logprob`` joins tokens→logp. With ``broadcast_vocab=True``
  (default, correct up to ~10⁷ vocab) the probe side never shuffles;
  the only row-count-proportional exchange is the final per-doc
  aggregation, carrying (doc_id, logp) pairs. For open-vocab corpora
  beyond broadcast range pass ``broadcast_vocab=False`` and the join
  degrades to a shuffled hash join planned by AQE.
- ``source_unigram_kl``'s exchanges carry (source, token) partial
  counts — map-side combined — and the K-row final reduce.

Float determinism: per-group ``avg``/``sum`` of doubles is
order-dependent at the last ulp; results are rounded to 6 decimals,
matching the repo-wide oracle convention (documents are ~10²–10⁴
tokens, so accumulated error ≪ 1e-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bergloom_spark.functions import text as TX


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document mean log10 unigram probability under the corpus's
    own unigram distribution.

    Output: (id_col, n_tokens, avg_logprob), avg_logprob rounded to 6.
    """
    toks = df.select(
        F.col(id_col).alias("__id"), F.explode(TX.tokens(text_col)).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("__n"))
    total = freq.agg(F.sum("__n").alias("__t"))
    logp = freq.crossJoin(F.broadcast(total)).select(
        "tok",
        F.log10(F.col("__n").cast("double") / F.col("__t").cast("double")).alias(
            "__logp"
        ),
    )
    if broadcast_vocab:
        logp = F.broadcast(logp)
    return (
        toks.join(logp, "tok")
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("__logp"), 6).alias("avg_logprob"),
        )
        .select(F.col("__id").alias(id_col), "n_tokens", "avg_logprob")
    )


def unigram_logprob_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`unigram_logprob`."""
    toks = TX.tokens_sql(text_col)
    return f"""
        WITH toks AS (
          SELECT {id_col}, unnest({toks}) AS tok FROM {table}),
        freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY 1),
        tot AS (SELECT sum(n)::DOUBLE AS t FROM freq)
        SELECT {id_col}, count(*)::BIGINT AS n_tokens,
               round(avg(log10(n::DOUBLE / t)), 6) AS avg_logprob
        FROM toks JOIN freq USING (tok) CROSS JOIN tot
        GROUP BY {id_col}
    """


def source_unigram_kl(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """KL(p_source ‖ p_corpus) over unigrams, in bits, per source.

    p_source's support is a subset of the corpus's, so the sum runs
    over the source's own tokens only — no outer join against the full
    vocabulary. Output: (source, n_tokens, kl_bits) rounded to 6.
    """
    toks = df.select(
        F.col(source_col).alias("source"), F.explode(TX.tokens(text_col)).alias("tok")
    )
    st = toks.groupBy("source", "tok").agg(F.count("*").alias("n_st"))
    s_tot = st.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    corpus = st.groupBy("tok").agg(F.sum("n_st").alias("n_t"))
    total = corpus.agg(F.sum("n_t").alias("n"))
    # All three denominators are tiny relative to the token stream:
    # vocab-size and source-count rows. Broadcast them onto the
    # (source, tok) partial-count table; log2(p/q) folds scan-side.
    joined = (
        st.join(F.broadcast(s_tot), "source")
        .join(F.broadcast(corpus), "tok")
        .crossJoin(F.broadcast(total))
    )
    p = F.col("n_st").cast("double") / F.col("n_s").cast("double")
    q = F.col("n_t").cast("double") / F.col("n").cast("double")
    term = p * F.log2(p / q)
    return (
        joined.groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.round(F.sum(term), 6).alias("kl_bits"),
        )
        .select("source", "n_tokens", "kl_bits")
    )


def source_unigram_kl_sql(
    table: str = "documents", text_col: str = "text", source_col: str = "source"
) -> str:
    """DuckDB twin of :func:`source_unigram_kl`."""
    toks = TX.tokens_sql(text_col)
    return f"""
        WITH toks AS (
          SELECT {source_col} AS source, unnest({toks}) AS tok FROM {table}),
        st AS (SELECT source, tok, count(*) AS n_st FROM toks GROUP BY 1, 2),
        s_tot AS (SELECT source, sum(n_st) AS n_s FROM st GROUP BY 1),
        corpus AS (SELECT tok, sum(n_st) AS n_t FROM st GROUP BY 1),
        tot AS (SELECT sum(n_t)::DOUBLE AS n FROM corpus)
        SELECT source, max(n_s)::BIGINT AS n_tokens,
               round(sum((n_st::DOUBLE / n_s) *
                         log2((n_st::DOUBLE / n_s) / (n_t::DOUBLE / n))), 6)
                 AS kl_bits
        FROM st JOIN s_tot USING (source) JOIN corpus USING (tok) CROSS JOIN tot
        GROUP BY source
    """
