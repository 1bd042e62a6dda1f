"""Unigram-LM scoring and Gopher rule battery: behavior semantics plus
DuckDB-oracle parity (same comparator as the driver's gate)."""

from __future__ import annotations

import math

from bergloom_spark.functions import text as TX
from bergloom_spark.operators.lm import (
    source_unigram_kl,
    source_unigram_kl_sql,
    unigram_logprob,
    unigram_logprob_sql,
)

from bergloom_spark.session import get_spark
from oracle_utils import compare, duck_connection


# ---------------------------------------------------------------------------
# unigram_logprob semantics
# ---------------------------------------------------------------------------
def test_unigram_logprob_hand_case(spark):
    # corpus: 4 tokens total: a a b c → p(a)=1/2, p(b)=p(c)=1/4
    df = spark.createDataFrame(
        [(1, "a a"), (2, "b c")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in unigram_logprob(df).collect()}
    assert rows[1].n_tokens == 2 and rows[2].n_tokens == 2
    assert rows[1].avg_logprob == round(math.log10(0.5), 6)
    assert rows[2].avg_logprob == round(math.log10(0.25), 6)


def test_unigram_logprob_outlier_scores_lowest(spark):
    common = [(i, "the quick brown fox") for i in range(20)]
    df = spark.createDataFrame(
        common + [(99, "zyzzyva qwerty")], "doc_id long, text string"
    )
    out = {r.doc_id: r.avg_logprob for r in unigram_logprob(df).collect()}
    assert out[99] == min(out.values())


def test_unigram_logprob_shuffle_join_parity(spark):
    """broadcast_vocab=False (the open-vocab fallback) is result-
    identical to the broadcast plan."""
    df = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} shared") for i in range(50)],
        "doc_id long, text string",
    )
    a = {(r.doc_id, r.n_tokens, r.avg_logprob) for r in unigram_logprob(df).collect()}
    b = {
        (r.doc_id, r.n_tokens, r.avg_logprob)
        for r in unigram_logprob(df, broadcast_vocab=False).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# source_unigram_kl semantics
# ---------------------------------------------------------------------------
def test_kl_zero_for_identical_sources(spark):
    df = spark.createDataFrame(
        [(1, "x y z", "a"), (2, "x y z", "b")],
        "doc_id long, text string, source string",
    )
    for r in source_unigram_kl(df).collect():
        assert r.kl_bits == 0.0
        assert r.n_tokens == 3


def test_kl_positive_for_skewed_source(spark):
    df = spark.createDataFrame(
        [(1, "x x x x", "skew"), (2, "x y z w", "flat"), (3, "x y z w", "flat")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r.kl_bits for r in source_unigram_kl(df).collect()}
    assert out["skew"] > out["flat"] >= 0.0


# ---------------------------------------------------------------------------
# gopher flags semantics
# ---------------------------------------------------------------------------
def test_gopher_flags_rules_fire(spark):
    long_en = "the " + " ".join(f"word{i} and" for i in range(30))
    short = "tiny doc"
    reps = " ".join(["spam spam"] * 40)
    df = spark.createDataFrame(
        [(1, long_en), (2, short), (3, reps)], "doc_id long, text string"
    )
    flags = TX.gopher_flags("text")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *[c.alias(n) for n, c in flags.items()]
        ).collect()
    }
    assert out[1].pass_words and out[1].pass_stopwords and out[1].keep
    assert not out[2].pass_words and not out[2].keep
    assert not out[3].pass_rep_2gram and not out[3].keep
    # keep is exactly the AND of the individual rules
    for r in out.values():
        rules = [
            r.pass_words, r.pass_mean_len, r.pass_alpha,
            r.pass_stopwords, r.pass_rep_2gram, r.pass_rep_3gram,
        ]
        assert r.keep == all(rules)


# ---------------------------------------------------------------------------
# oracle parity on the real corpus
# ---------------------------------------------------------------------------
def test_unigram_logprob_oracle(spark, sf_dir):
    con = duck_connection(sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = compare(unigram_logprob(docs), con, unigram_logprob_sql("documents"))
    assert rep["match"], rep


def test_source_unigram_kl_oracle(spark, sf_dir):
    con = duck_connection(sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = compare(source_unigram_kl(docs), con, source_unigram_kl_sql("documents"))
    assert rep["match"], rep


def test_gopher_rules_oracle(spark, sf_dir):
    con = duck_connection(sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flags = TX.gopher_flags("text")
    spark_df = docs.select("doc_id", *[c.alias(n) for n, c in flags.items()])
    sql = "SELECT doc_id, " + ", ".join(
        f"{s} AS {n}" for n, s in TX.gopher_flags_sql("text").items()
    ) + " FROM documents"
    rep = compare(spark_df, con, sql)
    assert rep["match"], rep


# ---------------------------------------------------------------------------
# property tests (hypothesis): information-theoretic invariants
# ---------------------------------------------------------------------------
from hypothesis import given, settings, strategies as st

_corpus = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=6),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None)
@given(_corpus)
def test_kl_nonnegative_and_logprob_nonpositive(data):
    """Gibbs' inequality: KL(source ‖ corpus) ≥ 0 for every source;
    unigram probabilities ≤ 1 so every avg log10 prob ≤ 0."""
    spark = get_spark(app_name="bergloom-tests")
    rows = [
        (i, " ".join(toks), src) for i, (src, toks) in enumerate(data)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    for r in source_unigram_kl(df).collect():
        assert r.kl_bits >= 0.0, r
    for r in unigram_logprob(df).collect():
        assert r.avg_logprob <= 0.0, r
        assert r.n_tokens >= 1


# ---------------------------------------------------------------------------
# bigram LM (round 2)
# ---------------------------------------------------------------------------
def test_bigram_logprob_invariants_and_transition_counts(spark):
    from bergloom_spark.operators import lm

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),
            (2, "a b a b"),
            (3, "x"),      # 1 token: no transitions
            (4, ""),       # empty
        ],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r for r in lm.bigram_logprob(docs).collect()}
    assert out[1]["n_transitions"] == 7
    assert out[2]["n_transitions"] == 3
    assert out[3]["n_transitions"] == 0 and out[3]["avg_logprob"] is None
    assert out[4]["n_transitions"] == 0 and out[4]["avg_logprob"] is None
    # log-probabilities of events with probability <= 1
    assert out[1]["avg_logprob"] <= 0.0


def test_bigram_scores_transition_typicality(spark):
    """Word salad built from COMMON tokens fools the unigram score but
    not the bigram score: a doc whose transitions never occur in the
    rest of the corpus must score lower than an in-pattern doc."""
    from bergloom_spark.operators import lm

    pattern_docs = [(i, "the cat sat on the mat " * 5) for i in range(10)]
    salad = (99, "mat the on sat cat the " * 5)
    docs = spark.createDataFrame(
        pattern_docs + [salad], "doc_id: long, text: string"
    )
    out = {r["doc_id"]: r["avg_logprob"] for r in lm.bigram_logprob(docs).collect()}
    assert out[99] < out[0]
