"""Per-key quota, TF-IDF/ngram mining, quantization, and centroid
histogram — behavior semantics plus DuckDB-oracle parity for each new
driver query (the same comparator the driver's correctness gate uses).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bergloom_spark.operators.sampling import per_key_quota
from bergloom_spark.operators.search import corpus_top_ngrams, tfidf_top_terms
from bergloom_spark.operators.similarity import centroid_histogram, quantize_int8

from oracle_utils import duck_connection, compare


# ---------------------------------------------------------------------------
# per_key_quota semantics
# ---------------------------------------------------------------------------
def test_per_key_quota_matches_single_window(spark, sf_dir):
    """Two-phase salted plan keeps EXACTLY the rows the naive window
    keeps, for several salt widths (including 1 = degenerate)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy("doc_id")
    expected = {
        r.doc_id
        for r in docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 7)
        .collect()
    }
    for buckets in (1, 4, 32):
        got = {
            r.doc_id
            for r in per_key_quota(docs, "source", "doc_id", 7, buckets).collect()
        }
        assert got == expected


def test_per_key_quota_caps_hot_key(spark):
    rows = [(i, "hot" if i % 10 else "cold") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, key string")
    out = per_key_quota(df, "key", "id", 5).groupBy("key").count().collect()
    counts = {r.key: r["count"] for r in out}
    assert counts == {"hot": 5, "cold": 5}
    # keeps the FIRST by order column
    kept_hot = sorted(
        r.id
        for r in per_key_quota(df, "key", "id", 5)
        .filter(F.col("key") == "hot")
        .collect()
    )
    assert kept_hot == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# tf-idf / n-gram semantics
# ---------------------------------------------------------------------------
def test_tfidf_ranks_rare_terms_higher(spark):
    docs = spark.createDataFrame(
        [
            (1, "common zebra zebra common"),
            (2, "common words only common"),
            (3, "common again and again"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, "text", "doc_id", k=1).collect()
    top = {r.doc_id: r.term for r in out}
    # same tf as 'common' but df 1 vs 3 → idf lifts 'zebra' to the top
    assert top[1] == "zebra"


def test_corpus_top_ngrams_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    out = {
        r.ngram: r.n_occurrences
        for r in corpus_top_ngrams(docs, "text", n=2, top_k=10).collect()
    }
    assert out["a b"] == 4  # three in doc 1, one in doc 2
    assert out["b a"] == 2


# ---------------------------------------------------------------------------
# vector ops semantics
# ---------------------------------------------------------------------------
def test_quantize_int8_bounds_and_recovery(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = quantize_int8(emb)
    stats = out.select(
        F.max(F.array_max("q")).alias("hi"),
        F.min(F.array_min("q")).alias("lo"),
    ).collect()[0]
    assert stats.hi == 127 and stats.lo >= -127
    # every vector's max-|component| element quantizes to exactly ±127
    assert (
        out.filter(F.array_max(F.transform("q", lambda x: F.abs(x))) != 127).count()
        == 0
    )


def test_kmeans_refine_matches_local_lloyd(spark, sf_dir):
    """The distributed operator must equal a naive single-process
    NumPy Lloyd run (same seeds, same integer-microunit means) — the
    distribution strategy is pure plumbing, never semantics."""
    import numpy as np

    from bergloom_spark.operators.similarity import (
        deterministic_centroids,
        kmeans_refine,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k, iters = 4, 2
    out = {
        r.centroid_id: r.n_vectors
        for r in kmeans_refine(emb, n_centroids=k, iters=iters).collect()
    }
    assert sum(out.values()) == emb.count()

    m = np.stack([r.embedding for r in emb.select("embedding").collect()]).astype(
        np.float64
    )
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cm = deterministic_centroids(emb, k)
    for _ in range(iters):
        cid = np.argmax(m @ cm.T, axis=1)
        q = np.round(m * 1e6).astype(np.int64)
        new = np.array(cm)
        for c in range(k):
            mask = cid == c
            if mask.any():
                mean = q[mask].sum(axis=0).astype(np.float64) / (
                    mask.sum() * 1e6
                )
                new[c] = mean / np.linalg.norm(mean)
        cm = new
    cid = np.argmax(m @ cm.T, axis=1)
    want = {int(c): int((cid == c).sum()) for c in np.unique(cid)}
    assert out == want


def test_centroid_histogram_partitions_corpus(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = centroid_histogram(emb, n_centroids=8).collect()
    assert sum(r.n_vectors for r in out) == emb.count()
    assert all(0 <= r.centroid_id < 8 for r in out)


# ---------------------------------------------------------------------------
# driver-gate parity for every new query
# ---------------------------------------------------------------------------
def test_new_queries_match_oracles(spark, sf_dir):
    import __spark_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    con = duck_connection(sf_dir)
    for name in (
        "quality_top_frac",
        "per_source_quota",
        "tfidf_top_terms",
        "bigram_top50",
        "centroid_histogram",
        "embedding_quantize",
        "knn_vectorized",
        "knn_lsh",
        "knn_ivf",
        "corpus_report_card",
        "kmeans_refine",
    ):
        rep = compare(q[name](spark, sf_dir), con, o[name])
        assert rep["match"], (name, rep)
