"""BM25 retrieval, fuzzy matching, and deterministic sampling tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bergloom_spark.operators.sampling import stratified_sample_hash
from bergloom_spark.operators.search import bm25_score, fuzzy_match


def test_bm25_ranks_term_matches_higher(spark):
    docs = spark.createDataFrame(
        [
            (1, "vector vector stream other words here"),
            (2, "vector alone in a longer document with many other words"),
            (3, "nothing relevant at all in this one"),
            (4, "stream stream stream"),
        ],
        "doc_id long, text string",
    )
    out = bm25_score(docs, ["vector", "stream"], top_k=10).collect()
    ids = [r.doc_id for r in out]
    assert 3 not in ids  # zero-score docs are dropped
    assert ids[0] == 1  # matches both terms, twice each
    assert all(out[i].bm25 >= out[i + 1].bm25 for i in range(len(out) - 1))


def test_bm25_empty_terms_rejected(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_score(docs, [])


def test_fuzzy_match_distance_semantics(spark):
    corpus = spark.createDataFrame(
        [(1, "red widget"), (2, "red widgat"), (3, "blue bolt"), (4, "red midget")],
        "id long, name string",
    )
    probes = corpus.filter(F.col("id") == 1)
    out = {
        (r.probe_id, r.match_id): r.dist
        for r in fuzzy_match(
            corpus, probes, "name", "id", "name", "id", max_dist=2
        ).collect()
    }
    assert (1, 1) not in out  # self excluded
    assert out[(1, 2)] == 1 and out[(1, 4)] == 1
    assert (1, 3) not in out  # too far


def test_stratified_sample_deterministic_and_exact_strata(spark, sf_dir):
    from bergloom_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    frac = {"error": 1.0, "view": 0.0}
    s1 = stratified_sample_hash(ev, "event_type", "event_id", frac)
    s2 = stratified_sample_hash(ev, "event_type", "event_id", frac)
    r1 = sorted(r.event_id for r in s1.select("event_id").collect())
    assert r1 == sorted(r.event_id for r in s2.select("event_id").collect())
    # fraction 1.0 keeps every error row; 0.0 keeps no view rows
    n_err = ev.filter(F.col("event_type") == "error").count()
    got = s1.groupBy("event_type").count().collect()
    by_type = {r.event_type: r["count"] for r in got}
    assert by_type.get("error") == n_err
    assert "view" not in by_type
    # default_fraction=0.0 drops unlisted strata entirely
    assert set(by_type) <= {"error"} | (set(by_type) - {"view"})


def test_stratified_sample_rate_roughly_respected(spark, sf_dir):
    from bergloom_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    n_all = ev.count()
    kept = stratified_sample_hash(
        ev, "event_type", "event_id", {}, default_fraction=0.5
    ).count()
    assert 0.35 * n_all < kept < 0.65 * n_all


def test_mixture_resample_hits_target_proportions(spark, sf_dir):
    """Output language shares track the target weights (the limiting
    domain is kept whole; others are hash-gated down), and the gate is
    deterministic across invocations."""
    from bergloom_spark.io import load_table
    from bergloom_spark.operators.sampling import (
        mixture_resample,
        mixture_thresholds,
    )

    docs = load_table(spark, sf_dir, "documents")
    weights = {"en": 0.3, "de": 0.2, "es": 0.2, "fr": 0.2, "zh": 0.1}
    out = mixture_resample(docs, "lang", "doc_id", weights)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(got.values())
    # Small-sample hash noise: each share within 6 points of target.
    for lang, w in weights.items():
        assert abs(got.get(lang, 0) / total - w) < 0.06, (lang, got, total)
    # Limiting domain kept (nearly) whole: its threshold is SCALE-ish.
    counts = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    thr = mixture_thresholds(counts, weights)
    limiting = min(counts, key=lambda d: counts[d] / weights[d])
    assert thr[limiting] == 1_000_000
    # Deterministic: second run selects the identical id set.
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {r["doc_id"] for r in
         mixture_resample(docs, "lang", "doc_id", weights)
         .select("doc_id").collect()}
    assert a == b


def test_mixture_resample_drops_unweighted_domains(spark):
    from bergloom_spark.operators.sampling import mixture_resample

    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(100)],
        ["id", "dom"],
    )
    out = mixture_resample(df, "dom", "id", {"keep": 1.0})
    assert out.filter(F.col("dom") == "drop").count() == 0
    assert out.filter(F.col("dom") == "keep").count() == 50


# ---------------------------------------------------------------------------
# weighted_sample (round 2): sequential Poisson, weight-proportional
# ---------------------------------------------------------------------------
def test_weighted_sample_deterministic_and_weight_biased(spark):
    import pyspark.sql.functions as F

    from bergloom_spark.operators.sampling import weighted_sample

    # 100 light rows (w=1) + 100 heavy rows (w=50): a 50-row sample
    # should be dominated by heavy rows.
    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") < 100, 1.0).otherwise(50.0).alias("w"),
    )
    s1 = sorted(r["id"] for r in weighted_sample(df, "w", 50, "id").collect())
    s2 = sorted(r["id"] for r in weighted_sample(df, "w", 50, "id").collect())
    assert s1 == s2  # deterministic
    assert len(s1) == 50
    heavy = sum(1 for i in s1 if i >= 100)
    assert heavy >= 40  # inclusion ∝ weight (50:1 odds per row)


def test_weighted_sample_stratified_counts(spark):
    import pyspark.sql.functions as F

    from bergloom_spark.operators.sampling import weighted_sample

    df = spark.range(90).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("s"),
        F.lit(1.0).alias("w"),
    )
    out = weighted_sample(df, "w", 5, "id", strata_cols=["s"])
    counts = {
        r["s"]: r["n"]
        for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"0": 5, "1": 5, "2": 5}


def test_weighted_sample_oracle_parity(spark, tmp_path):
    import duckdb
    import pyspark.sql.functions as F

    from bergloom_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_sql,
    )
    from tests.oracle_utils import compare

    p = str(tmp_path / "d.parquet")
    spark.range(300).select(
        F.col("id"),
        ((F.col("id") % 13) + 1).cast("double").alias("w"),
        (F.col("id") % 4).cast("string").alias("s"),
    ).write.parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    compare(
        weighted_sample(
            spark.read.parquet(p), "w", 10, "id", strata_cols=["s"]
        ),
        con,
        weighted_sample_sql("t", "w", 10, "id", ["s"]),
    )


def test_leakage_safe_split_keeps_clusters_together(spark):
    import pyspark.sql.functions as F

    from bergloom_spark.operators import dedup
    from bergloom_spark.operators.sampling import split_assign

    # Planted pair graph: clusters {1,2,3}, {7,8}; singletons 4,5,6.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a: long, id_b: long"
    )
    docs = spark.range(1, 9).select(F.col("id").alias("doc_id"))
    comp = dedup.connected_components(pairs, "id_a", "id_b")
    labeled = docs.join(
        comp, on=F.col("doc_id") == F.col("node"), how="left"
    ).select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster"),
    )
    out = split_assign(labeled, "cluster", {"train": 0.5, "val": 0.5})
    splits = {r["doc_id"]: r["split"] for r in out.collect()}
    assert splits[1] == splits[2] == splits[3]
    assert splits[7] == splits[8]


# ---------------------------------------------------------------------------
# keyword_tag_counts (round 2)
# ---------------------------------------------------------------------------
def test_keyword_tag_counts_token_aligned_and_overlapping(spark):
    from bergloom_spark.operators.search import keyword_tag_counts

    docs = spark.createDataFrame(
        [
            (1, "bad word here and bad word again"),
            (2, "badword is one token"),        # no token-aligned match
            (3, "x x x"),                        # overlapping "x x" twice
            (4, ""),
        ],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: r
        for r in keyword_tag_counts(
            docs, "text", "doc_id",
            {"block": ["bad word"], "rep": ["x x"], "uni": ["token"]},
        ).collect()
    }
    assert out[1]["block"] == 2 and out[1]["rep"] == 0
    assert out[2]["block"] == 0 and out[2]["uni"] == 1
    assert out[3]["rep"] == 2  # overlapping starts both count
    assert out[4]["block"] == 0 and out[4]["rep"] == 0 and out[4]["uni"] == 0


def test_keyword_tag_counts_plan_is_scan_side(spark):
    from bergloom_spark.operators.search import keyword_tag_counts
    from bergloom_spark.plans import explain as X

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = keyword_tag_counts(
        docs, "text", "doc_id", {"t": ["slow", "fast table"]}
    )
    assert X.count_shuffles(df) == 0
