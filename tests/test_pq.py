"""Product-quantization tests: encode determinism, the seed self-code
identity, and exact DuckDB-twin parity for encode + ADC top-k."""

from __future__ import annotations

import pyspark.sql.functions as F

from bergloom_spark.functions.hashing import hash64
from bergloom_spark.io import load_table
from bergloom_spark.operators.pq import (
    knn_pq_adc,
    knn_pq_adc_sql,
    pq_codebook,
    pq_encode,
    pq_encode_sql,
)
from tests.oracle_utils import compare, duck_connection

PROBES = [7, 77, 177, 277, 377]


def test_encode_deterministic_and_in_range(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb)
    c1 = {r.vec_id: tuple(r.codes) for r in pq_encode(emb, cb).collect()}
    c2 = {
        r.vec_id: tuple(r.codes)
        for r in pq_encode(emb.repartition(7), cb).collect()
    }
    assert c1 == c2
    assert all(
        0 <= c < len(cb) for codes in c1.values() for c in codes
    )
    assert all(len(codes) == 4 for codes in c1.values())


def test_seed_vectors_encode_to_themselves(spark, sf_dir):
    """Codebook entry j IS seed vector j, so a seed's distance to its
    own entry is exactly 0 in every subspace — its code must be its
    own index (modulo earlier identical subvectors, which random
    float embeddings don't produce)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb)
    seed_ids = [
        r.vec_id
        for r in emb.select("vec_id")
        .orderBy(hash64(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(len(cb))
        .collect()
    ]
    codes = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb, cb)
        .filter(F.col("vec_id").isin(seed_ids))
        .collect()
    }
    for j, sid in enumerate(seed_ids):
        assert codes[sid] == [j] * 4, (j, sid, codes[sid])


def test_encode_matches_duckdb(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb)
    out = pq_encode(emb, cb)
    report = compare(out, duck_connection(sf_dir), pq_encode_sql())
    assert report["match"], report


def test_adc_topk_matches_duckdb(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_pq_adc(emb, PROBES, k=5)
    report = compare(
        out, duck_connection(sf_dir), knn_pq_adc_sql(PROBES, k=5)
    )
    assert report["match"], report


def test_adc_ranks_are_dense_per_probe(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_pq_adc(emb, PROBES, k=5).collect()
    by_probe: dict[int, list[int]] = {}
    for r in out:
        by_probe.setdefault(r.probe_id, []).append(r.rank)
    assert set(by_probe) == set(PROBES)
    for ranks in by_probe.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]
