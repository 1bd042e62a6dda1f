"""ANN quality gates: recall@k of the approximate paths (LSH, IVF,
PQ-ADC) against exact brute-force on the REAL embeddings table.

Correctness tests elsewhere pin that each operator computes what its
oracle computes; these pin that the approximations are GOOD — an ANN
index with 10% recall is "correct" and useless. Thresholds are
deliberately loose lower bounds (the operators are deterministic, so
flakiness can only come from code changes — exactly what we want to
catch: a refactor that silently degrades bucket quality).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bergloom_spark.operators import similarity as sim

SF = "/root/testdata/sf0.01"
PROBES = list(range(0, 40, 4))  # 10 probes
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def exact_topk(spark, emb):
    out = sim.knn_bruteforce(emb, PROBES, k=K)
    truth: dict[int, set[int]] = {}
    for r in out.collect():
        truth.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    assert all(len(v) == K for v in truth.values())
    return truth


def _recall(approx_df, truth) -> float:
    got: dict[int, set[int]] = {}
    for r in approx_df.collect():
        got.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(p, set()) & truth[p]) for p in truth)
    return hits / (len(truth) * K)


def test_lsh_recall_levers(spark, emb, exact_topk):
    """More tables / shorter codes / wider multiprobe must buy recall —
    and a strong setting must actually reach high recall on this
    near-random 64-d corpus (the hard case for LSH)."""
    weak = _recall(
        sim.knn_lsh(emb, PROBES, k=K, n_planes=8, n_tables=4,
                    multiprobe_hamming=1),
        exact_topk,
    )
    strong = _recall(
        sim.knn_lsh(emb, PROBES, k=K, n_planes=6, n_tables=8,
                    multiprobe_hamming=2),
        exact_topk,
    )
    assert strong >= weak
    assert strong >= 0.80, f"LSH strong-setting recall@{K}: {strong:.2f}"


def test_ivf_recall(spark, emb, exact_topk):
    r = _recall(
        sim.knn_ivf(emb, PROBES, k=K, n_centroids=16, nprobe=4), exact_topk
    )
    assert r >= 0.50, f"IVF recall@{K} collapsed: {r:.2f}"


def test_ivf_recall_improves_with_nprobe(spark, emb, exact_topk):
    r1 = _recall(sim.knn_ivf(emb, PROBES, k=K, n_centroids=16, nprobe=2), exact_topk)
    r12 = _recall(sim.knn_ivf(emb, PROBES, k=K, n_centroids=16, nprobe=12), exact_topk)
    assert r12 >= r1  # the recall lever must actually lever
    assert r12 >= 0.85


def test_pq_adc_shortlist_recall(spark, emb, exact_topk):
    """PQ on near-random vectors is the worst case for quantization
    (no intrinsic low-dimensional structure to exploit), so PQ-ADC is
    used as a SHORTLIST generator here: assert the shortlist lever
    works (bigger shortlist captures more of the exact top-5) and a
    50-candidate shortlist captures a usable majority — the exact
    re-rank of 50 candidates is then cheap.
    """
    from bergloom_spark.operators import pq

    def shortlist_recall(ksl: int) -> float:
        approx = pq.knn_pq_adc(
            emb, PROBES, k=ksl, n_subspaces=8, n_codes=16,
            id_col="vec_id", vec_col="embedding",
        )
        return _recall(approx, exact_topk)

    r5, r50 = shortlist_recall(5), shortlist_recall(50)
    assert r50 >= r5
    assert r50 >= 0.55, f"PQ 50-shortlist recall collapsed: {r50:.2f}"


def test_pq_finer_codebook_buys_recall(spark, emb, exact_topk):
    from bergloom_spark.operators import pq

    def rec(ns: int) -> float:
        return _recall(
            pq.knn_pq_adc(
                emb, PROBES, k=K, n_subspaces=ns, n_codes=16,
                id_col="vec_id", vec_col="embedding",
            ),
            exact_topk,
        )

    assert rec(16) >= rec(8)
