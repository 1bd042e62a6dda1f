"""Vector-search demo: the three-stage ANN layout a 100 TB corpus
uses, composed from bergloom_spark operators on the real embeddings
testdata.

  1. ROUTE    — IVF: probes pick nprobe nearest centroids; only those
                posting lists are scanned (nprobe/n_centroids of the
                corpus).
  2. SHORTLIST— PQ asymmetric distance inside the routed candidates
                (bytes per vector instead of floats).
  3. RE-RANK  — exact cosine on the shortlist (tiny).

Here each stage also runs standalone so the demo prints the recall
ladder against exact brute force — the measurement loop you'd run
when tuning nprobe / shortlist size on a real corpus.

Run:  python examples/vector_search_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bergloom_spark.operators import pq as PQ  # noqa: E402
from bergloom_spark.operators import similarity as sim  # noqa: E402
from bergloom_spark.session import get_spark  # noqa: E402

PROBES = list(range(0, 40, 4))
K = 5


def recall(approx_rows, truth) -> float:
    got: dict[int, set[int]] = {}
    for r in approx_rows:
        got.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(p, set()) & truth[p]) for p in truth)
    return hits / (len(truth) * K)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="bergloom-vector-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    truth: dict[int, set[int]] = {}
    for r in sim.knn_bruteforce(emb, PROBES, k=K).collect():
        truth.setdefault(r["probe_id"], set()).add(r["neighbor_id"])

    ladder = [
        ("LSH 4x8 multiprobe-1",
         sim.knn_lsh(emb, PROBES, k=K, n_planes=8, n_tables=4,
                     multiprobe_hamming=1).collect()),
        ("LSH 8x6 multiprobe-2",
         sim.knn_lsh(emb, PROBES, k=K, n_planes=6, n_tables=8,
                     multiprobe_hamming=2).collect()),
        ("IVF 16c nprobe=4",
         sim.knn_ivf(emb, PROBES, k=K, n_centroids=16, nprobe=4).collect()),
        ("IVF 16c nprobe=12",
         sim.knn_ivf(emb, PROBES, k=K, n_centroids=16, nprobe=12).collect()),
        ("PQ-ADC 8x16 (k=5 direct)",
         PQ.knn_pq_adc(emb, PROBES, k=K, n_subspaces=8,
                       n_codes=16).collect()),
    ]
    # PQ as SHORTLIST + exact re-rank: take PQ's top-50, exact-rank them.
    shortlist = PQ.knn_pq_adc(emb, PROBES, k=50, n_subspaces=8, n_codes=16)
    short_ids = {}
    for r in shortlist.collect():
        short_ids.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    exact = sim.knn_bruteforce(emb, PROBES, k=50).collect()
    rerank = [
        r for r in exact
        if r["neighbor_id"] in short_ids.get(r["probe_id"], set())
    ]
    # keep best K per probe after the shortlist filter
    best: dict[int, list] = {}
    for r in sorted(rerank, key=lambda r: (r["probe_id"], -r["cosine_sim"])):
        best.setdefault(r["probe_id"], [])
        if len(best[r["probe_id"]]) < K:
            best[r["probe_id"]].append(r)
    ladder.append(
        ("PQ shortlist-50 + exact re-rank", [r for v in best.values() for r in v])
    )

    print("── ANN recall ladder (vs exact brute force) ───────────")
    for name, rows in ladder:
        print(f"  {name:32s} recall@{K} = {recall(rows, truth):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
