"""Near-dup detector QUALITY gates on real corpus text.

Correctness tests pin that minhash/simhash compute their definitions;
these pin that the detectors actually CATCH near-duplicates: plant
mutated copies of real docs (every 20th token replaced — ~95% shingle
overlap) and assert recovery rates, plus the MinHash Jaccard
estimator's error against exact shingle Jaccard. Deterministic
operators → deterministic gates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bergloom_spark.operators import dedup

SF = "/root/testdata/sf0.01"
N_DOCS = 150
MUT_OFFSET = 100_000


def _mutate(text: str) -> str:
    toks = text.split()
    return " ".join(
        ("MUTATED" if i % 20 == 10 else t) for i, t in enumerate(toks)
    )


@pytest.fixture(scope="module")
def planted(spark):
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < N_DOCS)
        .select("doc_id", "text")
        .collect()
    )
    base = [(r["doc_id"], r["text"]) for r in rows]
    mutated = [(i + MUT_OFFSET, _mutate(t)) for i, t in base]
    df = spark.createDataFrame(base + mutated, "doc_id: long, text: string")
    return df, {i for i, _ in base}


def _planted_recall(pairs_df, base_ids) -> float:
    found = {
        (r["id_a"], r["id_b"]) for r in pairs_df.collect()
    }
    hits = sum(1 for i in base_ids if (i, i + MUT_OFFSET) in found)
    return hits / len(base_ids)


def test_minhash_lsh_catches_planted_near_dups(spark, planted):
    df, base_ids = planted
    pairs = dedup.minhash_lsh_pairs(
        df, "text", "doc_id", k=8, bands=4, threshold=0.5, cache=False
    )
    r = _planted_recall(pairs, base_ids)
    assert r >= 0.85, f"MinHash-LSH planted recall collapsed: {r:.2f}"


def test_simhash_catches_single_token_edits(spark):
    """SimHash's regime: NEAR-identical docs. On these short ~60-token
    docs a single changed token lands at hamming ~3 of 60 (measured:
    median 3, 96% ≤ 7) — a 5% edit already drifts to hamming ~5 and
    slips past max_hamming=3, which is why minhash-LSH (85%+ at 5%
    edits, test above) is the robust detector for paraphrase-level
    dedup and simhash is the cheap exact-ish one."""
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < N_DOCS)
        .select("doc_id", "text")
        .collect()
    )
    base = [(r["doc_id"], r["text"]) for r in rows]
    one_edit = [
        (
            i + MUT_OFFSET,
            " ".join(
                ("MUTATED" if j == 10 else t)
                for j, t in enumerate(tx.split())
            ),
        )
        for i, tx in base
    ]
    df = spark.createDataFrame(
        base + one_edit, "doc_id: long, text: string"
    )
    pairs = dedup.simhash_pairs(df, "text", "doc_id", max_hamming=3)
    r = _planted_recall(pairs, {i for i, _ in base})
    assert r >= 0.55, f"SimHash single-edit recall collapsed: {r:.2f}"


def test_simhash_separates_planted_from_random(spark, planted):
    """Even where banded pairing misses, the SIGNAL must be present:
    planted 5%-mutated pairs sit far below random pairs in hamming."""
    df, base_ids = planted
    sigs = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", dedup.simhash("text").alias("s")
        ).collect()
    }
    planted_h = [
        bin(sigs[i] ^ sigs[i + MUT_OFFSET]).count("1") for i in base_ids
    ]
    ids = sorted(base_ids)
    random_h = [
        bin(sigs[a] ^ sigs[b]).count("1")
        for a, b in zip(ids, ids[1:])  # distinct real docs
    ]
    mean_p = sum(planted_h) / len(planted_h)
    mean_r = sum(random_h) / len(random_h)
    assert mean_p < 9, f"planted hamming drifted high: {mean_p:.1f}"
    assert mean_r > 2.5 * mean_p, (
        f"no separation: planted {mean_p:.1f} vs random {mean_r:.1f}"
    )


def test_minhash_estimator_error_bounded(spark, planted):
    """Mean |est - exact| Jaccard over recovered planted pairs must sit
    within the k=32 sampling error (σ ≈ √(J(1-J)/32) ≈ 0.09)."""
    df, base_ids = planted
    pairs = dedup.minhash_lsh_pairs(
        df, "text", "doc_id", k=32, bands=4, threshold=0.3, cache=False
    ).collect()
    texts = {r["doc_id"]: r["text"] for r in df.collect()}

    def shingles(t: str) -> set:
        toks = t.split()
        return {tuple(toks[i : i + 3]) for i in range(len(toks) - 2)}

    errs = []
    for r in pairs:
        a, b = shingles(texts[r["id_a"]]), shingles(texts[r["id_b"]])
        exact = len(a & b) / max(1, len(a | b))
        errs.append(abs(r["est_jaccard"] - exact))
    assert errs, "no pairs recovered at threshold 0.3"
    mae = sum(errs) / len(errs)
    assert mae <= 0.12, f"MinHash estimator MAE drifted: {mae:.3f}"


def test_exact_dedup_is_exact_on_planted_clones(spark):
    """Byte-identical clones must collapse to one survivor, mutated
    copies must NOT (exact dedup is not fuzzy)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < 50
    ).select("doc_id", "text")
    clones = docs.select(
        (F.col("doc_id") + MUT_OFFSET).alias("doc_id"), "text"
    )
    both = docs.unionByName(clones)
    kept = dedup.exact_dedup(both, ["text"], "doc_id")
    assert kept.count() == 50
    # keeper is min doc_id per group -> all original ids survive
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == set(range(50))
