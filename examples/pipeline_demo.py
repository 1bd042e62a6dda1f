"""End-to-end training-data curation demo: raw corpus → filtered,
deduplicated, leakage-safe, packed dataset committed to a lake table.

The pipeline a user of this engine would actually run, composed from
the operators in bergloom_spark — every stage is a DataFrame transform
(scan-side expressions + a handful of hash-keyed shuffles), so the
same script scales from this demo corpus to a cluster-sized one.

Stages:
  1. quality gates: Gopher rule battery + hashed linear classifier
  2. exact dedup (byte-identical clones)
  3. near-dup resolution: MinHash-LSH pairs → connected components →
     keep the highest-quality doc per cluster
  4. cross-doc boilerplate removal (exact-substring span excision)
  5. leakage-safe train/val/test split on the near-dup cluster label
  6. sequence packing (token-budget packing of the train split)
  7. commit the curated corpus to a lake table + print a report card

Run:  python examples/pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bergloom_spark.functions import text as TX  # noqa: E402
from bergloom_spark.lake import LakeTable  # noqa: E402
from bergloom_spark.operators import classifier as CL  # noqa: E402
from bergloom_spark.operators import dedup  # noqa: E402
from bergloom_spark.operators.packing import pack_sequences  # noqa: E402
from bergloom_spark.operators.sampling import split_assign  # noqa: E402
from bergloom_spark.operators.spans import remove_duplicate_spans  # noqa: E402
from bergloom_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="bergloom-pipeline-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 1. Quality gates — all scan-side expressions, one pass.
    weights = CL.default_weights_millis(256)
    gopher_keep = TX.gopher_flags("text")["keep"]
    gated = (
        docs.withColumn(
            "logit_millis", CL.hashed_linear_logit_millis("text", weights)
        )
        .filter(gopher_keep & (F.col("logit_millis") > -2000))
        .withColumn("quality", TX.quality_score("text"))
    )
    n1 = gated.count()

    # 2. Exact dedup: collapse byte-identical clones (keep min doc_id).
    exact = dedup.exact_dedup(gated, ["text"], "doc_id")
    n2 = exact.count()

    # 3. Near-dup resolution: keep the BEST doc of each cluster.
    pairs = dedup.minhash_lsh_pairs(
        exact, "text", "doc_id", k=8, bands=4, threshold=0.5, cache=False
    )
    kept = dedup.keep_best_per_cluster(
        exact, pairs.select("id_a", "id_b"), score_col="quality"
    )  # (doc_id, quality, cluster) — the cluster label is reused below
    survivors = exact.join(kept.select("doc_id", "cluster"), "doc_id")
    n3 = survivors.count()

    # 4. Cross-doc boilerplate: excise duplicated 20-token blocks.
    cleaned = remove_duplicate_spans(survivors, "text", "doc_id", window=20)
    corpus = survivors.drop("text").join(
        cleaned.select("doc_id", "clean_text", "n_removed"), "doc_id"
    )

    # 5. Leakage-safe split: hash-split on the near-dup CLUSTER label
    #    (from step 3) so paraphrases never straddle train/test.
    split = split_assign(
        corpus, "cluster", {"train": 0.9, "val": 0.05, "test": 0.05}
    )

    # 6. Pack the train split into ≤512-token sequences.
    train = split.filter(F.col("split") == "train").select(
        "doc_id", TX.token_count("clean_text").cast("long").alias("n_tokens")
    )
    packs = pack_sequences(train, "doc_id", "n_tokens", max_tokens=512)
    n_packs = packs.select("pack_id").distinct().count()

    # 7. Commit the curated corpus to a lake table.
    root = os.path.join(tempfile.mkdtemp(prefix="bergloom-corpus-"), "curated")
    out = split.select(
        "doc_id", "lang", "source", "quality", "n_removed", "cluster",
        "split", F.col("clean_text").alias("text"),
    )
    table = LakeTable.create(spark, root, out.schema)
    table.append(out)

    by_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print("── curated-corpus report card ──────────────────────────")
    print(f"  raw docs          {n0}")
    print(f"  after quality     {n1}   (-{n0 - n1})")
    print(f"  after exact dedup {n2}   (-{n1 - n2})")
    print(f"  after near-dup    {n3}   (-{n2 - n3})")
    print(f"  splits            {by_split}")
    print(f"  train packs       {n_packs} (≤512 tokens each)")
    print(f"  lake table        {root}")
    print(f"  snapshot          {table.meta.current_snapshot_id}")
    spark.stop()


if __name__ == "__main__":
    main()
