"""Spike 2 (r14): full ngram_jaccard_pairs — current operator (G0) vs
explode+codegen-hash restructure (G1) with the per-(h,id) distinct fused
into the one hash exchange (repartition(h) -> complete agg -> window).

Also: duplicate_spans / dedup_remove_spans current (S0/R0) vs span-hash
after explode (S1/R1).

Alternating passes in one JVM; equality checked by sorted collect.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

from pyspark.sql import Window
from pyspark.sql import functions as F

from bergloom_spark.session import get_spark
from bergloom_spark.functions import text as TX
from bergloom_spark.functions.hashing import hash64
from bergloom_spark.operators import dedup
from bergloom_spark.plans.runtime_metrics import StageMetricsCapture

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ngram_g1(df, text_col, id_col, threshold, max_doc_freq):
    """Explode+codegen variant of dedup.ngram_jaccard_pairs."""
    P = dedup.MINHASH_PRIME
    sh = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        TX.shingles(text_col, 3).alias("__sh"),
    )
    # same InferFiltersFromGenerate barrier need as the current form
    sh = sh.observe("__g1_hs_barrier", F.count(F.lit(1)).alias("rows"))
    postings = sh.select(
        "__id", F.explode("__sh").alias("__s")
    ).select("__id", (hash64(F.col("__s")) % P).alias("__h"))
    # ONE exchange: repartition by __h; the per-(h,id) distinct becomes
    # a complete (non-partial) aggregation on the already-partitioned
    # rows; the window count and the posting-list aggregation reuse the
    # same partitioning.
    kept = postings.repartition("__h").groupBy("__h", "__id").agg(
        F.count(F.lit(1)).alias("__cnt")
    ).drop("__cnt")
    kept = (
        kept.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("__h"))
        )
        .filter(F.col("__df") <= max_doc_freq)
        .drop("__df")
    )
    byhash = kept.groupBy("__h").agg(
        F.sort_array(F.collect_list("__id")).alias("__ids")
    )
    exploded = byhash.select(
        F.explode(
            F.expr(
                "concat("
                "transform(__ids, x -> struct(x AS a, "
                "CASE WHEN false THEN x END AS b)), "
                "flatten(transform(__ids, (x, i) -> "
                "transform(slice(__ids, i + 2, size(__ids)), "
                "y -> struct(x AS a, y AS b)))))"
            )
        ).alias("__p")
    )
    agg = exploded.groupBy(
        F.col("__p.a").alias("__a"), F.col("__p.b").alias("__b")
    ).agg(F.count(F.lit(1)).alias("__c"))
    agg = agg.observe("__g1_pairs_barrier", F.count(F.lit(1)).alias("rows"))
    inter = agg.filter(F.col("__b").isNotNull()).select(
        F.col("__a").alias("id_a"),
        F.col("__b").alias("id_b"),
        F.col("__c").alias("__i"),
    )
    sizes = agg.filter(F.col("__b").isNull()).select(
        F.col("__a").alias("__id"), F.col("__c").alias("__n")
    )
    na = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__i").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("__i")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def spans_exploded_hashed(df, text_col, id_col, window, stride):
    toks = TX.tokens(text_col)
    max_start = F.size(toks) - (window - 1)
    starts = F.when(
        max_start >= 1,
        F.sequence(F.lit(1), max_start, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    spans = F.transform(
        starts,
        lambda i: F.struct(
            i.cast("int").alias("start"),
            F.concat_ws(" ", F.slice(toks, i, window)).alias("txt"),
        ),
    )
    out = df.select(
        F.col(id_col).alias("doc_id"), spans.alias("__sp")
    )
    out = out.observe(
        f"__span_barrier_{id(df) % 100000}", F.count(F.lit(1)).alias("rows")
    )
    return out.select(
        "doc_id", F.explode("__sp").alias("__s")
    ).select(
        "doc_id",
        F.col("__s.start").alias("start"),
        hash64(F.col("__s.txt")).alias("h"),
    )


def dup_spans_g1(df, text_col, id_col, window=20, stride=10, min_docs=2):
    spans = spans_exploded_hashed(df, text_col, id_col, window, stride)
    per_hd = spans.repartition("h").groupBy("h", "doc_id").agg(
        F.count(F.lit(1)).alias("__c")
    )
    dup_counts = (
        per_hd.withColumn(
            "__nd", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("__nd") >= min_docs)
        .groupBy("doc_id")
        .agg(F.sum("__c").alias("n_dup_spans"))
    )
    toks = TX.tokens(text_col)
    max_start = F.size(toks) - (window - 1)
    n_spans = F.when(
        max_start >= 1,
        ((max_start - 1) / F.lit(stride)).cast("long") + 1,
    ).otherwise(F.lit(0))
    per_doc = df.select(
        F.col(id_col).alias("doc_id"), n_spans.alias("n_spans")
    )
    return per_doc.join(dup_counts, "doc_id", "left").select(
        "doc_id",
        "n_spans",
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.round(
            F.coalesce("n_dup_spans", F.lit(0)).cast("double")
            / F.greatest("n_spans", F.lit(1)).cast("double"),
            6,
        ).alias("dup_span_frac"),
    )


def main() -> None:
    spark = get_spark(app_name="spike-ngram-full")
    docs = entry_mod.TS(spark, SF_DIR, "documents")
    cap = dedup.auto_stop_shingle_cap(
        entry_mod._documents_count(spark, SF_DIR)
    )

    def g0(_):
        return dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.2, max_doc_freq=cap
        )

    def g1(_):
        return ngram_g1(docs, "text", "doc_id", 0.2, cap)

    def s0(_):
        from bergloom_spark.operators.spans import duplicate_spans

        return duplicate_spans(
            docs, "text", "doc_id", window=20, stride=10, min_docs=2
        )

    def s1(_):
        return dup_spans_g1(docs, "text", "doc_id")

    variants = {"G0": g0, "G1": g1, "S0": s0, "S1": s1}

    # equality first (cheap insurance before burning bench passes)
    a = sorted(g0(None).collect())
    b = sorted(g1(None).collect())
    print("G0==G1:", a == b, len(a), len(b), flush=True)
    c = sorted(s0(None).collect())
    d = sorted(s1(None).collect())
    print("S0==S1:", c == d, len(c), len(d), flush=True)

    for name, fn in variants.items():
        for _ in range(2):
            fn(None).write.format("noop").mode("overwrite").save()
    results = {n: [] for n in variants}
    ios = {}
    for i in range(5):
        for name, fn in variants.items():
            spark.sparkContext._jvm.System.gc()
            cap_m = None
            if i == 2:
                cap_m = StageMetricsCapture(spark)
                cap_m.__enter__()
            spark.sparkContext.setJobDescription(f"{name}:pass{i}")
            t0 = time.monotonic()
            fn(None).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            if cap_m is not None:
                cap_m.__exit__(None, None, None)
                ios[name] = cap_m.metrics
            results[name].append(round(dt, 3))
    for name, samples in results.items():
        io = ios.get(name, {})
        print(
            name,
            "best", min(samples),
            "samples", samples,
            "exec_core_s", round(io.get("executor_run_time_ms", 0) / 1000, 1),
            "stages", io.get("n_stages"),
            "shuffleW_MB", round(io.get("shuffle_write_bytes", 0) / 1e6, 2),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
