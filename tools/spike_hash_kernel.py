"""Spike (r14, not part of the bench): measure interpreted-HOF md5
hashing vs post-explode codegen hashing on the sf0.1 documents corpus.

Hypothesis (guide §1 first-principles + §4 "built-ins with codegen"):
`transform(shingles, s -> md5(s))` evaluates the md5/conv chain through
the INTERPRETED HigherOrderFunction path (HOFs have no doGenCode), while
`explode(shingles)` followed by a TOP-LEVEL hash64(s) runs the same
expressions through whole-stage codegen. Same values, same counts —
only the evaluation engine differs.

Variants over documents(text):
  A  current ngram scan: array_distinct(transform(shingles, md5...))
  B  explode(shingles) -> top-level hash64 % prime (no distinct)
  C  B + per-doc distinct via groupBy(id, h) (ngram-posting equivalence)
  D  current minhash sigs: transform-based hashes + k perm-min transforms
  E  explode+top-level hash -> groupBy(id).agg(k codegen min()) -> array
  S  shingle STRINGS only (the transform(concat_ws(slice)) part alone)
  T  tokens only (split+filter alone)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

from bergloom_spark.session import get_spark
from bergloom_spark.functions import text as TX
from bergloom_spark.functions.hashing import hash64, HASH_MAX
from bergloom_spark.operators import dedup
from bergloom_spark.plans.runtime_metrics import StageMetricsCapture

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="spike-hash-kernel")
    # same fan-out as the real queries (single-row-group parquet scans
    # as ONE task otherwise)
    docs = entry_mod.TS(spark, SF_DIR, "documents")
    P = dedup.MINHASH_PRIME

    def vA(d):
        return d.select(
            F.col("doc_id").alias("__id"),
            F.array_distinct(dedup.shingle_hashes("text", 3)).alias("__hs"),
        ).select("__id", F.explode("__hs").alias("__h"))

    def vB(d):
        return d.select(
            F.col("doc_id").alias("__id"),
            F.explode(TX.shingles("text", 3)).alias("__s"),
        ).select("__id", (hash64(F.col("__s")) % P).alias("__h"))

    def vC(d):
        return vB(d).groupBy("__id", "__h").agg(F.count(F.lit(1)).alias("__c"))

    def vD(d):
        return dedup._minhash_sigs(d, "text", "doc_id", 8, 3)

    def vE(d):
        hashed = vB(d)
        aggs = [
            F.min((F.lit(a) * F.col("__h") + F.lit(b)) % P).alias(f"m{i}")
            for i, (a, b) in enumerate(dedup._minhash_coeffs(8))
        ]
        g = hashed.groupBy("__id").agg(*aggs)
        sig = F.array(
            *[F.coalesce(F.col(f"m{i}"), F.lit(HASH_MAX)) for i in range(8)]
        )
        return g.select("__id", sig.alias("__sig"))

    def vS(d):
        return d.select(
            F.col("doc_id").alias("__id"),
            F.explode(TX.shingles("text", 3)).alias("__s"),
        )

    def vT(d):
        return d.select(
            F.col("doc_id").alias("__id"),
            F.explode(TX.tokens("text")).alias("__t"),
        )

    variants = {"T": vT, "S": vS, "A": vA, "B": vB, "C": vC, "D": vD, "E": vE}
    results = {}
    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"spike:{name}:warmup")
        for _ in range(2):
            fn(docs).write.format("noop").mode("overwrite").save()
        best, samples = float("inf"), []
        io = None
        for i in range(5):
            spark.sparkContext._jvm.System.gc()
            cap = None
            if io is None:
                cap = StageMetricsCapture(spark)
                cap.__enter__()
            spark.sparkContext.setJobDescription(f"spike:{name}:pass{i}")
            t0 = time.monotonic()
            fn(docs).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            if cap is not None:
                cap.__exit__(None, None, None)
                io = cap.metrics
            best = min(best, dt)
            samples.append(round(dt, 3))
        results[name] = {
            "best_s": round(best, 3),
            "samples": samples,
            "exec_core_s": round(io["executor_run_time_ms"] / 1000.0, 1),
            "stages": io["n_stages"],
        }
        print(name, results[name], flush=True)

    # sanity: B's hash values equal A's universe (pre-distinct multiset
    # equality is implied by per-doc set equality checked via C vs A)
    a = vA(docs).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("__h") % 1000003).alias("s")
    ).collect()[0]
    c = vC(docs).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("__h") % 1000003).alias("s")
    ).collect()[0]
    d_ = vD(docs).select(F.explode("__sig").alias("v")).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") % 1000003).alias("s")
    ).collect()[0]
    e = vE(docs).select(F.explode("__sig").alias("v")).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") % 1000003).alias("s")
    ).collect()[0]
    print("A==C postings:", (a["n"], a["s"]) == (c["n"], c["s"]), (a["n"], a["s"]), (c["n"], c["s"]))
    print("D==E sigs:", (d_["n"], d_["s"]) == (e["n"], e["s"]), (d_["n"], d_["s"]), (e["n"], e["s"]))
    spark.stop()


if __name__ == "__main__":
    main()
