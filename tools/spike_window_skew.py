"""Spike (r15, verdict r14 next-round #5): worst case of the window
count-first cut in ngram_jaccard_pairs / duplicate_spans.

A shingle hash present in M >> cap documents routes all M postings
through ONE task's window partition before the <= cap filter drops
them (dedup.py window cut). The buffer is Spark's spillable
ExternalAppendOnlyUnsafeRowArray, so this is a straggler bound, not an
OOM — this spike MEASURES that bound:

  - hot fixture: N docs, each sharing one boilerplate shingle
    (hot-hash frequency M = N, cap = auto = max(64, 1% N) << M),
    plus unique filler shingles.
  - control fixture: identical row/shingle volume, no shared shingle.

Reported per run: query wall, the window stage's max vs median task
time (straggler ratio), spill bytes. The delta hot - control is the
price of funneling M over-cap postings through one partition.

Usage: python tools/spike_window_skew.py [N_docs...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bergloom_spark.operators import dedup
from bergloom_spark.plans.runtime_metrics import StageMetricsCapture
from bergloom_spark.session import get_spark


def make_docs(spark, n_docs: int, hot: bool):
    """n_docs rows; when hot, every doc carries the same 5-token
    shingle ("b0 b1 b2 b3 b4") plus 5 unique tokens; the control
    replaces the shared tokens with per-doc ones (same token count,
    same shingle count per doc, no shared hash)."""
    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    if hot:
        text = F.concat(
            F.lit("b0 b1 b2 b3 b4 u"),
            F.col("doc_id"),
            F.lit("a ua"),
            F.col("doc_id"),
            F.lit("b ub"),
            F.col("doc_id"),
            F.lit("c ud"),
            F.col("doc_id"),
        )
    else:
        text = F.concat(
            F.lit("c0_"), F.col("doc_id"),
            F.lit(" c1_"), F.col("doc_id"),
            F.lit(" c2_"), F.col("doc_id"),
            F.lit(" c3_"), F.col("doc_id"),
            F.lit(" c4_"), F.col("doc_id"),
            F.lit(" u"), F.col("doc_id"),
            F.lit("a ua"), F.col("doc_id"),
            F.lit("b ub"), F.col("doc_id"),
            F.lit("c ud"), F.col("doc_id"),
        )
    return base.select("doc_id", text.alias("text"))


def stage_straggler(spark, pre_stages):
    """The heaviest new stage by executor run time, plus its per-task
    duration spread (max vs median) — max/median >> 1 on the window
    stage IS the funnel straggler."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    gw = sc._gateway
    lst = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(gw.jvm.double, 0), jvm.java.util.ArrayList(),
    )
    stages = []
    it = lst.iterator()
    while it.hasNext():
        s = it.next()
        key = (s.stageId(), s.attemptId())
        if key in pre_stages:
            continue
        stages.append(s)
    out = []
    for s in stages:
        durs = []
        tl = store.taskList(s.stageId(), s.attemptId(), 10000)
        it = tl.iterator()
        while it.hasNext():
            t = it.next()
            try:
                durs.append(t.duration().get())
            except Exception:
                pass
        durs.sort()
        mx = durs[-1] if durs else 0
        med = durs[len(durs) // 2] if durs else 0
        out.append((s.stageId(), s.numCompleteTasks(), int(s.executorRunTime()),
                    int(s.shuffleReadBytes()), mx, med))
    out.sort(key=lambda r: -r[2])
    return out


def run(spark, n_docs: int, hot: bool, cap: int):
    docs = make_docs(spark, n_docs, hot).repartition(32)
    from bergloom_spark.plans.runtime_metrics import _stage_rows

    pre = set(_stage_rows(spark))
    with StageMetricsCapture(spark) as cap_m:
        t0 = time.monotonic()
        out = dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.5, shingle_n=5,
            max_doc_freq=cap, cache=False,
        )
        out.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
    rows = stage_straggler(spark, pre)
    label = "hot" if hot else "control"
    print(
        f"N={n_docs} {label}: wall {wall:.2f}s cap {cap} "
        f"exec_ms {cap_m.metrics['executor_run_time_ms']} "
        f"spill_mem {cap_m.metrics['memory_spill_bytes']} "
        f"spill_disk {cap_m.metrics['disk_spill_bytes']}"
    )
    for sid, ntasks, ems, srb, mx, med in rows[:4]:
        print(
            f"    stage {sid}: tasks {ntasks} exec_ms {ems} "
            f"shuffle_read {srb} task_max_ms {mx} "
            f"task_median_ms {med} straggler {mx / max(med, 1):.1f}"
        )
    return wall


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark(app_name="window-skew-spike")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        cap = max(64, n // 100)
        # warmup (codegen) at small size once
        run(spark, 10_000, True, 100)
        c = run(spark, n, False, cap)
        h = run(spark, n, True, cap)
        print(f"N={n}: hot/control wall ratio {h / max(c, 1e-9):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
