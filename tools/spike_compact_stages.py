"""Spike 3d (r14): stage metrics of JUST the compaction rewrite write
(warm JVM) — how much of the ~1.7 s parquet() call is task time vs
driver planning/codegen latency."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

from pyspark.sql import functions as F

from bergloom_spark.session import get_spark
from bergloom_spark.plans.runtime_metrics import StageMetricsCapture

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark):
    from concurrent.futures import ThreadPoolExecutor

    from bergloom_spark.lake import LakeTable
    from bergloom_spark.operators import mor

    li = entry_mod.T(spark, SF_DIR, "lineitem")
    root = os.path.join(entry_mod._scratch(prefix="spike-cs-"), "li")
    t = LakeTable.create(spark, root, li.schema)
    with ThreadPoolExecutor(max_workers=2) as pool:
        for f in [
            pool.submit(t.append, li.filter(F.col("l_orderkey") % 2 == 0)),
            pool.submit(t.append, li.filter(F.col("l_orderkey") % 2 == 1)),
        ]:
            f.result()
    hidden = t.scan_data(with_hidden=True)
    with ThreadPoolExecutor(max_workers=2) as pool:
        for f in [
            pool.submit(
                t.append_position_deletes,
                hidden.filter(F.col("l_partkey") % 13 == 0).select(
                    F.col(mor.SYS_HIDDEN_FILE_PATH).alias("file_path"),
                    F.col(mor.SYS_HIDDEN_POS).alias("pos"),
                ),
            ),
            pool.submit(
                t.append_equality_deletes,
                hidden.filter(F.col("l_suppkey") % 10 == 0)
                .select("l_orderkey")
                .distinct(),
                ["l_orderkey"],
            ),
        ]:
            f.result()
    return t


def main():
    spark = get_spark(app_name="spike-compact-stages")
    from bergloom_spark.config import CompactionConfig
    from bergloom_spark.lake import Compaction
    from bergloom_spark.lake import writer as wr
    from bergloom_spark.lake import compaction as comp_mod

    orig_write = wr.write_data_files

    def write_wrap(df, *a, **k):
        cap = StageMetricsCapture(spark)
        cap.__enter__()
        t0 = time.monotonic()
        out = orig_write(df, *a, **k)
        dt = time.monotonic() - t0
        cap.__exit__(None, None, None)
        m = cap.metrics
        print(
            f"  write wall={dt:.3f} exec_core_s="
            f"{m['executor_run_time_ms'] / 1000:.2f} stages={m['n_stages']}",
            flush=True,
        )
        return out

    comp_mod.wr.write_data_files = write_wrap

    for rep in range(4):
        t = build(spark)
        t0 = time.monotonic()
        Compaction(
            t, CompactionConfig(target_file_size=64 * 1024 * 1024)
        ).compact()
        print(f"rep{rep} compact_total={time.monotonic() - t0:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
