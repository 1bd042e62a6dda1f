"""Spike 3 (r14): where do compact_roundtrip's ~3 s of wall go?
Phase timing across 3 repetitions (driver-orchestration-bound query:
3.6 executor-core-s vs ~3 s wall on 32 cores)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

from pyspark.sql import functions as F

from bergloom_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, rep):
    from concurrent.futures import ThreadPoolExecutor

    from bergloom_spark.config import CompactionConfig
    from bergloom_spark.lake import Compaction, LakeTable
    from bergloom_spark.operators import mor

    marks = [("start", time.monotonic())]

    def mark(name):
        marks.append((name, time.monotonic()))

    li = entry_mod.T(spark, SF_DIR, "lineitem")
    mark("load")
    root = os.path.join(entry_mod._scratch(prefix="spike-compact-"), "li")
    t = LakeTable.create(spark, root, li.schema)
    mark("create")
    with ThreadPoolExecutor(max_workers=2) as pool:
        for f in [
            pool.submit(t.append, li.filter(F.col("l_orderkey") % 2 == 0)),
            pool.submit(t.append, li.filter(F.col("l_orderkey") % 2 == 1)),
        ]:
            f.result()
    mark("appends")
    hidden = t.scan_data(with_hidden=True)
    mark("scan_data_build")
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
    mark("deletes")
    from bergloom_spark.config import CompactionConfig

    Compaction(
        t, CompactionConfig(target_file_size=64 * 1024 * 1024)
    ).compact()
    mark("compact")
    df = t.read().select(*entry_mod.LI_COLS)
    mark("read_build")
    df.write.format("noop").mode("overwrite").save()
    mark("noop")
    out = []
    for (n0, t0), (n1, t1) in zip(marks, marks[1:]):
        out.append(f"{n1}={t1 - t0:.3f}")
    print(f"rep{rep}: total={marks[-1][1] - marks[0][1]:.3f} ", " ".join(out), flush=True)


def main():
    spark = get_spark(app_name="spike-compact-profile")
    for rep in range(4):
        run_once(spark, rep)
    spark.stop()


if __name__ == "__main__":
    main()
