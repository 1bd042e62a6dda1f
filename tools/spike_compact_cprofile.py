"""Spike 3c (r14): cProfile of the DRIVER during compact_roundtrip's
compact step (after a warmup rep), top cumulative functions."""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

from pyspark.sql import functions as F

from bergloom_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark):
    from concurrent.futures import ThreadPoolExecutor

    from bergloom_spark.lake import LakeTable
    from bergloom_spark.operators import mor

    li = entry_mod.T(spark, SF_DIR, "lineitem")
    root = os.path.join(entry_mod._scratch(prefix="spike-cp-"), "li")
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
    spark = get_spark(app_name="spike-compact-cprofile")
    from bergloom_spark.config import CompactionConfig
    from bergloom_spark.lake import Compaction

    # warmup rep
    t = build(spark)
    Compaction(t, CompactionConfig(target_file_size=64 * 1024 * 1024)).compact()

    # profiled rep (build + compact separately profiled)
    t = build(spark)
    pr = cProfile.Profile()
    pr.enable()
    Compaction(t, CompactionConfig(target_file_size=64 * 1024 * 1024)).compact()
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
