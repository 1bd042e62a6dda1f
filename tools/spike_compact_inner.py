"""Spike 3b (r14): sub-phase timing inside Compaction._full_compact
(driver-orchestration profile of the compact step)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

from pyspark.sql import functions as F

from bergloom_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

times: dict[str, list[float]] = {}


def timed(name, fn, *a, **k):
    t0 = time.monotonic()
    out = fn(*a, **k)
    times.setdefault(name, []).append(round(time.monotonic() - t0, 3))
    return out


def main():
    spark = get_spark(app_name="spike-compact-inner")
    from concurrent.futures import ThreadPoolExecutor

    from bergloom_spark.config import CompactionConfig
    from bergloom_spark.lake import Compaction, LakeTable
    from bergloom_spark.lake import writer as wr
    from bergloom_spark.lake import compaction as comp_mod
    from bergloom_spark.lake.commit import RewriteFilesCommitManager
    from bergloom_spark.operators import mor

    # wrap hotspots
    orig_write = wr.write_data_files
    orig_collect = wr._collect_parquet_entries
    orig_rewrite = RewriteFilesCommitManager.rewrite_files

    def write_wrap(*a, **k):
        return timed("write_data_files", orig_write, *a, **k)

    def collect_wrap(*a, **k):
        return timed("collect_entries", orig_collect, *a, **k)

    def rewrite_wrap(self, *a, **k):
        return timed("commit_rewrite", orig_rewrite, self, *a, **k)

    wr.write_data_files = write_wrap
    comp_mod.wr.write_data_files = write_wrap
    wr._collect_parquet_entries = collect_wrap
    RewriteFilesCommitManager.rewrite_files = rewrite_wrap

    orig_read = LakeTable.read
    orig_refresh = LakeTable.refresh

    def read_wrap(self, *a, **k):
        return timed("table_read_build", orig_read, self, *a, **k)

    def refresh_wrap(self, *a, **k):
        return timed("refresh", orig_refresh, self, *a, **k)

    LakeTable.read = read_wrap
    LakeTable.refresh = refresh_wrap

    for rep in range(3):
        li = entry_mod.T(spark, SF_DIR, "lineitem")
        root = os.path.join(entry_mod._scratch(prefix="spike-ci-"), "li")
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
        times.clear() if rep == 0 else None
        t0 = time.monotonic()
        Compaction(
            t, CompactionConfig(target_file_size=64 * 1024 * 1024)
        ).compact()
        total = round(time.monotonic() - t0, 3)
        print(f"rep{rep} compact_total={total}")
        for k, v in times.items():
            print("   ", k, v)
        times.clear()
    spark.stop()


if __name__ == "__main__":
    main()
