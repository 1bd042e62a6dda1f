"""Lakehouse lifecycle demo: streaming ingest → inline maintenance →
incremental consumption → MERGE → clone → time travel.

The operational loop a table lives through in production, composed
from bergloom_spark's lake layer — every step is a metadata commit
plus distributed Spark jobs, so the same script scales from this demo
to a cluster-sized deployment:

  1. streaming ingest with the exactly-once batch-id guard and the
     maintenance loop ticking inline (small-file debt folds as it
     forms);
  2. a downstream incremental consumer reading the table as a
     Structured Streaming SOURCE (snapshot-id offsets);
  3. a CDC-style MERGE INTO (update + delete + insert, one atomic
     equality-delta commit);
  4. a zero-copy clone for an experiment branch;
  5. FOR TIMESTAMP AS OF time travel back to the pre-merge state.

Run:  python examples/lakehouse_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bergloom_spark.io import load_table  # noqa: E402
from bergloom_spark.lake import LakeTable  # noqa: E402
from bergloom_spark.lake import metadata as md  # noqa: E402
from bergloom_spark.lake.maintenance import MaintenancePolicy  # noqa: E402
from bergloom_spark.session import get_spark  # noqa: E402
from bergloom_spark.sources.lakestream import LakeStreamDataSource  # noqa: E402
from bergloom_spark.streaming.events import read_events_stream  # noqa: E402
from bergloom_spark.streaming.ingest import ingest_stream  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="lakehouse-demo")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(LakeStreamDataSource)
    root = tempfile.mkdtemp(prefix="lakehouse-demo-")

    # 1. streaming ingest with inline maintenance -----------------------
    ev = load_table(spark, sf_dir, "events")
    stream_dir = os.path.join(root, "incoming")
    ev.repartition(6).write.parquet(stream_dir)
    table_root = os.path.join(root, "events_table")
    t = LakeTable.create(
        spark, table_root, read_events_stream(spark, stream_dir).schema
    )
    t = ingest_stream(
        read_events_stream(spark, stream_dir, max_files_per_trigger=1),
        t,
        os.path.join(root, "ckpt-ingest"),
        maintenance=MaintenancePolicy(
            small_file_threshold=1 << 30, min_small_files=3
        ),
        maintain_every=3,
    )
    snaps = [s.operation for s in t.meta.snapshots]
    n_files = len(t.meta.current_snapshot().files(md.DATA))
    print(
        f"[1] ingested {t.read().count()} rows over "
        f"{snaps.count('append')} micro-batches; inline maintenance "
        f"ran {snaps.count('rewrite')}x -> {n_files} data files"
    )

    # 2. incremental downstream consumer --------------------------------
    seen: list[int] = []
    q = (
        spark.readStream.format("lakestream")
        .option("path", table_root)
        .option("skipNonAppends", "true")
        .load()
        .writeStream.foreachBatch(lambda df, _b: seen.append(df.count()))
        .option("checkpointLocation", os.path.join(root, "ckpt-consume"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print(f"[2] incremental consumer drained {sum(seen)} appended rows")

    pre_merge_ms = t.meta.current_snapshot().timestamp_ms
    time.sleep(0.01)

    # 3. MERGE INTO -----------------------------------------------------
    source = (
        t.read()
        .filter(F.col("event_type") == "purchase")
        .groupBy("event_id")
        .agg(
            F.max("ts").alias("ts"),
            F.max("user_id").alias("user_id"),
            F.first("event_type").alias("event_type"),
            (F.max("value") * 1.1).alias("value"),
            F.first("props").alias("props"),
        )
    )
    t.merge_into(
        source,
        key_cols=["event_id"],
        when_matched_update={"value": "s.value"},
        when_matched_delete="s.value > 1000",
        when_not_matched_insert=False,
    )
    print(f"[3] merge applied; table now {t.read().count()} rows")

    # 4. zero-copy clone ------------------------------------------------
    clone = t.clone_to(os.path.join(root, "experiment_clone"))
    clone.delete_where(F.col("event_type") == "click")
    print(
        f"[4] clone diverged: clone={clone.read().count()} rows, "
        f"source={t.refresh().read().count()} rows (unchanged)"
    )

    # 5. time travel ----------------------------------------------------
    back_then = t.read(as_of_ms=pre_merge_ms).count()
    print(f"[5] FOR TIMESTAMP AS OF pre-merge: {back_then} rows")

    # 6. changelog replication (round 4) --------------------------------
    # a cross-region replica built purely from the source's row-level
    # +/- change feed — appends, the MERGE, everything — exactly-once
    from bergloom_spark.streaming.ingest import replicate_changelog

    replica = LakeTable.create(
        spark, os.path.join(root, "replica"), t.schema
    )
    replica = replicate_changelog(
        spark,
        table_root,
        replica,
        os.path.join(root, "ckpt-replica"),
        ["event_id"],
    )
    print(
        f"[6] changelog replica: {replica.read().count()} rows "
        f"(source {t.refresh().read().count()})"
    )

    # 7. fleet maintenance scheduler (round 4) --------------------------
    # the compaction service's outer loop: score the whole catalog's
    # debt from manifests, maintain the worst offenders under a budget
    from bergloom_spark.lake.scheduler import (
        MaintenanceScheduler,
        SchedulerConfig,
    )

    sched = MaintenanceScheduler(
        spark,
        [table_root, clone.meta.table_root, replica.meta.table_root],
        policy=MaintenancePolicy(min_small_files=3, max_delete_files=1),
        config=SchedulerConfig(max_tables_per_cycle=1, cooldown_cycles=1),
    )
    for rep in sched.run_until_clean():
        for r in rep.scheduled:
            print(f"[7] cycle {rep.cycle}: maintained {os.path.basename(r)}")
    print(
        "[7] fleet converged: "
        + ", ".join(
            f"{os.path.basename(s.root)} debt={s.debt:.2f}"
            for s in sched.scores()
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
