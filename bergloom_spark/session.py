"""SparkSession factory.

Mirrors the reference's session bootstrap (DataFusion ``SessionConfig``
with ``target_partitions`` / ``batch_size``,
``core/src/executor/datafusion/datafusion_processor.rs:55-59``) but with
Spark-native knobs: AQE for runtime re-planning, Arrow for the Python
boundary, UTC session timezone so results compare bit-for-bit against
DuckDB oracles.

Scale note: these configs are written for a real cluster (executors set
via spark-submit); local[N] is only the test harness. Shuffle partitions
default to the local core count — on a 1000-executor cluster you would
raise ``spark.sql.shuffle.partitions`` (or rely on AQE coalescing, which
is enabled) rather than change code.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bergloom-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus if cpus is not None else default_cpus()
    shuffle_partitions = shuffle_partitions or cpus
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    # Heap floor (optimization r14, guide §5/§7.3): without -Xms, a
    # full GC lets G1 UNCOMMIT the heap down to the ~1.3 GB default
    # floor (measured: committed 6.8 G → 1.5 G at every System.gc()).
    # This sandbox runs under virtio-balloon with FREE PAGE REPORTING
    # (feature bit 5): uncommitted pages are returned to the HOST, and
    # re-faulting them is host-side allocation whose speed tracks
    # neighbor load — measured 1.6 GB/s on a quiet host and
    # catastrophically slower under pressure (~1000 core-s of system
    # time across 32 task threads, turning a 2 s query into a 57 s
    # one, intermittently). A floor above the workload's peak
    # committed heap (~7 GB) means touched pages are NEVER reported
    # back, so the storm cannot recur. The floor is deliberately NOT
    # Xmx: a fully-committed 32 GB heap lets G1 size its young gen
    # from the full capacity and stride tens of GB of never-touched
    # pages (measured: phase-1 executor time inflated ~8× right after
    # startup) — the ~8 GB floor keeps both failure modes closed.
    # Override with SPARK_GRAFT_DRIVER_XMS (a size, or "off").
    def _mb(size: str) -> int:
        s = size.strip().lower()
        mult = {"k": 1 / 1024, "m": 1, "g": 1024, "t": 1024 * 1024}
        if s and s[-1] in mult:
            return int(float(s[:-1]) * mult[s[-1]])
        return int(float(s)) // (1024 * 1024)

    xms = os.environ.get("SPARK_GRAFT_DRIVER_XMS")
    if xms is None:
        try:
            xms = f"{min(8192, _mb(driver_memory))}m"
        except ValueError:
            xms = "8192m"

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS); Spark reads it as a
        # long (nanos) under this flag — io.load_table converts back.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Optimization r15 (guide §4, the Python boundary): PySpark's
        # DataFrame debugging wrapper (on by default) adds THREE py4j
        # round trips to EVERY wrapped DataFrame/Column API call — an
        # uncached conf.get of stackTracesInDataFrameContext plus
        # PySparkCurrentOrigin.set/clear — and a Python stack walk,
        # purely to enrich error messages with user call sites.
        # Measured on this workload: query construction makes 109-779
        # round trips with it on, 59-~340 with it off; construct time
        # -20..55% (events_hourly 0.069→0.031 s). The cost is per
        # driver API call, so a 100 TB job's driver pays it the same.
        # Trade-off: AnalysisExceptions lose the "user code line"
        # fragment; plans and results are identical.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    if xms and xms.lower() != "off":
        builder = builder.config(
            "spark.driver.extraJavaOptions", f"-Xms{xms}"
        )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
