"""Join operators Spark lacks natively: as-of and interval (range) joins.

Both are built from shuffle-friendly primitives instead of the naive
theta-join (which Spark would execute as a broadcast-nested-loop —
quadratic and fatal at scale):

- **as-of**: the union-window trick. Tag both sides, union, one
  hash-partition shuffle on the key, sort by time within partitions,
  and carry the latest right-side row forward with
  ``last(..., ignorenulls=True)``. One shuffle, no row explosion,
  works at any key cardinality. (The per-group ``pd.merge_asof``
  alternative needs ``applyInPandas`` and breaks down on hot keys.)
- **interval count**: bucketize time to the window width, equi-join on
  (key, bucket) for the ~2 candidate buckets, then filter the exact
  range — candidate set is bounded by bucket occupancy, not corpus
  size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, the latest right row with
    ``right.ts <= left.ts`` and equal key (left join: unmatched rows
    keep nulls).

    Output: all left columns + ``<right_value_col><suffix>`` columns.
    """
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lhs.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    u = lhs.unionByName(rhs)
    # Right rows sort before left rows at equal timestamps → the match
    # is inclusive (right.ts <= left.ts); __r_ts breaks right-side ties
    # deterministically (latest wins).
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__r_ts").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in right_value_cols
    ] + [F.last("__r_ts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}")]
    out = u.select("__side", "__l", *carried).filter(F.col("__side") == 1)
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"{c}{suffix}") for c in right_value_cols],
        F.col(f"{right_ts}{suffix}"),
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """:func:`asof_join` semantics, hot-key-safe: the window partitions
    on (key, time-bucket) instead of key alone.

    The plain union-window as-of puts EVERY row of a key into one
    window partition — one monster key (a bot user, a default id)
    serializes on one task. Here time is split into ``bucket_seconds``
    buckets and the carry state crossing bucket boundaries is computed
    on a per-(key, bucket) aggregate table first:

    1. per (key, bucket): the latest right row — one map-side-combined
       aggregation, output is one row per (key, bucket);
    2. a window over THAT table (rows per key = number of buckets, not
       number of events) carries the latest right row strictly before
       each bucket;
    3. the carry-in is injected as one synthetic right row per
       (key, bucket) sorting before everything in its bucket, and the
       union-window as-of runs partitioned by (key, bucket).

    Identical output to :func:`asof_join` (ties included — same
    ordering inside each bucket, and the synthetic row is exactly the
    row the carry would have produced). Cost: one extra small shuffle
    over the per-bucket aggregate. Pick ``bucket_seconds`` so a hot
    key's densest bucket fits a task comfortably.
    """
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    bseconds = int(bucket_seconds)

    def bucket_of(col):
        return F.floor(
            F.unix_micros(col.cast("timestamp")) / F.lit(bseconds * 1_000_000)
        ).cast("long")

    # 1. Latest right row per (key, bucket).
    rstruct = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c) for c in right_value_cols],
    )
    rb = (
        right.select(
            F.col(on).alias("__k"),
            bucket_of(F.col(right_ts)).alias("__b"),
            rstruct.alias("__s"),
        )
        .groupBy("__k", "__b")
        .agg(F.max_by("__s", F.col("__s.__ts")).alias("__last"))
    )
    # 2. Carry = latest right row in any strictly-earlier bucket, over
    # the union of buckets either side touches (left-only buckets must
    # inherit carry state too).
    lb = left.select(
        F.col(on).alias("__k"), bucket_of(F.col(left_ts)).alias("__b")
    ).distinct()
    all_b = (
        lb.join(rb, ["__k", "__b"], "full")
        .select("__k", "__b", "__last")
    )
    wc = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = all_b.withColumn(
        "__carry", F.last("__last", ignorenulls=True).over(wc)
    )
    # Synthetic carry-in rows: only for buckets the left actually has,
    # and only when there is something to carry. NULL __t + nulls-first
    # ordering makes them sort before every real row in their bucket.
    synth = carry.join(lb, ["__k", "__b"], "left_semi").filter(
        F.col("__carry").isNotNull()
    )
    # 3. Union-window as-of inside each (key, bucket).
    lhs = left.select(
        F.col(on).alias("__k"),
        bucket_of(F.col(left_ts)).alias("__b"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    rhs = right.select(
        F.col(on).alias("__k"),
        bucket_of(F.col(right_ts)).alias("__b"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lhs.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    synth_rows = synth.select(
        "__k",
        "__b",
        F.lit(None).cast(left.schema[left_ts].dataType).alias("__t"),
        F.lit(-1).alias("__side"),
        F.lit(None).cast(lhs.schema["__l"].dataType).alias("__l"),
        *[F.col("__carry").getField(c).alias(f"__r_{c}")
          for c in right_value_cols],
        F.col("__carry.__ts").alias("__r_ts"),
    )
    u = lhs.unionByName(rhs).unionByName(synth_rows)
    w = (
        Window.partitionBy("__k", "__b")
        .orderBy(
            F.col("__t").asc_nulls_first(),
            F.col("__side").asc(),
            F.col("__r_ts").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in right_value_cols
    ] + [F.last("__r_ts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}")]
    out = u.select("__side", "__l", *carried).filter(F.col("__side") == 1)
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"{c}{suffix}") for c in right_value_cols],
        F.col(f"{right_ts}{suffix}"),
    )


def _bucket(col_name: str, window_seconds: int):
    # unix_micros requires TIMESTAMP; session TZ is pinned UTC so the
    # NTZ→TZ cast is value-preserving.
    return F.floor(
        F.unix_micros(F.col(col_name).cast("timestamp"))
        / F.lit(window_seconds * 1_000_000)
    ).cast("long")


def interval_count_join(
    events: DataFrame,
    key: str,
    ts_col: str,
    anchor_filter,
    window_seconds: int,
    id_col: str,
) -> DataFrame:
    """For each anchor row, count same-key rows in
    ``[anchor.ts - window, anchor.ts)`` — a range join via time
    bucketization: equi-join on (key, bucket) over the 2 candidate
    buckets, then a conditional count applies the exact range (so
    anchors with zero in-range matches still emit n_prior = 0).

    Output: (``id_col``, n_prior).
    """
    anchors = events.filter(anchor_filter).select(
        F.col(id_col).alias("__aid"),
        F.col(key).alias("__k"),
        F.col(ts_col).alias("__at"),
        F.explode(
            F.array(
                _bucket(ts_col, window_seconds),
                _bucket(ts_col, window_seconds) - 1,
            )
        ).alias("__bucket"),
    )
    others = events.select(
        F.col(key).alias("__k"),
        F.col(ts_col).alias("__ot"),
        _bucket(ts_col, window_seconds).alias("__bucket"),
    )
    in_range = (
        F.col("__ot").isNotNull()
        & (F.col("__ot") >= F.col("__at") - F.expr(f"INTERVAL {window_seconds} SECOND"))
        & (F.col("__ot") < F.col("__at"))
    )
    joined = anchors.join(others, ["__k", "__bucket"], "left")
    return (
        joined.groupBy("__aid")
        .agg(F.sum(F.when(in_range, 1).otherwise(0)).alias("n_prior"))
        .select(F.col("__aid").alias(id_col), "n_prior")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_col: str | None = None,
) -> DataFrame:
    """Skew-proof equi-join: spread each hot fact key over ``n_salts``
    reducers.

    The fact side gets a deterministic per-row salt, the dim side is
    replicated ``n_salts`` times, and the join runs on (keys, salt) —
    so one hot key's rows land on n_salts tasks instead of one. Use
    when a single key exceeds what AQE skew-splitting can rebalance
    (AQE splits oversized *partitions*, but one monster key still
    hashes to one partition on the build side of the next stage).
    Replication multiplies the dim side: keep it for genuinely
    small-to-medium dim tables, or pre-filter the dim to the hot keys
    and union with a plain join for the rest.

    The salt feeds the join's shuffle key, so it must be deterministic
    under task/stage retry — a nondeterministic expression there
    (``rand``, ``monotonically_increasing_id``) is the SPARK-23207
    class of bug: retried tasks re-salt rows differently and rows are
    duplicated or lost. Default salt: ``xxhash64(spark_partition_id,
    *fact columns) % n_salts`` — stable on recompute as long as the
    upstream partitioning is deterministic (hash/range/file-based, not
    round-robin), and the partition-id term spreads even
    fully-duplicate hot rows sitting in different partitions. Pass
    ``salt_col`` (a unique row-id column) for strict determinism
    independent of upstream layout.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    if salt_col is not None:
        salt_src = F.xxhash64(F.col(salt_col))
    else:
        salt_src = F.xxhash64(
            F.spark_partition_id(), *[F.col(c) for c in fact.columns]
        )
    salted_fact = fact.withColumn("__salt", F.pmod(salt_src, F.lit(n_salts)))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")
    ).alias("__salt")
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(salted_dim, on=on + ["__salt"], how=how)
    return out.drop("__salt")


def range_lookup(
    fact: DataFrame,
    dim: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1000.0,
    how: str = "left",
) -> DataFrame:
    """Scalar-against-interval dimension lookup (IP→geo, price→tier,
    ts→fiscal period): each fact row joins the dim rows whose
    ``[lo, hi]`` (inclusive) contains its value.

    The naive plan for a range predicate is a broadcast-nested-loop —
    O(facts × dim) compares, the classic silent scale-killer. Here the
    number line is cut into ``bucket_width`` buckets: the dim side
    explodes to one row per bucket its range covers, the fact side
    computes its single bucket, and the join is an EQUI-join on the
    bucket with the exact ``BETWEEN`` as a residual filter — a hash
    join at any scale. Pick ``bucket_width`` ≈ typical range width, so
    the dim explosion factor stays ~2 (a dim of B buckets per range
    replicates B×; facts never replicate).

    Overlapping ranges yield one output row per match (standard range
    join semantics); ``how="left"`` keeps fact rows with no match.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_lookup supports inner/left, got {how}")
    w = float(bucket_width)
    fb = F.floor(F.col(value_col).cast("double") / F.lit(w)).cast("long")
    db_lo = F.floor(F.col(lo_col).cast("double") / F.lit(w)).cast("long")
    db_hi = F.floor(F.col(hi_col).cast("double") / F.lit(w)).cast("long")
    exploded = dim.filter(F.col(hi_col) >= F.col(lo_col)).select(
        "*", F.explode(F.sequence(db_lo, db_hi)).alias("__bucket")
    )
    match = (
        (F.col("__bucket") == fb)
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) <= F.col(hi_col))
    )
    joined = fact.join(exploded, match, how)
    return joined.drop("__bucket")
