"""Mergeable sketches with deterministic, oracle-replayable estimates.

Approximate distinct counting and heavy-hitter detection are the two
sketch workloads a 100 TB curation pipeline leans on (per-source
cardinalities, vocabulary heavy hitters, cross-set overlap without a
giant distinct shuffle). Spark's built-ins (``approx_count_distinct``
HLL, ``count_min_sketch``) use engine-private hashing, so their
estimates cannot be cross-checked by an independent engine. These
implementations use the shared md5-derived ``hash64`` — the SAME
estimate reproduces bit-for-bit in DuckDB, so the driver's
hash-equality gate applies to the *approximate* answers themselves,
not just to exact queries.

Scale shapes:
- KMV (k minimum values): the sketch is the k smallest distinct hash
  values — per partition a top-k, merged associatively (Spark's
  TakeOrderedAndProject); one narrow shuffle of ≤ k·P longs. Union of
  sketches = k smallest of the concatenation, so per-source sketches
  compose without rescanning (the Θ-sketch family).
- Count-Min: d hashed counter rows of width w; one combinable
  ``groupBy (row, bucket)`` shuffle whose output is ≤ d·w rows no
  matter the corpus size. Point estimates are d broadcast probes.

References: Bar-Yossef et al., "Counting distinct elements in a data
stream" (KMV); Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch and its applications".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bergloom_spark.functions import text as TX
from bergloom_spark.functions.hashing import HASH_BITS, hash64, hash64_sql

__all__ = [
    "cm_heavy_hitters",
    "cm_heavy_hitters_sql",
    "column_profile",
    "kmv_distinct_by",
    "kmv_distinct_by_sql",
    "column_profile_sql",
    "kmv_distinct",
    "kmv_distinct_sql",
    "kmv_overlap",
    "kmv_overlap_sql",
]

_HASH_SPAN = float(1 << HASH_BITS)


def _kmv_hashes(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """The sketch itself: k smallest DISTINCT key hashes, one column."""
    return (
        df.select(hash64(F.col(key_col).cast("string")).alias("__h"))
        .where(F.col("__h").isNotNull())
        .distinct()
        .orderBy("__h")
        .limit(k)
    )


def _kmv_estimate(kth: Column, k: int) -> Column:
    # (k-1)/u_k with u_k = kth/2^60 — same op order as the SQL twin.
    return F.round(F.lit(float(k - 1)) / (kth.cast("double") / F.lit(_HASH_SPAN)), 4)


def kmv_distinct(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """KMV distinct-count estimate of ``key_col``.

    Output (1 row): (k, kth_hash, est_distinct). The estimate is
    (k−1)/u_k where u_k is the k-th smallest normalized hash —
    unbiased, stderr ≈ 1/√(k−2). Deterministic: same data ⇒ same
    hashes ⇒ same estimate, on any engine and any partitioning.
    """
    sketch = _kmv_hashes(df, key_col, k)
    # Below-k rule: if fewer than k distinct hashes exist the sketch
    # holds ALL of them and the count is exact, not an estimate.
    return sketch.agg(
        F.lit(k).cast("long").alias("k"),
        F.max("__h").alias("kth_hash"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise(_kmv_estimate(F.max("__h"), k))
        .alias("est_distinct"),
    )


def kmv_distinct_sql(table: str, key_expr: str, k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_distinct`."""
    h = hash64_sql(f"({key_expr})::VARCHAR")
    return f"""
        WITH sketch AS (
          SELECT DISTINCT {h} AS h FROM {table}
          WHERE {key_expr} IS NOT NULL
          ORDER BY h LIMIT {k})
        SELECT {k}::BIGINT AS k,
               max(h) AS kth_hash,
               CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
                    ELSE round({float(k - 1)!r}
                               / (max(h)::DOUBLE / {_HASH_SPAN!r}), 4)
               END AS est_distinct
        FROM sketch
    """


def kmv_distinct_by(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimates — ``approx_count_distinct
    OVER groups`` with a cross-engine-reproducible estimator (round 4,
    replacing the registered HLL query whose engine-private hashing the
    driver could never oracle-check; the HLL path stays available as
    ``operators.agg.approx_distinct`` for Spark-only use).

    Output (one row per group): (group, k, kth_hash, est_distinct).
    Scale: one distinct on (group, hash) — 8-byte keys — then a
    windowed top-k per group; state per group is k longs, mergeable
    across sources like the global sketch."""
    from pyspark.sql import Window

    hashed = (
        df.select(
            F.col(group_col),
            hash64(F.col(key_col).cast("string")).alias("__h"),
        )
        .where(F.col("__h").isNotNull() & F.col(group_col).isNotNull())
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("__h")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k
    )
    return topk.groupBy(group_col).agg(
        F.lit(k).cast("long").alias("k"),
        F.max("__h").alias("kth_hash"),
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
        .otherwise(_kmv_estimate(F.max("__h"), k))
        .alias("est_distinct"),
    )


def kmv_distinct_by_sql(
    table: str, group_expr: str, key_expr: str, k: int = 64
) -> str:
    """DuckDB twin of :func:`kmv_distinct_by`."""
    h = hash64_sql(f"({key_expr})::VARCHAR")
    return f"""
        WITH hashed AS (
          SELECT DISTINCT {group_expr} AS g, {h} AS h FROM {table}
          WHERE {key_expr} IS NOT NULL AND {group_expr} IS NOT NULL),
        topk AS (
          SELECT g, h,
                 row_number() OVER (PARTITION BY g ORDER BY h) AS rn
          FROM hashed)
        SELECT g AS {group_expr},
               {k}::BIGINT AS k,
               max(h) AS kth_hash,
               CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
                    ELSE round({float(k - 1)!r}
                               / (max(h)::DOUBLE / {_HASH_SPAN!r}), 4)
               END AS est_distinct
        FROM topk WHERE rn <= {k}
        GROUP BY g
    """


def kmv_overlap(
    df_a: DataFrame, df_b: DataFrame, key_col: str, k: int = 64
) -> DataFrame:
    """KMV set-operation estimates over two keyed sets WITHOUT a
    distinct-join: union and intersection cardinalities from the two
    sketches alone (the Θ-sketch composition rule).

    K = k smallest hashes of A ∪ B (merge of the two sketches);
    ρ = |{h ∈ K : h ∈ A ∧ h ∈ B}| / k;  est_inter = ρ · est_union.
    Output (1 row): (k, est_union, est_intersection, est_jaccard).
    At scale each side's sketch is k longs — the overlap of two 10 TB
    sources is estimated from 2·k values.
    """
    a = _kmv_hashes(df_a, key_col, k).withColumn("__in_a", F.lit(1))
    b = _kmv_hashes(df_b, key_col, k).withColumn("__in_b", F.lit(1))
    merged = (
        a.join(b, "__h", "full")
        .select(
            "__h",
            F.coalesce(F.col("__in_a"), F.lit(0)).alias("in_a"),
            F.coalesce(F.col("__in_b"), F.lit(0)).alias("in_b"),
        )
        .orderBy("__h")
        .limit(k)
    )
    agg = merged.agg(
        F.max("__h").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
        F.count(F.lit(1)).alias("n_k"),
    )
    est_union = F.when(
        F.col("n_k") < k, F.col("n_k").cast("double")
    ).otherwise(_kmv_estimate(F.col("kth"), k))
    return agg.select(
        F.lit(k).cast("long").alias("k"),
        est_union.alias("est_union"),
        F.round(
            (F.col("n_both").cast("double") / F.col("n_k").cast("double"))
            * est_union,
            4,
        ).alias("est_intersection"),
        F.round(
            F.col("n_both").cast("double") / F.col("n_k").cast("double"), 4
        ).alias("est_jaccard"),
    )


def kmv_overlap_sql(
    table_a: str, table_b: str, key_expr: str, k: int = 64
) -> str:
    """DuckDB twin of :func:`kmv_overlap`."""
    h = hash64_sql(f"({key_expr})::VARCHAR")
    est_union = (
        f"CASE WHEN n_k < {k} THEN n_k::DOUBLE "
        f"ELSE round({float(k - 1)!r} / (kth::DOUBLE / {_HASH_SPAN!r}), 4) END"
    )
    return f"""
        WITH sa AS (
          SELECT DISTINCT {h} AS h FROM {table_a}
          WHERE {key_expr} IS NOT NULL ORDER BY h LIMIT {k}),
        sb AS (
          SELECT DISTINCT {h} AS h FROM {table_b}
          WHERE {key_expr} IS NOT NULL ORDER BY h LIMIT {k}),
        merged AS (
          SELECT coalesce(sa.h, sb.h) AS h,
                 CASE WHEN sa.h IS NULL THEN 0 ELSE 1 END AS in_a,
                 CASE WHEN sb.h IS NULL THEN 0 ELSE 1 END AS in_b
          FROM sa FULL JOIN sb ON sa.h = sb.h
          ORDER BY h LIMIT {k}),
        agg AS (
          SELECT max(h) AS kth,
                 sum(in_a * in_b) AS n_both,
                 count(*) AS n_k
          FROM merged)
        SELECT {k}::BIGINT AS k,
               {est_union} AS est_union,
               round((n_both::DOUBLE / n_k::DOUBLE) * {est_union}, 4)
                   AS est_intersection,
               round(n_both::DOUBLE / n_k::DOUBLE, 4) AS est_jaccard
        FROM agg
    """


def _quantile_sample(df: DataFrame, col: str, k: int) -> DataFrame:
    """Deterministic distinct-value sample for quantile estimation:
    the ``k`` distinct values with the smallest md5 hashes, each
    carrying its row count. A uniform sample of DISTINCT values
    re-weighted by frequency (Gibbons' distinct sampling) — unlike a
    row reservoir, it needs no random state, so the same sample (and
    the same quantile estimate) reproduces on any engine."""
    dv = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("__v0"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            # try_cast: ANSI cast THROWS on non-numeric strings (both
            # Spark 4 and a strict DuckDB cast) — a string column must
            # profile with NULL quantiles, not abort (review r4)
            F.col("__v0").try_cast("double").alias("v"),
            hash64(F.col("__v0").cast("string")).alias("h"),
            "cnt",
        )
    )
    # TakeOrderedAndProject: per-partition top-k, merged — never a
    # global sort of the distinct values.
    return dv.orderBy("h", "v").limit(k)


def _sample_quantiles(sample: DataFrame, ps: dict[str, float]) -> DataFrame:
    """1-row frame: for each (alias, p), the smallest sampled value
    whose cumulative weight reaches p·total.

    Non-castable values (v IS NULL on a mixed string column) are
    EXCLUDED from the distribution: Spark windows sort NULLs first and
    DuckDB's OVER (ORDER BY v) sorts them last, so including them
    would weight the two engines' cumulative sums at opposite ends
    (review r4) — quantiles are over the numeric values only, on both
    sides."""
    from pyspark.sql import Window

    sample = sample.where(F.col("v").isNotNull())
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = sample.select(
        "v",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("tot"),
    )
    return cum.agg(
        *[
            F.min(
                F.when(F.col("cum") >= F.lit(p) * F.col("tot"), F.col("v"))
            ).alias(name)
            for name, p in ps.items()
        ]
    )


def column_profile(
    df: DataFrame, cols: list[str], k: int = 64
) -> DataFrame:
    """ANALYZE-style per-column statistics: (column, n_rows, n_nulls,
    est_ndv, est_p50, est_p99) — the numbers a cost-based optimizer or
    a curation audit reads first. NDV comes from the KMV sketch;
    p50/p99 from a count-weighted deterministic distinct-value sample
    (round 4) — both reproduce bit-for-bit in the oracle, so the
    driver hash-checks the approximations themselves. Scale shape: one
    full-scan agg + one k-row sketch + one 4k-value sample per
    profiled column — profile the key columns, not all 400. Quantiles
    are NULL for non-numeric columns (the sample casts to double).
    """
    # One shared aggregate pass for rows/nulls; the 1-row result is a
    # bounded driver collect attached as literals — a crossJoin of two
    # 1-row frames would plan as a (harmless but noisy) nested loop.
    counts = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nn_{i}")
            for i, c in enumerate(cols)
        ],
    ).first()
    out = None
    for i, c in enumerate(cols):
        quants = _sample_quantiles(
            _quantile_sample(df, c, 4 * k),
            {"est_p50": 0.5, "est_p99": 0.99},
        )
        piece = kmv_distinct(df, c, k).crossJoin(F.broadcast(quants)).select(
            F.lit(c).alias("column"),
            F.lit(int(counts["__n"])).cast("long").alias("n_rows"),
            F.lit(int(counts[f"__nn_{i}"])).cast("long").alias("n_nulls"),
            F.col("est_distinct").alias("est_ndv"),
            "est_p50",
            "est_p99",
        )
        out = piece if out is None else out.unionByName(piece)
    return out


def column_profile_sql(table: str, cols: list[str], k: int = 64) -> str:
    """DuckDB twin of :func:`column_profile`."""
    pieces = []
    for c in cols:
        h = hash64_sql(f"({c})::VARCHAR")
        # TRY_CAST, not ::DOUBLE: Spark's cast yields NULL for
        # non-numeric strings while a strict DuckDB cast ERRORS, so a
        # string column would abort the whole oracle query instead of
        # profiling with NULL quantiles like the Spark side (review r4).
        sample = f"""
            SELECT TRY_CAST({c} AS DOUBLE) AS v, count(*) AS cnt
            FROM {table} WHERE {c} IS NOT NULL
            GROUP BY {c}
            ORDER BY {h}, TRY_CAST({c} AS DOUBLE) LIMIT {4 * k}"""
        # v IS NOT NULL mirrors _sample_quantiles: Spark and DuckDB
        # sort NULLs at opposite ends, so non-castable values must be
        # excluded from the cumulative weights on both sides.
        quant = """
            SELECT min(CASE WHEN cum >= {p} * tot THEN v END)
            FROM (SELECT v,
                         sum(cnt) OVER (ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS cum,
                         sum(cnt) OVER () AS tot
                  FROM samp WHERE v IS NOT NULL)"""
        pieces.append(
            f"""
        SELECT '{c}' AS column,
               (SELECT count(*) FROM {table})::BIGINT AS n_rows,
               (SELECT count(*) FROM {table} WHERE {c} IS NULL)::BIGINT
                   AS n_nulls,
               (SELECT CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
                       ELSE round({float(k - 1)!r}
                                  / (max(h)::DOUBLE / {_HASH_SPAN!r}), 4) END
                FROM (SELECT DISTINCT {h} AS h FROM {table}
                      WHERE {c} IS NOT NULL ORDER BY h LIMIT {k}))
                   AS est_ndv,
               (WITH samp AS ({sample}) {quant.format(p=0.5)}) AS est_p50,
               (WITH samp AS ({sample}) {quant.format(p=0.99)}) AS est_p99"""
        )
    return " UNION ALL ".join(pieces)


def cm_heavy_hitters(
    df: DataFrame,
    text_col: str,
    d: int = 3,
    w: int = 4096,
    top_k: int = 50,
) -> DataFrame:
    """Count-Min heavy hitters over whitespace tokens.

    Build: every token occurrence increments one bucket in each of the
    ``d`` counter rows (bucket_i = hash64("cm{i}:" ‖ token) mod w) —
    ONE combinable ``groupBy (row, bucket)`` shuffle whose result is at
    most ``d·w`` rows regardless of corpus size (the sketch; mergeable
    across corpora by addition). Probe: each candidate token's estimate
    is min_i counter[i][bucket_i] — ``d`` BROADCAST joins against the
    tiny counter table, never a corpus-sized build side. The estimate
    over-counts only (collisions), never under-counts.

    Output: (token, cm_count) for the ``top_k`` tokens by estimate
    (ties by token), exactly reproducible in SQL because the hash and
    the tie-break are both deterministic.
    """
    toks = df.select(F.explode(TX.tokens(text_col)).alias("token"))
    hits = toks.select(
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(hash64(F.col("token"), seed=1000 + i), F.lit(w))
                        .cast("int")
                        .alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("rb"),
    ).select("token", "rb.row", "rb.bucket")
    counters = hits.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # No distinct-vocab shuffle: min over the repeated (occurrence ×
    # row) multiset equals min over each token's d distinct probes, so
    # the broadcast probe join runs straight off the exploded hits and
    # the per-token min is one combinable aggregate.
    est = (
        hits.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy("token")
        .agg(F.min("cnt").alias("cm_count"))
    )
    return est.orderBy(F.desc("cm_count"), F.asc("token")).limit(top_k)


def cm_heavy_hitters_sql(
    table: str,
    text_expr: str,
    d: int = 3,
    w: int = 4096,
    top_k: int = 50,
) -> str:
    """DuckDB twin of :func:`cm_heavy_hitters`."""
    toks = TX.tokens_sql(text_expr)
    branches = " ".join(
        f"WHEN {i} THEN {hash64_sql('token', seed=1000 + i)} % {w}"
        for i in range(d)
    )
    return f"""
        WITH toks AS (
          SELECT unnest({toks}) AS token FROM {table}),
        hits AS (
          SELECT token, t.range AS row,
                 (CASE t.range {branches} END)::INT AS bucket
          FROM toks, range(0, {d}) t),
        counters AS (
          SELECT row, bucket, count(*) AS cnt FROM hits
          GROUP BY row, bucket),
        vocab AS (SELECT DISTINCT token, row, bucket FROM hits),
        est AS (
          SELECT token, min(cnt)::BIGINT AS cm_count
          FROM vocab JOIN counters USING (row, bucket)
          GROUP BY token)
        SELECT token, cm_count FROM est
        ORDER BY cm_count DESC, token ASC LIMIT {top_k}
    """
