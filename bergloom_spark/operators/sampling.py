"""Deterministic, engine-reproducible sampling for training pipelines.

``df.sample``/``sampleBy`` use Spark's internal RNG: results depend on
partition layout and are not reproducible by another engine, which
makes them unusable where a training corpus must be auditable. Here the
keep decision is a pure function of the row's id — ``hash64`` (md5-
based, bit-identical in Spark and DuckDB, see functions/hashing.py) —
so the same rows are selected on every engine, every run, at every
parallelism.

At 100 TB the filter is a scan-side codegen expression: no shuffle, no
state, prunes before anything expensive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bergloom_spark.functions.hashing import HASH_MAX, hash64, hash64_sql

SCALE = 1_000_000


def stratified_sample_hash(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff ``hash64(id) % SCALE < fraction[stratum] * SCALE``.

    ``fractions`` maps stratum value → sampling rate in [0, 1]; strata
    not listed use ``default_fraction``. Per-stratum rates are how a
    pipeline rebalances a corpus (e.g. downsample boilerplate web text,
    keep all rare-language docs) in one deterministic pass.
    """
    gate = None
    for value, frac in fractions.items():
        thr = F.lit(int(frac * SCALE))
        gate = (
            F.when(F.col(strata_col) == value, thr)
            if gate is None
            else gate.when(F.col(strata_col) == value, thr)
        )
    gate = (
        gate.otherwise(F.lit(int(default_fraction * SCALE)))
        if gate is not None
        else F.lit(int(default_fraction * SCALE))
    )
    bucket = F.pmod(hash64(F.col(id_col).cast("string")), F.lit(SCALE))
    return df.filter(bucket < gate)


def stratified_sample_sql(
    strata_expr: str,
    id_expr: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> str:
    """DuckDB WHERE-clause twin of :func:`stratified_sample_hash`."""
    whens = " ".join(
        f"WHEN '{value}' THEN {int(frac * SCALE)}"
        for value, frac in fractions.items()
    )
    gate = f"CASE {strata_expr} {whens} ELSE {int(default_fraction * SCALE)} END"
    return f"({hash64_sql(f'({id_expr})::VARCHAR')}) % {SCALE} < {gate}"


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str,
    strata_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the ``n``
    rows with the smallest priority key ``u / w`` per stratum, where
    ``u = (hash64(id)+1) / 2^60`` is the row's uniform draw and ``w``
    its (positive) weight — sequential Poisson / priority sampling
    (Ohlsson; Duffield-Lund-Thorup): inclusion probability ∝ weight in
    the small-fraction regime. The pipeline use: sample a corpus
    proportionally to a quality score instead of uniformly.

    Cross-engine exactness: ``u`` is an exact rational from the shared
    md5 hash and the key is ONE IEEE double division — both engines
    round it identically, so ranks (ties broken by id) agree exactly;
    no ``ln``/``pow`` whose libm rounding could differ.

    Scale shape: key computed scan-side; one window shuffle on the
    strata (or a single global top-n via TakeOrderedAndProject when
    unstratified — still no full sort).
    """
    u = (hash64(F.col(id_col).cast("string")) + F.lit(1)).cast("double") / F.lit(
        float(HASH_MAX + 1)
    )
    key = u / F.col(weight_col).cast("double")
    keyed = df.withColumn("__wkey", key)
    if strata_cols:
        w = Window.partitionBy(*strata_cols).orderBy(
            F.col("__wkey").asc(), F.col(id_col).asc()
        )
        return (
            keyed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__rn", "__wkey")
        )
    return (
        keyed.orderBy(F.col("__wkey").asc(), F.col(id_col).asc())
        .limit(n)
        .drop("__wkey")
    )


def weighted_sample_sql(
    table: str,
    weight_expr: str,
    n: int,
    id_expr: str,
    strata_exprs: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`weighted_sample` (same hash, same single
    division, same tie-break)."""
    u = f"(({hash64_sql(f'({id_expr})::VARCHAR')}) + 1)::DOUBLE / {float(HASH_MAX + 1)!r}"
    key = f"({u}) / ({weight_expr})::DOUBLE"
    if strata_exprs:
        part = ", ".join(strata_exprs)
        return f"""
            SELECT * EXCLUDE (__rn) FROM (
              SELECT *, row_number() OVER (
                PARTITION BY {part} ORDER BY {key} ASC, {id_expr} ASC
              ) AS __rn
              FROM {table}
            ) WHERE __rn <= {n}"""
    return f"""
        SELECT * FROM {table}
        ORDER BY {key} ASC, {id_expr} ASC LIMIT {n}"""


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    seed: int = 0,
) -> DataFrame:
    """Attach a ``split`` column partitioning the corpus into named
    fractions (e.g. ``{"train": 0.9, "val": 0.05, "test": 0.05}``) —
    the train/val/test assignment every dataset release needs.

    The split is a pure function of ``hash64(seed, id)``: stable under
    re-runs, engine changes, repartitioning, and corpus growth (a row's
    split never changes when other rows are added — the property that
    prevents test-set leakage across dataset versions). Cumulative
    thresholds over one hash draw the boundaries, so fractions sum to
    at most 1; any remainder gets split ``None``.

    At 100 TB this is a scan-side codegen expression: no shuffle, no
    RNG state, no driver involvement.
    """
    bucket = F.pmod(hash64(F.col(id_col).cast("string"), seed=seed), F.lit(SCALE))
    expr = None
    acc = 0
    for name, frac in splits.items():
        acc += int(frac * SCALE)
        cond = bucket < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def split_assign_sql(id_expr: str, splits: dict[str, float], seed: int = 0) -> str:
    """DuckDB SELECT-expression twin of :func:`split_assign`."""
    bucket = f"({hash64_sql(f'({id_expr})::VARCHAR', seed=seed)}) % {SCALE}"
    whens, acc = [], 0
    for name, frac in splits.items():
        acc += int(frac * SCALE)
        whens.append(f"WHEN {bucket} < {acc} THEN '{name}'")
    return "CASE " + " ".join(whens) + " END"


def mixture_thresholds(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, int]:
    """Integer hash-gate thresholds (0..SCALE) realizing a target
    domain mixture without upsampling.

    Budget: ``t = min over weighted domains of n_d / w_d`` — the
    limiting domain is kept whole; every other domain keeps
    ``w_d * t / n_d`` of its rows, so the OUTPUT proportions equal the
    target weights (up to the no-upsampling cap). Domains without a
    weight are dropped.

    Float ops are written in exactly the order the SQL twin uses
    (``n/w`` then ``w*t/n`` then ``least(.,1.0)`` then
    ``floor(.*SCALE)``) so both engines compute bit-identical IEEE
    doubles and therefore identical integer thresholds.
    """
    import math

    t = min(
        counts[d] / w for d, w in weights.items() if w > 0 and d in counts
    )
    thr = {}
    for d, w in weights.items():
        if w > 0 and d in counts:
            thr[d] = math.floor(min(w * t / counts[d], 1.0) * SCALE)
    return thr


def mixture_resample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    weights: dict[str, float],
) -> DataFrame:
    """Resample a multi-domain corpus to a target mixture (the
    "data recipe" step of a training pipeline: e.g. cap web crawl at
    60%, keep all code and rare-language text).

    Per-domain counts are one hash-partitioned aggregation whose
    result is bounded by the number of domains (dozens) — the single
    driver-side collect here is a policy computation, not data
    movement. The keep decision is then the same scan-side
    deterministic hash gate as :func:`stratified_sample_hash`: no
    second shuffle, reproducible on any engine/partitioning.
    """
    counts = {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    thr = mixture_thresholds(counts, weights)
    gate = None
    for d, k in thr.items():
        gate = (
            F.when(F.col(domain_col) == d, F.lit(k))
            if gate is None
            else gate.when(F.col(domain_col) == d, F.lit(k))
        )
    gate = gate.otherwise(F.lit(0)) if gate is not None else F.lit(0)
    bucket = F.pmod(hash64(F.col(id_col).cast("string")), F.lit(SCALE))
    return df.filter(bucket < gate)


def mixture_resample_sql(
    table: str, domain_expr: str, id_expr: str, weights: dict[str, float]
) -> str:
    """DuckDB twin of :func:`mixture_resample` — recomputes counts,
    budget, and thresholds in SQL with the identical float op order."""
    values = ", ".join(f"('{d}', {w!r}::DOUBLE)" for d, w in weights.items())
    bucket = f"({hash64_sql(f'({id_expr})::VARCHAR')}) % {SCALE}"
    return f"""
        WITH counts AS (
          SELECT {domain_expr} AS d, count(*) AS n FROM {table} GROUP BY 1),
        w(d, wt) AS (SELECT * FROM (VALUES {values}) v(d, wt)),
        budget AS (
          SELECT min(n / wt) AS t FROM counts JOIN w USING (d) WHERE wt > 0),
        thr AS (
          SELECT d, floor(least(wt * t / n, 1.0) * {SCALE}) AS k
          FROM counts JOIN w USING (d) CROSS JOIN budget WHERE wt > 0)
        SELECT s.* FROM {table} s
        JOIN thr ON {domain_expr} = thr.d
        WHERE {bucket} < thr.k
    """


def per_key_quota(
    df: DataFrame,
    key_col: str,
    order_col: str,
    quota: int,
    salt_buckets: int = 32,
) -> DataFrame:
    """Cap each key at ``quota`` rows, keeping the first by
    ``order_col`` (deterministic) — the per-domain/per-source cap every
    crawl-derived corpus applies so no single site dominates training.

    Skew-safe two-phase plan: a naive ``row_number() OVER (PARTITION BY
    key)`` sends a hot key's ENTIRE row set to one task. Phase 1
    partitions by (key, salt) — salt a deterministic hash of the order
    column, never a nondeterministic expression in a shuffle key
    (SPARK-23207) — and locally keeps each bucket's first ``quota``
    rows: any row in the key's global first-``quota`` ranks ≤ quota
    within its bucket too, so phase 1 never drops a final keeper while
    bounding every key's survivors to ``salt_buckets × quota`` rows.
    Phase 2 is the exact window on the now-tiny candidate set. At
    100 TB a billion-row domain costs a bucket-parallel pass instead of
    one straggler task.
    """
    from pyspark.sql import Window

    salt = F.pmod(hash64(F.col(order_col).cast("string")), F.lit(salt_buckets))
    w1 = Window.partitionBy(F.col(key_col), salt).orderBy(F.col(order_col))
    w2 = Window.partitionBy(key_col).orderBy(F.col(order_col))
    return (
        df.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= quota)
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= quota)
        .drop("__rn1", "__rn")
    )


def per_key_quota_sql(
    table: str, key_expr: str, order_expr: str, quota: int
) -> str:
    """DuckDB twin of :func:`per_key_quota` — the single-window
    formulation (results are identical; the two-phase plan is purely a
    skew optimization)."""
    return f"""
        SELECT * EXCLUDE (__rn) FROM (
          SELECT s.*, row_number() OVER (
            PARTITION BY {key_expr} ORDER BY {order_expr}) AS __rn
          FROM {table} s)
        WHERE __rn <= {quota}
    """


def top_frac_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    frac: float,
) -> DataFrame:
    """Keep the top ``frac`` of rows per group by score (quality
    curation: e.g. the best 30% of docs per language). Rank-based, not
    threshold-based, so the kept COUNT per group is exact and the
    decision is integer-reproducible across engines (ties broken by
    id).

    Plan: one shuffle on ``group_col`` feeding two window functions
    over the same sort — Catalyst evaluates both in a single Window
    node. Groups here are coarse (languages, sources), so a per-group
    sort is the right tool; for millions-of-groups or monster groups,
    switch to an approx-quantile threshold join (percentile_approx per
    group, broadcast, filter) and give up exact counts.
    """
    from pyspark.sql import Window

    order = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    whole = Window.partitionBy(group_col)
    return (
        df.withColumn("__rn", F.row_number().over(order))
        .withColumn("__n", F.count(F.lit(1)).over(whole))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * F.lit(frac)))
        .drop("__rn", "__n")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    n_buckets: int = 1024,
) -> DataFrame:
    """Reproducible corpus shuffling for training order: every row gets
    a pseudo-random but engine- and run-stable position, as
    (bucket, pos_in_bucket) — global order is the pair, lexicographic.

    Training-data releases need the SHUFFLE itself to be reproducible
    (resume mid-epoch, compare runs, audit order-sensitive effects);
    ``df.orderBy(rand(seed))`` is partition-layout-dependent, and a
    global ``row_number() OVER (ORDER BY ...)`` funnels the whole
    corpus through one task. Here the order key is ``hash64(seed, id)``
    (md5-based, cross-engine), the bucket is its modulus, and the
    position is a per-bucket window — shuffle-partitioned by bucket, no
    global sort, no single-task stage. Readers stream buckets in
    id order, rows in pos order.
    """
    key = hash64(F.col(id_col).cast("string"), seed=seed)
    bucket = F.pmod(key, F.lit(n_buckets))
    from pyspark.sql import Window

    w = Window.partitionBy(bucket).orderBy(key, F.col(id_col))
    return df.select(
        bucket.alias("bucket"),
        F.row_number().over(w).cast("long").alias("pos_in_bucket"),
        F.col(id_col),
    )


def deterministic_shuffle_sql(
    table: str, id_expr: str, seed: int = 0, n_buckets: int = 1024
) -> str:
    """DuckDB twin of :func:`deterministic_shuffle`."""
    key = hash64_sql(f"({id_expr})::VARCHAR", seed=seed)
    return f"""
        SELECT ({key}) % {n_buckets} AS bucket,
               row_number() OVER (
                 PARTITION BY ({key}) % {n_buckets}
                 ORDER BY {key}, {id_expr})::BIGINT AS pos_in_bucket,
               {id_expr}
        FROM {table}
    """
