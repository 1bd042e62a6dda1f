"""Sequence packing: group documents into fixed token-budget packs.

Training pipelines pack many short documents into each context window
(e.g. 4096 tokens) so no compute is wasted on padding. The operator
assigns every doc a ``pack_id`` such that each pack's token sum stays
within ``max_tokens`` (a doc longer than the budget gets a pack of its
own — the trainer truncates it downstream).

Scale shape (100 TB): docs are hash-bucketed (pure function of the id —
deterministic under reruns, engines, and layout), and the greedy
first-fit-sequential scan runs INSIDE each bucket via
``applyInPandas`` — an O(bucket) Arrow-batched pass with no cross-
bucket dependency, so the whole operator is one shuffle (the bucket
exchange) regardless of corpus size. Bucket count scales with the
cluster; packs never span buckets, which costs at most one
under-filled pack per bucket — negligible fragmentation for
``n_docs ≫ n_buckets``.

The greedy reset is a prefix-dependent recurrence, which plain SQL
windows cannot express; the DuckDB oracle twin is a recursive CTE
(``pack_sql``) computing the identical rule, so the driver can still
hash-verify the operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bergloom_spark.functions.hashing import hash64, hash64_sql

# pack_id = bucket * PACK_STRIDE + per-bucket pack ordinal; collision-
# free while buckets hold < PACK_STRIDE packs (a bucket would need
# PACK_STRIDE docs for that, i.e. ~10^12 docs per bucket).
PACK_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_tokens: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign ``pack_id`` by greedy first-fit-sequential packing of
    docs ordered by id within ``hash64(id) % n_buckets`` buckets.

    Returns ``(id_col, token_col, bucket, pack_id)`` with exactly one
    row per input doc.
    """
    bucketed = df.select(
        F.col(id_col),
        F.col(token_col).cast("long"),
        F.pmod(hash64(F.col(id_col).cast("string")), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )

    def pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        bucket = int(pdf["bucket"].iloc[0])
        fill, pack = 0, -1
        packs = []
        for t in pdf[token_col]:
            t = int(t)
            if pack < 0 or fill + t > max_tokens:
                pack += 1
                fill = t
            else:
                fill += t
            packs.append(bucket * PACK_STRIDE + pack)
        pdf["pack_id"] = pd.Series(packs, dtype="int64")
        return pdf

    out_schema = f"{id_col} long, {token_col} long, bucket int, pack_id long"
    return bucketed.groupBy("bucket").applyInPandas(pack_bucket, out_schema)


def pack_sql(
    table_expr: str,
    id_col: str,
    token_expr: str,
    max_tokens: int,
    n_buckets: int = 64,
    token_name: str = "toks",
) -> str:
    """DuckDB twin of :func:`pack_sequences`: the same greedy rule as a
    recursive CTE stepping through each bucket's id-ordered docs."""
    bucket = f"({hash64_sql(f'({id_col})::VARCHAR')}) % {n_buckets}"
    return f"""
        WITH RECURSIVE base AS (
          SELECT {id_col} AS id, ({token_expr})::BIGINT AS toks,
                 ({bucket})::INTEGER AS bucket
          FROM {table_expr}),
        d AS (
          SELECT *, row_number() OVER (
            PARTITION BY bucket ORDER BY id) AS rn
          FROM base),
        p AS (
          SELECT bucket, id, toks, rn, toks AS fill, 0::BIGINT AS pack
          FROM d WHERE rn = 1
          UNION ALL
          SELECT d.bucket, d.id, d.toks, d.rn,
                 CASE WHEN p.fill + d.toks > {max_tokens}
                      THEN d.toks ELSE p.fill + d.toks END,
                 CASE WHEN p.fill + d.toks > {max_tokens}
                      THEN p.pack + 1 ELSE p.pack END
          FROM d JOIN p ON d.bucket = p.bucket AND d.rn = p.rn + 1)
        SELECT id AS {id_col}, toks AS {token_name}, bucket,
               (bucket::BIGINT * {PACK_STRIDE} + pack)::BIGINT AS pack_id
        FROM p
    """
