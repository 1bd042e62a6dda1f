"""Bloom-filter pre-filtered joins: decontamination at 100 TB.

The scale problem: "drop every corpus row whose key appears in a
blacklist" is an anti join. When the blacklist is too big to
broadcast, Spark shuffles the ENTIRE corpus on the key — at 100 TB
that shuffle is the job. But an anti join has an asymmetry a Bloom
filter exploits: a row whose key is *definitely not* in the blacklist
needs no join at all. Only "maybe present" rows (true matches + the
filter's false positives) must be verified exactly.

So: build a compact bitset over the blacklist keys (a distributed
``bit_or`` aggregation — map-side combinable, shuffle volume bounded
by ``n_partitions × m/64`` words, independent of key count), broadcast
it (a 2^27-bit filter is 16 MB and covers ~10M keys at <1% fp; Spark's
own runtime bloom join filter, `spark.sql.optimizer.runtime.
bloomFilter.enabled`, is this same idea injected automatically for
equi-joins), and split the corpus:

- ``definitely absent`` rows (the overwhelming majority when overlap
  is rare, which is the decontamination regime) pass through in a
  map-only scan — NO shuffle, no join;
- ``maybe present`` rows — a slice roughly ``|matches| + fp_rate × n``
  — go through the exact anti join.

False negatives are impossible (every set bit of a real member is
set), so ``passed ∪ (maybe ∖ keys)`` is EXACTLY the plain anti join:
the operator stays oracle-checkable with `NOT IN` SQL while the
shuffled volume drops from the full corpus to the maybe-slice.

The two branches each scan the corpus once. At 100 TB that is two
map-only parquet passes vs one corpus-wide shuffle — the right trade
whenever overlap ≪ corpus (cache/persist the flagged scan to get one
pass if the corpus is already materialized in fast storage).

Bits use ``xxhash64`` (JVM codegen, no oracle-parity needed — the
filter is an internal pruning structure, invisible in the result) with
double hashing h_i = h1 + i·h2 (Kirsch-Mitzenmacher: two hash
evaluations simulate k independent functions with no asymptotic loss
of fp-rate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "bloom_build",
    "bloom_maybe_contains",
    "bloom_anti_join",
    "bloom_semi_join",
]

# 2^20 bits = 128 KiB: <1% fp up to ~100k keys with k=5. Callers size
# m ≈ 10 bits/key (then k = ln2 · m/n ≈ 7 is optimal; 5 is close and
# cheaper). Must be a power of two (bit positions via mask, not mod).
DEFAULT_N_BITS = 1 << 20
DEFAULT_N_HASHES = 5


def _shl1(bit: Column) -> Column:
    """``1L << bit`` with a *column* shift amount (the Python
    ``F.shiftleft`` wrapper only takes int literals; the SQL function
    takes expressions)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bit.cast("int"))


def _h1(key: Column) -> Column:
    return F.xxhash64(key)


def _h2(key: Column) -> Column:
    # Independent second hash: seed by prepending a tag column. The
    # caller forces the masked step odd so h2 mod m can't collapse the
    # k probes into one position.
    return F.xxhash64(F.lit("bloom-h2"), key)


def _bit_positions(key: Column, n_bits: int, n_hashes: int) -> Column:
    """array<long> of ``n_hashes`` bit positions in [0, n_bits)."""
    mask = F.lit(n_bits - 1)
    # Masking BEFORE the arithmetic: (h1 + i·h2) mod m ==
    # ((h1 mod m) + i·(h2 mod m)) mod m when m is a power of two, and
    # the masked operands are < 2^n so the sum can't overflow ANSI
    # long arithmetic (Spark 4 default throws on wrap).
    h1 = _h1(key).bitwiseAND(mask)
    h2 = _h2(key).bitwiseAND(mask).bitwiseOR(F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: (h1 + i.cast("long") * h2).bitwiseAND(mask),
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> list[int]:
    """Distributed Bloom build: returns the filter as ``n_bits/64``
    longs.

    Plan: per key, explode its ``n_hashes`` bit positions →
    ``groupBy(word_index).agg(bit_or(bit))``. ``bit_or`` is
    map-side combinable, so each of P scan partitions contributes at
    most ``n_bits/64`` pre-combined rows to the shuffle — the shuffle
    is bounded by ``P × n_bits/64`` words no matter how many billions
    of keys feed it. The collect is exactly ``≤ n_bits/64`` rows
    (2^20 bits → 16,384 longs), a driver-side structure the same size
    class as a broadcast hashmap's key digest.
    """
    if n_bits & (n_bits - 1):
        raise ValueError(f"n_bits must be a power of two, got {n_bits}")
    words = (
        keys.select(
            F.explode(
                _bit_positions(F.col(key_col), n_bits, n_hashes)
            ).alias("__pos")
        )
        .select(
            F.shiftright(F.col("__pos"), 6).alias("__w"),
            _shl1(F.col("__pos").bitwiseAND(F.lit(63))).alias("__bit"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__bit").alias("__bits"))
        .collect()
    )
    out = [0] * (n_bits // 64)
    for r in words:
        out[r["__w"]] = r["__bits"]
    return out


def bloom_maybe_contains(
    key: Column, words: Column, n_bits: int, n_hashes: int
) -> Column:
    """True iff every probed bit is set ("maybe in set"; False is a
    guarantee of absence). ``words`` is an ``array<long>`` column (the
    broadcast filter), so the whole check is one codegen'd expression."""
    return F.forall(
        _bit_positions(key, n_bits, n_hashes),
        lambda pos: (
            F.element_at(words, F.shiftright(pos, 6).cast("int") + 1)
            .bitwiseAND(_shl1(pos.bitwiseAND(F.lit(63))))
            != 0
        ),
    )


# Above this, ship the filter as a broadcast relation instead of a
# literal. The cutoff is NOT about shipping bytes: a Python-list
# literal lowers to CreateArray with one Literal child per element, so
# a 2^20-bit filter (16,384 longs) bloats every expression tree that
# references it — measured 10 s vs 1.2 s warm for the same anti join
# at sf0.01. Only genuinely tiny filters (≤1k words) stay literal;
# everything else attaches via the one-row broadcast (one fetch per
# executor, constant-size plan).
_LITERAL_MAX_BYTES = 8 << 10


def _with_filter(
    spark: SparkSession, df: DataFrame, words: list[int]
) -> DataFrame:
    """Attach the filter as an ``array<long>`` column. Small filters
    become a single array *literal* (one Literal node — the pass-through
    branch's plan then has NO join of any kind); big ones attach via a
    one-row broadcast cross join (one fetch per executor, not one copy
    per task)."""
    if len(words) * 8 <= _LITERAL_MAX_BYTES:
        return df.withColumn("__bloom_words", F.lit(words))
    words_df = spark.createDataFrame(
        [(words,)], "__bloom_words: array<bigint>"
    )
    return df.crossJoin(F.broadcast(words_df))


def bloom_anti_join(
    big: DataFrame,
    keys: DataFrame,
    big_key: str,
    keys_key: str | None = None,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Exact ``big WHERE big_key NOT IN keys`` with Bloom pre-pruning.

    Result is bit-identical to ``big.join(keys, on, "left_anti")`` —
    the filter only routes rows: definite-absent rows bypass the join
    entirely (map-only), maybe-present rows are verified by the exact
    anti join. See module docstring for the 100 TB shuffle math.
    """
    keys_key = keys_key or big_key
    spark = big.sparkSession
    words = bloom_build(keys, keys_key, n_bits, n_hashes)
    flagged = _with_filter(spark, big, words)
    maybe = bloom_maybe_contains(
        F.col(big_key), F.col("__bloom_words"), n_bits, n_hashes
    )
    passed = flagged.filter(~maybe).drop("__bloom_words")
    suspects = flagged.filter(maybe).drop("__bloom_words").join(
        keys.select(F.col(keys_key).alias(big_key)).distinct(),
        on=big_key,
        how="left_anti",
    )
    return passed.unionByName(suspects)


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    big_key: str,
    keys_key: str | None = None,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Exact ``big WHERE big_key IN keys``: definite-absent rows are
    dropped pre-shuffle (the common case in a selective semi join), and
    only the maybe-slice enters the exact semi join — the manual form
    of Spark's runtime bloom-filter join pruning."""
    keys_key = keys_key or big_key
    spark = big.sparkSession
    words = bloom_build(keys, keys_key, n_bits, n_hashes)
    flagged = _with_filter(spark, big, words)
    maybe = bloom_maybe_contains(
        F.col(big_key), F.col("__bloom_words"), n_bits, n_hashes
    )
    return (
        flagged.filter(maybe)
        .drop("__bloom_words")
        .join(
            keys.select(F.col(keys_key).alias(big_key)).distinct(),
            on=big_key,
            how="left_semi",
        )
    )
