"""Span-level (exact-substring) intra-corpus dedup + containment.

Document-level dedup (exact / minhash / simhash, ``dedup.py``) misses
the regime Lee et al., "Deduplicating Training Data Makes Language
Models Better" (ACL 2022) showed matters most: long spans repeated
ACROSS otherwise-distinct documents (boilerplate, licenses, templated
paragraphs). The exact-substring pass there finds repeated token
windows corpus-wide; the standard scalable approximation is rolling
window fingerprints:

- each doc emits hashes of its ``window``-token spans at ``stride``
  offsets (scan-side expression, no Python);
- a span hash occurring in ≥ ``min_docs`` distinct docs is
  "duplicated text";
- per doc, the fraction of its spans that are duplicated is the
  curation signal (drop, or trim the flagged spans).

Scale shape at 100 TB: the corpus text never shuffles — the exchange
carries (span_hash: 8 B, doc_id) pairs, ~tokens/stride rows per doc.
The hot-span aggregation is map-side combinable on the hash, and the
per-doc rollup is a second combinable aggregation on doc_id; both are
the same two-shuffle layout as minhash-LSH banding. A boilerplate
span shared by millions of docs is ONE group post-combine per task —
skew-bounded the same way a distinct() is.

Containment (``containment_top1``) is the asymmetric companion:
Jaccard misses a short doc copied INTO a long one (the union term
drowns it); containment |S(a) ∩ S(b)| / |S(a)| scores 1.0 for a true
subset regardless of the host's size. Bounded-probe form here
(broadcast, exact, oracle-checkable); the corpus-scale candidate
generator is the same banded MinHash index (`minhash_lsh_pairs`) —
LSH on the SHORTER side's signature approximates containment when
bands are computed per-side.

Reference scope note: the reference engine (BergLoom) has no text
operators; this module extends the rebuild's curation surface the way
`dedup.py` does, with every result DuckDB-twinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bergloom_spark.functions import text as TX
from bergloom_spark.functions.hashing import hash64, hash64_sql

__all__ = [
    "span_hashes",
    "duplicate_spans",
    "duplicate_spans_sql",
    "remove_duplicate_spans",
    "remove_duplicate_spans_sql",
    "cdc_chunks",
    "cdc_chunks_sql",
    "containment_top1",
    "containment_top1_sql",
]


def span_hashes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """(doc_id, start, span_hash) for every ``window``-token span at
    ``stride`` offsets. 1-based token starts; docs shorter than
    ``window`` tokens emit nothing (no partial windows — a partial
    span's hash would never match a full one anyway)."""
    toks = TX.tokens(text_col)
    max_start = F.size(toks) - (window - 1)
    starts = F.when(
        max_start >= 1,
        F.sequence(F.lit(1), max_start, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    spans = F.transform(
        starts,
        lambda i: F.struct(
            i.cast("int").alias("start"),
            hash64(F.concat_ws(" ", F.slice(toks, i, window))).alias("h"),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(spans).alias("__s")
    ).select("doc_id", F.col("__s.start").alias("start"), F.col("__s.h").alias("h"))


def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 20,
    stride: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Per-doc duplicated-span report: (doc_id, n_spans, n_dup_spans,
    dup_span_frac), where a span is duplicated iff its hash occurs in
    ≥ ``min_docs`` DISTINCT docs. Docs with zero spans report 0/0/0.

    Plan (r14 single-consumer restructure, guide §2.4): span scan
    (map) → ONE (h, doc_id) aggregation with map-side partial agg
    (shuffle #1, 8-byte keys + counts) → window count over h gives
    the distinct-doc frequency on the already-aggregated rows →
    per-doc sum (combinable shuffle #2). The expensive tokenize+hash
    scan has exactly ONE consumer by construction — the old
    count-distinct + semi-join form gave it two (the aggregation and
    the join probe each re-executed the scan; exchange reuse did not
    canonicalize across the differing projections, measured 2× the
    dominant per-task compute). The doc text stays in the scan stage;
    nothing row-sized crosses an exchange."""
    spans = span_hashes(df, text_col, id_col, window, stride)
    per_hd = spans.groupBy("h", "doc_id").agg(
        F.count(F.lit(1)).alias("__c")
    )
    # per_hd holds one row per DISTINCT (h, doc_id): a plain window
    # count over h is exactly count_distinct(doc_id) — on rows already
    # reduced by the aggregation, so the per-key window buffer holds
    # aggregate rows, not raw span occurrences.
    dup_counts = (
        per_hd.withColumn(
            "__nd", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("__nd") >= min_docs)
        .groupBy("doc_id")
        .agg(F.sum("__c").alias("n_dup_spans"))
    )
    toks = TX.tokens(text_col)
    max_start = F.size(toks) - (window - 1)
    n_spans = F.when(
        max_start >= 1,
        ((max_start - 1) / F.lit(stride)).cast("long") + 1,
    ).otherwise(F.lit(0))
    per_doc = df.select(
        F.col(id_col).alias("doc_id"), n_spans.alias("n_spans")
    )
    return per_doc.join(dup_counts, "doc_id", "left").select(
        "doc_id",
        "n_spans",
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.round(
            F.coalesce("n_dup_spans", F.lit(0)).cast("double")
            / F.greatest("n_spans", F.lit(1)).cast("double"),
            6,
        ).alias("dup_span_frac"),
    )


def _span_hashes_sql(
    table: str,
    text_expr: str,
    id_expr: str,
    window: int,
    stride: int,
) -> str:
    toks = TX.tokens_sql(text_expr)
    return f"""
        SELECT {id_expr} AS doc_id,
               unnest(list_transform(
                 range(1, greatest(len({toks}) - {window - 1}, 0) + 1,
                       {stride}),
                 i -> {hash64_sql(
                     f"array_to_string(list_slice({toks}, i, i + {window - 1}), ' ')"
                 )})) AS h
        FROM {table}"""


def duplicate_spans_sql(
    table: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    window: int = 20,
    stride: int = 10,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`duplicate_spans` (same hash, same grid)."""
    toks = TX.tokens_sql(text_expr)
    spans = _span_hashes_sql(table, text_expr, id_expr, window, stride)
    return f"""
      WITH spans AS ({spans}),
      hot AS (
        SELECT h FROM spans GROUP BY h
        HAVING count(DISTINCT doc_id) >= {min_docs}
      ),
      dup_counts AS (
        SELECT doc_id, count(*)::BIGINT AS n_dup_spans
        FROM spans WHERE h IN (SELECT h FROM hot)
        GROUP BY doc_id
      ),
      per_doc AS (
        SELECT {id_expr} AS doc_id,
               CASE WHEN len({toks}) - {window - 1} >= 1
                    THEN ((len({toks}) - {window - 1} - 1) // {stride})::BIGINT + 1
                    ELSE 0 END AS n_spans
        FROM {table}
      )
      SELECT p.doc_id, p.n_spans,
             coalesce(d.n_dup_spans, 0)::BIGINT AS n_dup_spans,
             round(coalesce(d.n_dup_spans, 0)::DOUBLE
                   / greatest(p.n_spans, 1)::DOUBLE, 6) AS dup_span_frac
      FROM per_doc p LEFT JOIN dup_counts d USING (doc_id)"""


def _block_starts(toks, window: int):
    """1-based starts of the non-overlapping ``window``-token blocks of
    a token array (the trailing partial block included)."""
    return F.when(
        F.size(toks) >= 1,
        F.sequence(F.lit(1), F.size(toks), F.lit(window)),
    ).otherwise(F.array().cast("array<int>"))


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Exact-substring dedup with text RECONSTRUCTION: excise every
    non-overlapping ``window``-token block whose content occurs in
    ≥ ``min_docs`` distinct docs, and rebuild the cleaned text from
    the surviving blocks (Lee et al. 2022's remove step; the
    ``duplicate_spans`` report is the detect step).

    Policy: remove EVERY occurrence of a cross-doc duplicated block
    (boilerplate/license text should survive in no document). A
    keep-one-copy policy is a one-line variant: rank occurrences per
    hash and semi-join all but the min-(doc_id, start).

    Output: (doc_id, clean_text, n_blocks, n_removed). ``clean_text``
    is whitespace-normalized (single spaces) on BOTH engines, so the
    rebuild is deterministic.

    Scale shape: the corpus text never crosses an exchange — shuffles
    carry (block_hash, doc_id) then (doc_id, start) pairs; the
    rebuild joins each doc against only its own (tiny) sorted
    removed-starts array and re-slices the token array scan-side.
    """
    toks = TX.tokens(text_col)
    starts = _block_starts(toks, window)
    spans = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    i.cast("int").alias("start"),
                    hash64(
                        F.concat_ws(" ", F.slice(toks, i, window))
                    ).alias("h"),
                ),
            )
        ).alias("__s"),
    ).select("doc_id", F.col("__s.start").alias("start"), F.col("__s.h").alias("h"))
    # r14 single-consumer restructure (guide §2.4, same shape as
    # duplicate_spans): ONE (h, doc_id) aggregation consumes the
    # expensive block-hash scan, the hot-hash test is a window count
    # over the aggregated rows (one row per distinct (h, doc_id), so
    # count == count_distinct(doc_id)), and the per-doc removed-start
    # sets are the union of the per-(h, doc) sets. Each (doc, start)
    # maps to exactly one h, so the union equals the old
    # collect_set(start) over semi-joined raw spans.
    per_hd = spans.groupBy("h", "doc_id").agg(
        F.collect_set("start").alias("__ss")
    )
    removed = (
        per_hd.withColumn(
            "__nd", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("__nd") >= min_docs)
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("__ss")))
            ).alias("__rs")
        )
    )
    toks2 = TX.tokens(F.col("__text"))
    starts2 = _block_starts(toks2, window)
    kept_starts = F.filter(
        starts2,
        lambda i: ~F.coalesce(
            F.array_contains(F.col("__rs"), i.cast("int")), F.lit(False)
        ),
    )
    clean = F.concat_ws(
        " ",
        F.flatten(F.transform(kept_starts, lambda i: F.slice(toks2, i, window))),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
        .join(removed, "doc_id", "left")
        .select(
            "doc_id",
            clean.alias("clean_text"),
            F.size(starts2).cast("long").alias("n_blocks"),
            F.coalesce(F.size("__rs"), F.lit(0)).cast("long").alias("n_removed"),
        )
    )


def remove_duplicate_spans_sql(
    table: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    window: int = 20,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`remove_duplicate_spans` (same hash, same
    non-overlapping block grid, same remove-all policy)."""
    toks = TX.tokens_sql(text_expr)
    h = hash64_sql(
        f"array_to_string(list_slice(toks, start, start + {window - 1}), ' ')"
    )
    return f"""
      WITH base AS (
        SELECT {id_expr} AS doc_id, {toks} AS toks FROM {table}
      ),
      spans AS (
        SELECT doc_id, start, {h} AS h
        FROM (
          SELECT doc_id, toks,
                 unnest(range(1, greatest(len(toks), 0) + 1, {window})) AS start
          FROM base
        )
      ),
      hot AS (
        SELECT h FROM spans GROUP BY h
        HAVING count(DISTINCT doc_id) >= {min_docs}
      ),
      removed AS (
        SELECT doc_id, list_sort(list(start)) AS rs
        FROM spans WHERE h IN (SELECT h FROM hot)
        GROUP BY doc_id
      )
      SELECT b.doc_id,
             -- coalesce: array_to_string of an empty list is NULL in
             -- DuckDB; Spark's concat_ws yields '' for a fully-excised
             -- doc
             coalesce(array_to_string(
               flatten(list_transform(
                 list_filter(range(1, greatest(len(b.toks), 0) + 1, {window}),
                             i -> r.rs IS NULL OR NOT list_contains(r.rs, i)),
                 i -> list_slice(b.toks, i, i + {window - 1}))), ' '), '')
               AS clean_text,
             ((len(b.toks) + {window - 1}) // {window})::BIGINT AS n_blocks,
             coalesce(len(r.rs), 0)::BIGINT AS n_removed
      FROM base b LEFT JOIN removed r USING (doc_id)"""


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    avg_tokens: int = 32,
    window: int = 4,
) -> DataFrame:
    """Content-defined chunking: split each doc at rolling-hash
    boundaries instead of fixed offsets — a boundary falls AFTER token
    ``i`` iff ``hash(tokens[i-window+1..i]) % avg_tokens == 0``
    (expected chunk length ≈ ``avg_tokens``).

    Why content-defined: chunk boundaries depend only on LOCAL token
    context, so inserting or deleting text reshapes chunks near the
    edit and nowhere else — chunk-level dedup across crawl snapshots
    then recognizes every untouched chunk (fixed-size chunking shifts
    every downstream boundary and matches nothing after the edit).

    This is the STATELESS basic-CDC variant: boundary eligibility does
    not depend on the previous boundary, so the whole computation is
    one scan-side expression — boundary positions as a filtered
    sequence, chunks as slices between consecutive boundaries, O(n)
    array work per doc, no shuffle, no Python. (FastCDC-style min/max
    chunk clamps need sequential per-doc state — a ``mapInPandas``
    per-doc kernel if ever required.)

    Output: (doc_id, chunk_idx, chunk_text, n_tokens, chunk_hash) —
    ``chunk_hash`` is the cross-engine 60-bit hash of the chunk text,
    ready for chunk-level dedup joins.
    """
    toks = TX.tokens(text_col)
    n = F.size(toks)
    bpos = F.filter(
        F.when(n >= window, F.sequence(F.lit(window), n)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.pmod(
            hash64(F.concat_ws(" ", F.slice(toks, i - (window - 1), window))),
            F.lit(avg_tokens),
        )
        == 0,
    )
    starts = F.concat(F.array(F.lit(0)), bpos)
    ends = F.concat(bpos, F.array(n))
    pieces = F.filter(
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.struct(
                s.alias("s"),
                F.concat_ws(" ", F.slice(toks, s + 1, e - s)).alias("txt"),
                (e - s).cast("long").alias("nt"),
            ),
        ),
        lambda p: p["nt"] > 0,
    )
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(pieces).alias("chunk_idx", "__p"),
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("__p.txt").alias("chunk_text"),
        F.col("__p.nt").alias("n_tokens"),
        hash64(F.col("__p.txt")).alias("chunk_hash"),
    )


def cdc_chunks_sql(
    table: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    avg_tokens: int = 32,
    window: int = 4,
) -> str:
    """DuckDB twin of :func:`cdc_chunks` (same hash, same boundary
    rule, same slices)."""
    toks = TX.tokens_sql(text_expr)
    bh = hash64_sql(
        f"array_to_string(list_slice(toks, i - {window - 1}, i), ' ')"
    )
    return f"""
      WITH base AS (
        SELECT {id_expr} AS doc_id, {toks} AS toks FROM {table}
      ),
      bounded AS (
        SELECT doc_id, toks,
               list_prepend(0, bpos) AS starts,
               list_append(bpos, len(toks)) AS ends
        FROM (
          SELECT doc_id, toks,
                 CASE WHEN len(toks) >= {window} THEN
                   list_filter(range({window}, len(toks) + 1),
                               i -> ({bh}) % {avg_tokens} = 0)
                 ELSE [] END AS bpos
          FROM base
        )
      ),
      exploded AS (
        SELECT doc_id, unnest(range(1, len(starts) + 1)) AS k,
               toks, starts, ends
        FROM bounded
      )
      SELECT doc_id,
             (row_number() OVER (PARTITION BY doc_id ORDER BY k) - 1)
               AS chunk_idx,
             chunk_text,
             n_tokens,
             {hash64_sql('chunk_text')} AS chunk_hash
      FROM (
        SELECT doc_id, k,
               array_to_string(
                 list_slice(toks, starts[k] + 1, ends[k]), ' ') AS chunk_text,
               (ends[k] - starts[k])::BIGINT AS n_tokens
        FROM exploded
      ) WHERE n_tokens > 0"""


def containment_top1(
    df: DataFrame,
    text_col: str,
    id_col: str,
    probe_ids: list[int],
    shingle_n: int = 3,
) -> DataFrame:
    """For each probe doc, the other doc with the highest CONTAINMENT
    of the probe: |S(probe) ∩ S(doc)| / |S(probe)| over distinct
    n-gram shingles — 1.0 whenever the probe's text is wholly embedded
    in the match, however long the host. Ties break to the smaller
    match id. Probe side broadcasts (bounded set); corpus streams."""
    shingled = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(TX.shingles(text_col, shingle_n)).alias("__sh"),
    )
    probes = shingled.filter(F.col("__id").isin(probe_ids)).select(
        F.col("__id").alias("probe_id"), F.col("__sh").alias("probe_sh")
    )
    joined = shingled.crossJoin(F.broadcast(probes)).filter(
        F.col("__id") != F.col("probe_id")
    )
    inter = F.size(F.array_intersect(F.col("__sh"), F.col("probe_sh")))
    scored = joined.select(
        "probe_id",
        F.col("__id").alias("match_id"),
        F.round(
            inter.cast("double")
            / F.greatest(F.size("probe_sh"), F.lit(1)).cast("double"),
            6,
        ).alias("containment"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("containment"), F.asc("match_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe_id", "match_id", "containment")
    )


def containment_top1_sql(
    table: str,
    probe_ids: list[int],
    text_expr: str = "text",
    id_expr: str = "doc_id",
    shingle_n: int = 3,
) -> str:
    """DuckDB twin of :func:`containment_top1`."""
    sh = TX.shingles_sql(text_expr, shingle_n)
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""
      WITH shingled AS (
        SELECT {id_expr} AS id, list_distinct({sh}) AS sh FROM {table}
      ),
      probes AS (
        SELECT id AS probe_id, sh AS probe_sh FROM shingled
        WHERE id IN ({ids})
      ),
      scored AS (
        SELECT p.probe_id, s.id AS match_id,
               round(len(list_intersect(s.sh, p.probe_sh))::DOUBLE
                     / greatest(len(p.probe_sh), 1)::DOUBLE, 6)
                 AS containment
        FROM shingled s CROSS JOIN probes p
        WHERE s.id <> p.probe_id
      )
      SELECT probe_id, match_id, containment
      FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                       ORDER BY containment DESC, match_id) AS rn
            FROM scored)
      WHERE rn = 1"""
