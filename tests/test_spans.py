"""Span-level dedup + containment semantics on planted data.

Cross-engine parity on real testdata is covered by
tests/test_entry.py (duplicate_spans / containment_top1 oracle rows);
these tests pin the SEMANTICS: which spans count as duplicated, the
window/stride grid, and containment's asymmetry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bergloom_spark.operators.spans import (
    containment_top1,
    duplicate_spans,
    span_hashes,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _words(tag, n):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_duplicate_spans_flags_shared_window(spark):
    shared = _words("s", 20)  # exactly one 20-token window
    docs = _docs(
        spark,
        [
            (1, shared + " " + _words("a", 20)),
            (2, shared + " " + _words("b", 20)),
            (3, _words("c", 40)),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in duplicate_spans(
            docs, "text", "doc_id", window=20, stride=10, min_docs=2
        ).collect()
    }
    # 40 tokens, window 20, stride 10 -> starts 1, 11, 21: 3 spans.
    assert out[1]["n_spans"] == 3
    # Only the start-1 window (the shared prefix) recurs across docs:
    # doc 1's other windows mix s…/a…, doc 2's mix s…/b….
    assert out[1]["n_dup_spans"] == 1
    assert out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_spans"] == 0
    assert abs(out[1]["dup_span_frac"] - round(1 / 3, 6)) < 1e-9


def test_duplicate_spans_short_docs_report_zero(spark):
    docs = _docs(spark, [(1, _words("x", 5)), (2, _words("x", 5))])
    rows = duplicate_spans(
        docs, "text", "doc_id", window=20, stride=10
    ).collect()
    assert {(r["n_spans"], r["n_dup_spans"], r["dup_span_frac"]) for r in rows} == {
        (0, 0, 0.0)
    }


def test_duplicate_spans_min_docs_counts_distinct_docs(spark):
    rep = _words("r", 20)
    # Doc 1 contains the same window TWICE (starts 1 and 21); no other
    # doc has it -> with min_docs=2 (distinct docs) nothing is flagged.
    docs = _docs(spark, [(1, rep + " " + rep), (2, _words("z", 40))])
    out = {
        r["doc_id"]: r["n_dup_spans"]
        for r in duplicate_spans(
            docs, "text", "doc_id", window=20, stride=10, min_docs=2
        ).collect()
    }
    assert out == {1: 0, 2: 0}


def test_span_hashes_grid(spark):
    docs = _docs(spark, [(1, _words("w", 45))])
    rows = span_hashes(docs, "text", "doc_id", window=20, stride=10).collect()
    assert [r["start"] for r in sorted(rows, key=lambda r: r["start"])] == [
        1,
        11,
        21,
    ]  # 26 would need tokens 26..45 -> start 26 > 45-19=26? no: max_start=26
    # ^ max_start = 45-19 = 26; sequence(1, 26, 10) = [1, 11, 21] — 26
    # is not on the stride grid, so the tail window [26..45] is skipped.


def test_containment_is_asymmetric(spark):
    short = _words("p", 10)
    docs = _docs(
        spark,
        [
            (1, short),  # probe: wholly contained in doc 2
            (2, short + " " + _words("q", 90)),
            (3, _words("u", 30)),
        ],
    )
    out = containment_top1(
        docs, "text", "doc_id", probe_ids=[1], shingle_n=3
    ).collect()
    assert len(out) == 1
    assert out[0]["match_id"] == 2
    # every probe shingle occurs in doc 2 -> containment exactly 1.0,
    # though Jaccard would be ~8/96.
    assert out[0]["containment"] == 1.0


# ---------------------------------------------------------------------------
# remove_duplicate_spans: the excise-and-rebuild step
# ---------------------------------------------------------------------------
def test_remove_duplicate_spans_excises_shared_blocks(spark):
    from bergloom_spark.operators.spans import remove_duplicate_spans

    shared = _words("s", 20)  # one full block, duplicated across docs
    docs = _docs(
        spark,
        [
            (1, shared + " " + _words("a", 20)),
            (2, shared + " " + _words("b", 20)),
            (3, _words("c", 30)),  # 2 blocks (one partial), unique
            (4, ""),  # zero tokens
        ],
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            docs, "text", "doc_id", window=20, min_docs=2
        ).collect()
    }
    # Docs 1/2: block 1 (shared) removed from BOTH, block 2 survives.
    assert out[1]["clean_text"] == _words("a", 20)
    assert out[2]["clean_text"] == _words("b", 20)
    assert (out[1]["n_blocks"], out[1]["n_removed"]) == (2, 1)
    # Doc 3 untouched, whitespace-normalized rebuild equals original.
    assert out[3]["clean_text"] == _words("c", 30)
    assert (out[3]["n_blocks"], out[3]["n_removed"]) == (2, 0)
    # Empty doc: no blocks, empty text (not NULL).
    assert out[4]["clean_text"] == ""
    assert (out[4]["n_blocks"], out[4]["n_removed"]) == (0, 0)


def test_remove_duplicate_spans_fully_excised_doc_is_empty_string(spark):
    from bergloom_spark.operators.spans import remove_duplicate_spans

    blk = _words("z", 20)
    docs = _docs(spark, [(1, blk), (2, blk)])
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            docs, "text", "doc_id", window=20, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == ""
    assert out[1]["n_removed"] == 1


def test_remove_duplicate_spans_partial_tail_block_matches(spark):
    from bergloom_spark.operators.spans import remove_duplicate_spans

    # 30 tokens: blocks [1..20] and [21..30]; the 10-token tail is a
    # real block and two docs sharing it get it excised.
    tail = _words("t", 10)
    docs = _docs(
        spark,
        [
            (1, _words("a", 20) + " " + tail),
            (2, _words("b", 20) + " " + tail),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            docs, "text", "doc_id", window=20, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == _words("a", 20)
    assert (out[1]["n_blocks"], out[1]["n_removed"]) == (2, 1)


def test_remove_duplicate_spans_oracle_parity(spark, tmp_path):
    import duckdb

    from bergloom_spark.operators.spans import (
        remove_duplicate_spans,
        remove_duplicate_spans_sql,
    )
    from tests.oracle_utils import compare

    shared = _words("s", 20)
    rows = [
        (1, shared + " " + _words("a", 25)),
        (2, shared + " " + _words("b", 5)),
        (3, _words("c", 41)),
        (4, shared),
        (5, ""),
    ]
    docs = _docs(spark, rows)
    p = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    compare(
        remove_duplicate_spans(
            spark.read.parquet(p), "text", "doc_id", window=20, min_docs=2
        ),
        con,
        remove_duplicate_spans_sql("documents", window=20, min_docs=2),
    )


# ---------------------------------------------------------------------------
# cdc_chunks: content-defined chunking
# ---------------------------------------------------------------------------
def test_cdc_chunks_reconstruct_and_size(spark):
    from bergloom_spark.operators.spans import cdc_chunks

    docs = _docs(spark, [(i, _words(f"d{i}_", 200)) for i in range(5)])
    out = cdc_chunks(docs, "text", "doc_id", avg_tokens=16, window=4)
    rows = out.collect()
    # Reconstruction: chunks in order concatenate back to the doc.
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    for i in range(5):
        chunks = [t for _, t in sorted(by_doc[i])]
        assert " ".join(chunks) == _words(f"d{i}_", 200)
    # Expected size: 200 tokens / avg 16 → somewhere sane.
    n_chunks = len(rows) / 5
    assert 4 <= n_chunks <= 40
    assert all(r["n_tokens"] >= 1 for r in rows)


def test_cdc_chunks_edit_locality(spark):
    """The content-defined property: editing one token must leave
    chunks outside the edit's hash window untouched (fixed-size
    chunking would shift every later boundary)."""
    from bergloom_spark.operators.spans import cdc_chunks

    base_text = _words("w", 300)
    toks = base_text.split()
    toks[150] = "EDITED"
    edited_text = " ".join(toks)
    docs = _docs(spark, [(1, base_text), (2, edited_text)])
    out = cdc_chunks(docs, "text", "doc_id", avg_tokens=16, window=4)
    hashes = {1: set(), 2: set()}
    for r in out.collect():
        hashes[r["doc_id"]].add(r["chunk_hash"])
    shared = hashes[1] & hashes[2]
    # all chunks except the few touching the edit survive
    assert len(shared) >= len(hashes[1]) - 3
    assert hashes[1] != hashes[2]  # the edited chunk did change


def test_cdc_chunks_empty_and_short_docs(spark):
    from bergloom_spark.operators.spans import cdc_chunks

    docs = _docs(spark, [(1, ""), (2, "one two")])
    rows = cdc_chunks(docs, "text", "doc_id", avg_tokens=16, window=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc  # empty doc -> no chunks
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "one two"
