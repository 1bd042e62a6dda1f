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
