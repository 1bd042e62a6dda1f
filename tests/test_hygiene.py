"""Text-hygiene battery tests (round 10): NFC twin parity with
DuckDB, invisible-char stripping, mojibake scoring, compression
ratio determinism."""

from __future__ import annotations

import unicodedata
import zlib

import duckdb
import pytest

from bergloom_spark.operators.hygiene import (
    compression_ratio_milli,
    mojibake_count,
    mojibake_count_sql,
    nfc_normalize,
    nfc_normalize_sql,
    strip_invisible,
    strip_invisible_sql,
)

TEXTS = [
    "café résumé",          # decomposed accents
    "café résumé",                             # precomposed
    "ascii only text",
    "zero​width‍joined﻿ end",   # invisibles
    "soft­hyphen and bidi ‪embed‬ tail",
    "controlcharshere",
    "keep\ttabs\nand\nnewlines",
    "mojibake: donâ€™t Ã© Â° clean",
    "ﬁ ligature stays ﬁ",                      # NFC keeps U+FB01
    "한국어 조합: 각 vs 각",     # Hangul jamo compose
]


@pytest.fixture(scope="module")
def text_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "i long, t string"
    ).cache()


def _both(text_df, col_fn, sql_fn, texts=None):
    texts = TEXTS if texts is None else texts
    got_spark = {
        r.i: r.v
        for r in text_df.select("i", col_fn("t").alias("v")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE txts AS SELECT * FROM (VALUES "
        + ",".join("(?, ?)" for _ in texts) + ") t(i, t)",
        [x for pair in enumerate(texts) for x in pair],
    )
    got_duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT i, {sql_fn('t')} FROM txts"
        ).fetchall()
    }
    con.close()
    assert got_spark == got_duck, "Spark/DuckDB twin divergence"
    return got_spark


def test_nfc_twin_parity_and_semantics(text_df):
    got = _both(text_df, nfc_normalize, nfc_normalize_sql)
    # decomposed and precomposed collapse to the same bytes
    assert got[0] == got[1] == "café résumé"
    assert got[2] == "ascii only text"
    assert got[8] == "ﬁ ligature stays ﬁ"  # NFC ≠ NFKC
    assert got[9] == "한국어 조합: 각 vs 각"
    for i, t in enumerate(TEXTS):
        assert got[i] == unicodedata.normalize("NFC", t)


def test_strip_invisible(text_df):
    got = _both(text_df, strip_invisible, strip_invisible_sql)
    assert got[3] == "zerowidthjoined end"
    assert got[4] == "softhyphen and bidi embed tail"
    assert got[5] == "controlcharshere"
    assert got[6] == "keep\ttabs\nand\nnewlines"  # kept
    assert got[2] == "ascii only text"


def test_mojibake_count(text_df):
    got = _both(text_df, mojibake_count, mojibake_count_sql)
    assert got[7] == 3  # â€™, Ã©, Â°
    for i in (0, 1, 2, 6, 9):
        assert got[i] == 0, TEXTS[i]


def test_nfc_then_hash_dedups(spark):
    """The load-bearing property: NFC unifies byte-variant twins
    before fingerprinting."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("café",), ("café",)], "t string"
    )
    hashes = df.select(
        F.xxhash64(nfc_normalize("t")).alias("h")
    ).distinct().count()
    assert hashes == 1


def test_compression_ratio_milli(spark):
    rows = spark.createDataFrame(
        [
            (0, "a" * 10_000),                       # degenerate
            (1, "The quick brown fox. " * 200),      # repetitive
            (2, None),
        ],
        "i long, t string",
    ).select("i", compression_ratio_milli("t").alias("r")).collect()
    got = {r.i: r.r for r in rows}
    assert got[0] == len(zlib.compress(b"a" * 10_000, 6)) * 1000 // 10_000
    assert got[0] < 20
    assert got[1] < 100
    assert got[2] is None
    # pinned-level determinism across calls
    again = spark.createDataFrame([(0, "a" * 10_000)], "i long, t string") \
        .select(compression_ratio_milli("t").alias("r")).collect()
    assert again[0].r == got[0]


DUP_TEXTS = [
    "a\nb\na\nc\nb\na",
    "unique\nlines\nonly",
    "same\nsame\nsame\nsame",
    "",
    "one line",
    "trail\n\n\ntrail",
]


@pytest.fixture(scope="module")
def dup_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(DUP_TEXTS)], "i long, t string"
    ).cache()


def test_dedup_lines(dup_df):
    from bergloom_spark.operators.hygiene import (
        dedup_lines,
        dedup_lines_sql,
    )

    got = _both(dup_df, dedup_lines, dedup_lines_sql, texts=DUP_TEXTS)
    assert got[0] == "a\nb\nc"       # first occurrences, in order
    assert got[1] == "unique\nlines\nonly"
    assert got[2] == "same"
    assert got[4] == "one line"
    assert got[5] == "trail\n"       # empty lines dedup too


def test_dup_line_frac_milli(dup_df):
    from bergloom_spark.operators.hygiene import (
        dup_line_frac_milli,
        dup_line_frac_milli_sql,
    )

    got = _both(dup_df, dup_line_frac_milli, dup_line_frac_milli_sql,
                texts=DUP_TEXTS)
    assert got[0] == 500   # 3 of 6 repeated
    assert got[1] == 0
    assert got[2] == 750   # 3 of 4
    assert got[3] == 0
    assert got[5] == 500   # 2 of 4 ('' and 'trail' repeats)
