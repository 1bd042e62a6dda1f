"""Text-hygiene battery — the normalization passes a pretraining
pipeline runs BEFORE hashing/dedup/quality so that byte-level
variance doesn't masquerade as content variance:

- **Unicode NFC normalization**: é as U+00E9 and as e+U+0301 must
  hash identically or near-dup clusters split. Arrow-batched pandas
  UDF over ``unicodedata`` (the one hygiene pass that genuinely
  needs a library call); DuckDB's ``nfc_normalize`` is the oracle
  twin.
- **Invisible-character stripping**: zero-width spaces/joiners, BOM,
  soft hyphens, directional marks, and C0/C1 controls (except
  tab/newline) — the classic crawl noise that breaks tokenizers and
  inflates dedup distances. Pure codegen regexp (zero Python).
- **Mojibake scoring**: counts the UTF-8-read-as-latin-1 artifact
  bigrams (``â€™``, ``Ã©``-class, ``Â°``-class) that mark a document
  as double-encoded — a cheap filter signal every corpus report
  tracks. Pure codegen regexp_count.
- **Compression ratio**: ``len(zlib(text)) / len(text)`` — the
  Dolma/RedPajama quality signal (boilerplate and repetition
  compress far below prose). Arrow-batched pandas UDF; no SQL twin
  exists in DuckDB, so queries built on it register as rows-only —
  the integer-milli variant keeps it hashable when an oracle IS
  wanted via a pinned recipe.

All scan-side: none of these shuffle anything."""

from __future__ import annotations

import unicodedata
import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

__all__ = [
    "nfc_normalize",
    "nfc_normalize_sql",
    "strip_invisible",
    "strip_invisible_sql",
    "mojibake_count",
    "mojibake_count_sql",
    "compression_ratio_milli",
    "dedup_lines",
    "dedup_lines_sql",
    "dup_line_frac_milli",
    "dup_line_frac_milli_sql",
]

# zero-width + BOM + word-joiner + soft hyphen + bidi marks/embeds
# + C0 controls except \t\n\r + DEL + C1 controls. Explicit class,
# engine-portable: \x{...} escapes, NOT \uXXXX — Java accepts both
# but RE2 (DuckDB) only the brace form.
_INVISIBLE_CLASS = (
    "[\\x{200b}-\\x{200f}\\x{feff}\\x{2060}\\x{ad}"
    "\\x{202a}-\\x{202e}\\x{00}-\\x{08}\\x{0b}\\x{0c}"
    "\\x{0e}-\\x{1f}\\x{7f}\\x{80}-\\x{9f}]"
)

# The high-frequency UTF-8-bytes-decoded-as-cp1252/latin-1 artifact
# bigrams: â€¦ (punctuation family), Ã + accented-letter family,
# Â + NBSP/degree/guillemet family. Kept to artifacts that are
# vanishingly rare in clean text.
_MOJIBAKE_PAT = (
    "(â€™|â€œ|â€\\x{9d}|â€“|â€”|â€¦|â€˜|"
    "Ã©|Ã¨|Ã¼|Ã¶|Ã¤|Ã±|Ã§|Ã¡|Ã³|Ãº|Ã\\x{ad}|"
    "Â°|Â£|Â«|Â»|Â®|Â©|Â\\x{a0})"
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# DataType instances, not DDL strings: string return types are
# parsed through the active SparkContext, which need not exist at
# import time (pytest collects this module before any session)
@pandas_udf(StringType())
def _nfc_udf(s: pd.Series) -> pd.Series:
    return s.map(
        lambda t: unicodedata.normalize("NFC", t)
        if t is not None else None
    )


def nfc_normalize(col: Column | str) -> Column:
    """Unicode NFC — composed canonical form, the pre-hash contract.
    Arrow-batched (one Python call per batch, not per row)."""
    return _nfc_udf(_c(col))


def nfc_normalize_sql(expr: str) -> str:
    """DuckDB twin (both sides implement the same Unicode canon;
    version skew would surface as a hash mismatch, which is the
    point of twinning it)."""
    return f"nfc_normalize({expr})"


def strip_invisible(col: Column | str) -> Column:
    """Remove zero-width/bidi/control noise (keeps tab/newline/CR).
    Pure codegen regexp_replace."""
    return F.regexp_replace(_c(col), _INVISIBLE_CLASS, "")


def strip_invisible_sql(expr: str) -> str:
    return f"regexp_replace({expr}, '{_INVISIBLE_CLASS}', '', 'g')"


def mojibake_count(col: Column | str) -> Column:
    """Occurrences of double-encoding artifact sequences — 0 on
    clean text; a handful marks the document for re-decode or
    drop."""
    return F.regexp_count(_c(col), F.lit(_MOJIBAKE_PAT)).cast("long")


def mojibake_count_sql(expr: str) -> str:
    return (
        f"len(regexp_extract_all({expr}, '{_MOJIBAKE_PAT}'))::BIGINT"
    )


def dedup_lines(col: Column | str) -> Column:
    """Remove repeated lines within a document, keeping first
    occurrences in order — the Gopher/Dolma repetition-removal
    TRANSFORM (the quality battery only scores it). Spark's
    ``array_distinct`` preserves first-occurrence order; pure
    codegen split → distinct → join, zero Python."""
    return F.array_join(
        F.array_distinct(F.split(_c(col), "\n", -1)), "\n"
    )


def dedup_lines_sql(expr: str) -> str:
    """DuckDB twin. ``list_distinct`` does NOT preserve order there,
    so the replay filters on first-occurrence index via
    ``list_position`` (quadratic in line count — fine for an
    oracle, which is why the Spark side is the engine)."""
    split = f"string_split({expr}, chr(10))"
    return (
        f"list_aggregate(list_filter({split}, "
        f"(x, i) -> list_position({split}, x) = i), "
        f"'string_agg', chr(10))"
    )


def dup_line_frac_milli(col: Column | str) -> Column:
    """Per-mille of lines that are repeats of an earlier line — the
    scoring twin of :func:`dedup_lines` (0 = no repetition)."""
    lines = F.split(_c(col), "\n", -1)
    n = F.size(lines)
    return (
        (n - F.size(F.array_distinct(lines)))
        * F.lit(1000) / n
    ).cast("long")


def dup_line_frac_milli_sql(expr: str) -> str:
    split = f"string_split({expr}, chr(10))"
    return (
        f"((len({split}) - len(list_distinct({split}))) * 1000 "
        f"// len({split}))::BIGINT"
    )


@pandas_udf(LongType())
def _zratio_udf(s: pd.Series) -> pd.Series:
    def ratio(t):
        if t is None:
            return None
        raw = t.encode("utf-8")
        if not raw:
            return 1000
        return len(zlib.compress(raw, 6)) * 1000 // len(raw)

    return s.map(ratio)


def compression_ratio_milli(col: Column | str) -> Column:
    """``len(zlib.compress(utf8)) * 1000 // len(utf8)`` — integer
    milli-ratio (repo convention: integers hash stably across
    engines). Low values flag repetition/boilerplate; prose sits
    roughly in the 300-600 band. zlib level pinned to 6 so the
    signal is deterministic across runs and machines (zlib's output
    is stable for a given level/strategy — this is data, so the
    pin is load-bearing). No SQL twin: DuckDB has no deflate
    scalar, so registered queries built on this are rows-only by
    design."""
    return _zratio_udf(_c(col))
