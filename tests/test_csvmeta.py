"""CSV dialect-sniff tests (round 10): RFC 4180 state machine,
dialect detection, DuckDB sniff_csv interop, and the sniff →
spark.read.csv handoff the operator exists for."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest

from bergloom_spark.operators.csvmeta import csv_meta, make_csv, split_csv


def test_split_rfc4180_quoting():
    text = 'a,"b,with,commas","line\nbreak","doubled""quote"\n1,2,3,4\n'
    recs = split_csv(text)
    assert recs == [
        ["a", "b,with,commas", "line\nbreak", 'doubled"quote'],
        ["1", "2", "3", "4"],
    ]


def test_split_crlf_and_trailing_newline():
    assert split_csv("a,b\r\nc,d\r\n") == [["a", "b"], ["c", "d"]]
    assert split_csv("a,b\nc,d") == [["a", "b"], ["c", "d"]]


def test_split_unterminated_quote_rejected():
    with pytest.raises(ValueError, match="unterminated"):
        split_csv('a,"broken\n')


@pytest.mark.parametrize("delim", [",", "\t", ";", "|"])
def test_delimiter_detection(delim):
    rows = [[f"v{r}_{c}" for c in range(4)] for r in range(20)]
    header = [f"col_{c}" for c in range(4)]
    payload = make_csv(rows, delimiter=delim, header=header)
    m = csv_meta(payload)
    assert m["delimiter"] == delim
    assert m["n_cols"] == 4
    assert m["n_rows_sampled"] == 21
    assert m["ragged_frac_milli"] == 0


def test_header_detection():
    rows = [[str(r), f"name {r}", str(r * 1.5)] for r in range(10)]
    with_h = make_csv(rows, header=["id", "name", "score"])
    without = make_csv(rows)
    assert csv_meta(with_h)["has_header"] is True
    assert csv_meta(without)["has_header"] is False


def test_quoted_delimiters_do_not_confuse_detection():
    # commas INSIDE quoted fields of a ;-separated file
    rows = [[f"a,b,c {r}", f"d,e {r}", str(r)] for r in range(15)]
    payload = make_csv(rows, delimiter=";", quote_all=True)
    m = csv_meta(payload)
    assert m["delimiter"] == ";"
    assert m["n_cols"] == 3


def test_ragged_rows_reported():
    good = make_csv([[str(r), "x", "y"] for r in range(9)])
    payload = good + b"only,two\n"
    m = csv_meta(payload)
    assert m["n_cols"] == 3
    assert m["ragged_frac_milli"] == 100  # 1 of 10


def test_single_column_rejected():
    with pytest.raises(ValueError, match="multi-column"):
        csv_meta(b"just text\nno delimiters here\n")


def test_duckdb_sniff_csv_interop():
    rows = [[str(r), f"name {r}", str(r * 2)] for r in range(25)]
    for delim in (",", ";", "\t", "|"):
        payload = make_csv(rows, delimiter=delim,
                           header=["id", "name", "double"])
        with tempfile.NamedTemporaryFile(suffix=".csv",
                                         delete=False) as fh:
            fh.write(payload)
            path = fh.name
        try:
            duck = duckdb.sql(
                f"SELECT Delimiter, HasHeader FROM sniff_csv('{path}')"
            ).fetchone()
            ours = csv_meta(payload)
            assert ours["delimiter"] == duck[0], delim
            assert ours["has_header"] == duck[1], delim
        finally:
            os.unlink(path)


def test_sniff_feeds_spark_read(spark):
    """The point of the operator: sniff → spark.read.csv options →
    correct distributed parse."""
    rows = [[str(r), f"item {r}", str(r * 3)] for r in range(30)]
    payload = make_csv(rows, delimiter=";",
                       header=["id", "label", "triple"])
    m = csv_meta(payload)
    with tempfile.NamedTemporaryFile(suffix=".csv",
                                     delete=False) as fh:
        fh.write(payload)
        path = fh.name
    try:
        df = spark.read.csv(
            path, sep=m["delimiter"], quote=m["quote"],
            header=m["has_header"], inferSchema=False,
        )
        assert df.columns == ["id", "label", "triple"]
        assert df.count() == 30
        got = {r.id: (r.label, r.triple) for r in df.collect()}
        assert got["7"] == ("item 7", "21")
    finally:
        os.unlink(path)


def test_multibyte_char_straddling_sample_boundary():
    """Review r10: a valid file whose sample cut lands inside a
    multi-byte sequence must not be rejected as non-UTF-8."""
    rows = [["é" * 10, str(r)] for r in range(50)]
    payload = make_csv(rows)
    # place the cut INSIDE one of the 2-byte 'é' sequences
    cut = payload.index("é".encode()) + 1
    m = csv_meta(payload, sample_bytes=cut + 40 * 2 + 1)
    assert m["delimiter"] == ","
    assert m["n_cols"] == 2


def test_large_csv_many_short_rows_sniffs():
    """Review r10 pass 2: the field cap is per record, so a normal
    megabyte-scale CSV of short rows must sniff fine."""
    rows = [[str(r), "ab"] for r in range(200_000)]
    m = csv_meta(make_csv(rows))
    assert m["delimiter"] == ","
    assert m["n_cols"] == 2


def test_quoted_newline_straddling_sample_boundary():
    """Review r10 pass 2: a sample cut inside a quoted field with
    newlines must not kill the true delimiter candidate."""
    rows = [[f"line1\nline2 {r}", str(r)] for r in range(2000)]
    payload = make_csv(rows)
    # cut inside a quoted field near 16 KiB
    cut = payload.index(b'"line1', 1 << 14) + 3
    m = csv_meta(payload, sample_bytes=cut)
    assert m["delimiter"] == ","
    assert m["n_cols"] == 2


def test_single_long_record_still_sniffs():
    """Review r10 pass 3: a first record longer than the sample gets
    a best-effort sniff instead of a reject."""
    payload = ("a,b,c,d," * 100 + "end\n" + "1,2\n").encode()
    m = csv_meta(payload, sample_bytes=40)
    assert m["delimiter"] == ","
