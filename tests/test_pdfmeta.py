"""PDF triage tests (round 10) — classic-xref walk, trailer chain,
catalog/pages resolution, tokenizer edge cases."""

from __future__ import annotations

import pytest

from bergloom_spark.operators.pdfmeta import make_pdf, pdf_meta


def test_basic_page_count_and_version():
    m = pdf_meta(make_pdf(5))
    assert m["version"] == "1.7"
    assert m["n_pages"] == 5
    assert m["encrypted"] is False
    assert m["title"] is None
    assert m["n_updates"] == 0
    # catalog + pages + 5×(content, page) = 12 objects
    assert m["n_objects"] == 12


def test_zero_page_document():
    assert pdf_meta(make_pdf(0))["n_pages"] == 0


def test_title_roundtrip_with_escapes():
    t = r"Annual (Q4) report \ draft"
    assert pdf_meta(make_pdf(2, title=t))["title"] == t


def test_encrypted_flag_suppresses_title():
    m = pdf_meta(make_pdf(3, title="secret", encrypted=True))
    assert m["encrypted"] is True
    assert m["title"] is None
    assert m["n_pages"] == 3


def test_incremental_update_chain():
    p = make_pdf(4, title="old", incremental_retitle="new title")
    m = pdf_meta(p)
    assert m["n_updates"] == 1
    assert m["title"] == "new title"  # newest xref section wins
    assert m["n_pages"] == 4
    # the un-updated prefix still parses as the original
    old = pdf_meta(make_pdf(4, title="old"))
    assert old["title"] == "old"


def test_utf16_title():
    # UTF-16BE-with-BOM /Title, the way real exporters write
    # non-latin titles (make_pdf accepts raw bytes so the xref
    # offsets stay correct)
    raw = b"\xfe\xff" + "ドキュメント".encode("utf-16-be")
    assert pdf_meta(make_pdf(1, title=raw))["title"] == "ドキュメント"
    assert pdf_meta(make_pdf(1))["title"] is None


def test_missing_header_rejected():
    with pytest.raises(ValueError, match="%PDF"):
        pdf_meta(b"not a pdf at all")


def test_bad_startxref_offset_rejected():
    p = make_pdf(1)
    broken = p[: p.rfind(b"startxref")] + b"startxref\n999999999\n%%EOF\n"
    with pytest.raises(ValueError, match="exceeds payload"):
        pdf_meta(broken)


def test_xref_stream_explicitly_gated():
    """A PDF 1.5 xref *stream* (startxref points at an object, not
    an xref keyword) gets the specific unsupported error, never a
    wrong answer."""
    p = make_pdf(1)
    # point startxref at object 1 instead of the xref table
    sx = p.rfind(b"startxref")
    hdr_len = len(b"%PDF-1.7\n") + 6
    broken = p[:sx] + b"startxref\n%d\n%%%%EOF\n" % hdr_len
    with pytest.raises(ValueError, match="cross-reference stream"):
        pdf_meta(broken)


def test_truncated_xref_rejected():
    p = make_pdf(3)
    # NB: rfind(b"xref") would land inside "startxref" — search for
    # the section keyword on its own line
    xref_at = p.rfind(b"\nxref\n") + 1
    with pytest.raises(ValueError):
        pdf_meta(p[: xref_at + 30] + p[p.rfind(b"trailer") :])


def test_corrupt_count_rejected():
    p = make_pdf(2).replace(b"/Count 2", b"/Count -7")
    with pytest.raises(ValueError, match="Count"):
        pdf_meta(p)


def test_root_not_catalog_rejected():
    p = make_pdf(1).replace(b"/Type /Catalog", b"/Type /Outline")
    with pytest.raises(ValueError, match="Catalog"):
        pdf_meta(p)


def test_prev_loop_rejected():
    p = make_pdf(1, title="t", incremental_retitle="u")
    # make the second trailer's /Prev point at the SECOND xref →
    # self-loop
    x2 = p.rfind(b"\nxref\n") + 1
    first_xref = p.find(b"\nxref\n") + 1
    assert x2 != first_xref
    broken = p.replace(b"/Prev %d" % first_xref, b"/Prev %d" % x2)
    assert broken != p
    with pytest.raises(ValueError, match="loop"):
        pdf_meta(broken)


def test_name_hash_escape_tokenizer():
    from bergloom_spark.operators.pdfmeta import _Cursor

    v = _Cursor(b"<< /Typ#65 /Catalog /N#6Fte (x) >>", 0).parse_value()
    assert v == {"Type": "Catalog", "Note": b"x"}


def test_comment_in_trailer_tolerated():
    # bytes inserted AFTER the xref table shift no stored offset
    p = make_pdf(1).replace(b"trailer\n", b"trailer\n% a comment\n")
    assert pdf_meta(p)["n_pages"] == 1


def test_pypdf_style_whitespace_variants():
    """CRLF line endings in the xref section parse identically."""
    p = make_pdf(2)
    xref_at = p.rfind(b"xref\n0 ")
    head, tail = p[:xref_at], p[xref_at:]
    tail = tail.replace(b" n \n", b" n\r\n").replace(
        b" f \n", b" f\r\n"
    )
    # startxref offset unchanged: the section starts at the same byte
    assert pdf_meta(head + tail)["n_pages"] == 2
