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


def test_startxref_at_non_xref_object_rejected():
    """startxref pointing at an ordinary object (not /Type /XRef,
    not an xref table) is a structural error, never a wrong
    answer."""
    p = make_pdf(1)
    sx = p.rfind(b"startxref")
    hdr_len = len(b"%PDF-1.7\n") + 6
    broken = p[:sx] + b"startxref\n%d\n%%%%EOF\n" % hdr_len
    with pytest.raises(ValueError, match="not /Type /XRef"):
        pdf_meta(broken)


class TestXrefStreams:
    """PDF 1.5+ cross-reference streams + object streams (round 11,
    verdict r10 missing #3): the modern layout must parse to the
    same answers the classic layout gives for identical content."""

    def test_matrix_matches_classic(self):
        import itertools

        for n, title, enc, retitle, objstm, pred in itertools.product(
            (0, 1, 5), ("Ti tle", None), (False, True),
            ("Re(ti)tled", None), (False, True), (False, True),
        ):
            classic = pdf_meta(make_pdf(
                n, title=title, encrypted=enc,
                incremental_retitle=retitle))
            modern = pdf_meta(make_pdf(
                n, title=title, encrypted=enc,
                incremental_retitle=retitle, xref_stream=True,
                objstm=objstm, predictor=pred))
            # /Size legitimately differs (the xref stream and the
            # /ObjStm container are themselves objects); everything
            # content-derived must agree.
            for k in ("version", "n_pages", "encrypted", "title",
                      "n_updates"):
                assert modern[k] == classic[k], (
                    k, n, title, enc, retitle, objstm, pred)

    def test_object_counts(self):
        base = pdf_meta(make_pdf(3, title="t"))["n_objects"]
        plain = pdf_meta(make_pdf(3, title="t", xref_stream=True))
        packed = pdf_meta(make_pdf(3, title="t", xref_stream=True,
                                   objstm=True))
        assert plain["n_objects"] == base + 1  # + the xref stream
        assert packed["n_objects"] == base + 2  # + /ObjStm container

    def test_predictor_row_decode(self):
        """PNG-Up-predicted xref rows reconstruct exactly."""
        a = pdf_meta(make_pdf(7, title="p", xref_stream=True,
                              predictor=False))
        b = pdf_meta(make_pdf(7, title="p", xref_stream=True,
                              predictor=True))
        assert a == b

    def test_index_subsections(self):
        """The incremental update writes a second xref stream with
        an explicit /Index — both sections must merge newest-first."""
        m = pdf_meta(make_pdf(2, title="old",
                              incremental_retitle="new",
                              xref_stream=True, objstm=True))
        assert m["title"] == "new" and m["n_updates"] == 1

    def test_truncated_stream_rejected(self):
        p = make_pdf(3, xref_stream=True)
        with pytest.raises(ValueError):
            pdf_meta(p[: len(p) // 2] + p[p.rfind(b"startxref"):])

    def test_flate_bomb_bounded(self):
        """A crafted /Length lying about a huge inflate must hit the
        absolute budget, not allocate unboundedly."""
        import zlib as _z

        from bergloom_spark.operators.pdfmeta import (
            _MAX_STREAM_INFLATE,
        )

        comp = _z.compress(b"\x00" * (_MAX_STREAM_INFLATE + 1024))
        body = (
            b"1 0 obj\n<< /Type /XRef /Size 2 /W [1 4 2] "
            b"/Root 1 0 R /Filter /FlateDecode /Length %d >>\n"
            b"stream\n" % len(comp) + comp + b"\nendstream\nendobj\n"
        )
        pdf = b"%PDF-1.5\n" + body + b"startxref\n9\n%%EOF\n"
        with pytest.raises(ValueError):
            pdf_meta(pdf)

    def test_hybrid_xrefstm(self):
        """A classic trailer carrying /XRefStm (hybrid-reference
        file, §7.5.8.4) consults the supplementary stream for
        entries the classic table lacks."""
        # build: modern file, then graft a classic table that lists
        # ONLY the xref-stream object, with /XRefStm pointing at the
        # real stream — pdf_meta must still resolve the catalog.
        p = make_pdf(2, title="h", xref_stream=True, objstm=True)
        ref = pdf_meta(p)
        sx = p.rfind(b"startxref")
        stream_off = int(p[sx:].split(b"\n")[1])
        out = bytearray(p)
        classic_off = len(out)
        # a real hybrid trailer duplicates /Size /Root /Info for
        # legacy readers and adds /XRefStm for conforming ones
        # (/Info is object 7 here: catalog 1, pages 2, 2×(content,
        # page) = 3-6, info 7)
        out += (
            b"xref\n0 1\n0000000000 65535 f \n"
            b"trailer\n<< /Size %d /Root 1 0 R /Info 7 0 R "
            b"/XRefStm %d >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (ref["n_objects"] + 1, stream_off, classic_off)
        )
        m = pdf_meta(bytes(out))
        assert m["n_pages"] == 2 and m["title"] == "h"
        assert m["n_objects"] == ref["n_objects"]


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


class TestHostileStreams:
    """r11 self-review hardening: the corpus contract (bytes → dict
    or ValueError, bounded work) on the modern-layout paths."""

    def test_xref_row_bomb_bounded(self):
        """/W [0 1 0] /Size 2^25 with highly-compressible data must
        be rejected by the raw-payload-proportional row cap, never
        loop 33M times."""
        import time
        import zlib as _z

        comp = _z.compress(b"\x00" * (1 << 25))
        body = (
            b"1 0 obj\n<< /Type /XRef /Size 33554432 /W [0 1 0] "
            b"/Root 1 0 R /Filter /FlateDecode /Length %d >>\n"
            b"stream\n" % len(comp) + comp + b"\nendstream\nendobj\n"
        )
        pdf = b"%PDF-1.5\n" + body + b"startxref\n9\n%%EOF\n"
        t0 = time.perf_counter()
        with pytest.raises(ValueError, match="rows"):
            pdf_meta(pdf)
        assert time.perf_counter() - t0 < 2.0

    def test_hostile_decodeparms_raise_valueerror(self):
        """Non-integer Predictor/Columns must raise ValueError (a
        TypeError would escape triage's error-as-data wrapper)."""
        import zlib as _z

        for parms in (b"<< /Predictor (x) >>",
                      b"<< /Predictor 12 /Columns 2 0 R >>",
                      b"<< /Predictor 12 /Columns true >>"):
            comp = _z.compress(b"\x00" * 24)
            body = (
                b"1 0 obj\n<< /Type /XRef /Size 2 /W [1 4 2] "
                b"/Root 1 0 R /Filter /FlateDecode /DecodeParms "
                + parms + b" /Length %d >>\nstream\n" % len(comp)
                + comp + b"\nendstream\nendobj\n"
            )
            pdf = b"%PDF-1.5\n" + body + b"startxref\n9\n%%EOF\n"
            with pytest.raises(ValueError):
                pdf_meta(pdf)
        # triage agrees: error row, not a crash
        from bergloom_spark.operators.triage import corpus_triage

        t = corpus_triage(pdf)
        assert t["error"] is not None

    def test_objstm_indirect_length_resolves(self):
        """Real writers backpatch an /ObjStm's /Length as a separate
        indirect object — pdf_meta must resolve it, not error-row
        the file."""
        p = make_pdf(3, title="t", xref_stream=True, objstm=True)
        # locate the ObjStm object and swap its direct /Length N for
        # an indirect ref to a NEW object appended at the end, then
        # extend the xref stream... simpler: rewrite the ObjStm dict
        # in place with same byte length ('/Length 123' -> ref of
        # equal text width) is brittle — instead assert on a
        # hand-built minimal file.
        import re as _re
        import zlib as _z

        m = pdf_meta(p)  # sanity: the base file parses
        assert m["n_pages"] == 3

        # minimal hand-built: catalog+pages in an ObjStm whose
        # /Length is indirect (object 4)
        body1 = b"<< /Type /Catalog /Pages 2 0 R >>"
        body2 = b"<< /Type /Pages /Kids [] /Count 0 >>"
        hdr = b"1 0 2 %d\n" % (len(body1) + 1)
        data = _z.compress(hdr + body1 + b" " + body2)
        out = bytearray(b"%PDF-1.5\n")
        objstm_off = len(out)
        out += (
            b"3 0 obj\n<< /Type /ObjStm /N 2 /First %d "
            b"/Filter /FlateDecode /Length 4 0 R >>\nstream\n"
            % len(hdr)
        ) + data + b"\nendstream\nendobj\n"
        len_off = len(out)
        out += b"4 0 obj\n%d\nendobj\n" % len(data)
        # xref stream (object 5): 1,2 -> objstm slots; 3,4 direct
        rows = bytearray()
        rows += b"\x00" + (0).to_bytes(4, "big") + b"\xff\xff"
        rows += b"\x02" + (3).to_bytes(4, "big") + (0).to_bytes(2, "big")
        rows += b"\x02" + (3).to_bytes(4, "big") + (1).to_bytes(2, "big")
        rows += b"\x01" + objstm_off.to_bytes(4, "big") + bytes(2)
        rows += b"\x01" + len_off.to_bytes(4, "big") + bytes(2)
        xoff = len(out)
        rows += b"\x01" + xoff.to_bytes(4, "big") + bytes(2)
        comp = _z.compress(bytes(rows))
        out += (
            b"5 0 obj\n<< /Type /XRef /Size 6 /W [1 4 2] "
            b"/Root 1 0 R /Filter /FlateDecode /Length %d >>\n"
            b"stream\n" % len(comp)
        ) + comp + b"\nendstream\nendobj\n"
        out += b"startxref\n%d\n%%%%EOF\n" % xoff
        got = pdf_meta(bytes(out))
        assert got["n_pages"] == 0 and got["n_objects"] == 5

    def test_archive_entries_pk_named_tar(self, spark):
        """archive_entries shares the full-signature ZIP sniff (the
        third dispatch site the ADVICE repro could crash)."""
        from bergloom_spark.operators.archive import (
            archive_entries,
            make_tar,
        )

        t = make_tar([("PKG/readme.txt", b"hello")])
        df = spark.createDataFrame(
            [(1, t)], "doc_id long, payload binary"
        )
        rows = archive_entries(df).collect()
        assert len(rows) == 1
        assert rows[0].container == "tar"
        assert rows[0].name == "PKG/readme.txt"


def test_fuzz_find_decodeparms_typeerror_exact_bytes():
    """r11 fuzz campaign find (4.9M-payload run): a mutated xref
    stream whose /DecodeParms /Predictor became the STRING '2'
    raised TypeError through the kernel — the exact bytes, pinned.
    Must raise ValueError (the corpus contract) forever."""
    import os

    path = os.path.join(
        os.path.dirname(__file__), "fixtures",
        "fuzz_pdf_decodeparms_typeerror.bin",
    )
    with open(path, "rb") as fh:
        d = fh.read()
    with pytest.raises(ValueError):
        pdf_meta(d)
