"""Regression pins for the five ADVICE r11 findings (round 12).

1. warc.detect_legacy_charset: all-or-nothing must hold for bodies
   <= 64 KiB too — a truncated page returns (None, None), never
   silently-truncated text with decode_ok semantics.
2. html._ANCHOR_INNER_PAT: the tag name must be anchored, so <abbr>,
   <address>, <audio>, <area> never count toward link density.
3. pdfmeta hybrid /XRefStm: stream entries take precedence over the
   classic section's, and a malformed /XRefStm falls back to the
   classic table instead of error-rowing the file.
4. crawl.pages_to_wet: duplicate (url, text) pages get DISTINCT
   WARC-Record-IDs (occurrence-counter salt).
5. pdfmeta xref-stream inflate budget is bounded by the declared
   /W x /Index rows BEFORE inflation, not only after predictor
   removal.
"""

from __future__ import annotations

import pytest


class TestCharsetAllOrNothingSmallBody:
    def test_truncated_small_gbk_body_is_none(self):
        from bergloom_spark.operators.warc import detect_legacy_charset

        body = "这是一个没有声明的中文页面你好世界欢迎光临".encode("gbk")
        assert len(body) <= 65536
        full = detect_legacy_charset(body)
        assert full[0] == "gbk"
        # cut mid-character: the incremental scorer buffers the
        # partial trailing char, but the returned verdict must be
        # the strict full-body decode → (None, None)
        truncated = detect_legacy_charset(body[:-1])
        assert truncated == (None, None)

    def test_truncated_small_cp1251_like_multibyte(self):
        from bergloom_spark.operators.warc import detect_legacy_charset

        body = ("これは宣言のない日本語のページですこんにちは世界"
                * 3).encode("shift_jis")
        assert len(body) <= 65536
        assert detect_legacy_charset(body)[0] == "shift_jis"
        assert detect_legacy_charset(body[:-1]) == (None, None)

    def test_intact_small_body_unchanged(self):
        from bergloom_spark.operators.warc import detect_legacy_charset

        text = "Привет мир, это кириллический текст без объявления"
        name, decoded = detect_legacy_charset(text.encode("cp1251"))
        assert (name, decoded) == ("cp1251", text)


class TestAnchorTagNameAnchored:
    PAGE = (
        "<html><body><p>The <abbr>W3C</abbr> publishes long real "
        "paragraphs of genuine article prose that must never be "
        "counted as anchor text by the link-density classifier, "
        'with one real <a href="/l">link</a> inline.</p>'
        "</body></html>"
    )

    def test_abbr_does_not_swallow_prose(self, spark):
        from bergloom_spark.functions.html import extract_main_content

        df = spark.createDataFrame([(self.PAGE,)], "h string")
        out = df.select(
            extract_main_content("h").alias("mc")
        ).collect()[0].mc
        # pre-fix: everything between <abbr> and </a> counted as
        # anchor text → link density ~1000 → block dropped entirely
        assert "genuine article prose" in out

    def test_twin_parity_on_a_prefixed_tags(self, spark):
        import duckdb

        from bergloom_spark.functions.html import (
            extract_main_content,
            extract_main_content_sql,
        )

        pages = [
            self.PAGE,
            "<p>An <address>1 Main St</address> sits inside this "
            "long enough paragraph that has no real links at "
            "all.</p>",
            '<p><a href="/x">pure nav link one</a> '
            '<a href="/y">pure nav link two</a></p>',
            # a REAL mostly-anchor block must still be dropped
            '<p><a class="x">only anchor text here nothing else '
            "present</a></p>",
        ]
        df = spark.createDataFrame([(p,) for p in pages], "h string")
        got = [
            r.mc
            for r in df.select(
                extract_main_content("h").alias("mc")
            ).collect()
        ]
        for page, spark_out in zip(pages, got):
            esc = page.replace("'", "''")
            duck_out = duckdb.sql(
                "SELECT "
                + extract_main_content_sql(chr(39) + esc + chr(39))
            ).fetchone()[0]
            assert spark_out == duck_out, page[:60]
        assert "pure nav link" not in got[2]
        assert got[3] == ""


class TestHybridXRefStmPrecedence:
    def _hybrid(self, stale_offset_for=None, corrupt_stream=False):
        """Modern file + grafted classic trailer carrying /XRefStm.
        Optionally make the classic table carry a STALE offset for
        one object (the stream's entry must win), or corrupt the
        stream (classic alone must suffice)."""
        from bergloom_spark.operators.pdfmeta import make_pdf, pdf_meta

        p = make_pdf(2, title="h", xref_stream=True)
        ref = pdf_meta(p)
        sx = p.rfind(b"startxref")
        stream_off = int(p[sx:].split(b"\n")[1])
        out = bytearray(p)
        classic_off = len(out)
        # classic section: object 0 free; optionally a bogus entry
        # for object 1 (the catalog) pointing at object 2's body —
        # a conforming hybrid reader consults the stream FIRST, so
        # the stale classic offset must be shadowed
        entries = b"0000000000 65535 f \n"
        n_sub = 1
        extra = b""
        if stale_offset_for is not None:
            bogus = p.find(b"2 0 obj")
            extra = b"%010d 00000 n \n" % bogus
            n_sub = 2
        xstm = stream_off
        if corrupt_stream:
            xstm = len(p) - 4  # not an xref stream → parse error
        out += (
            b"xref\n0 1\n" + entries
            + (b"1 1\n" + extra if extra else b"")
            + b"trailer\n<< /Size %d /Root 1 0 R "
            b"/XRefStm %d >>\nstartxref\n%d\n%%%%EOF\n"
            % (ref["n_objects"] + 1, xstm, classic_off)
        )
        return bytes(out), ref, n_sub

    def test_stream_entries_shadow_stale_classic(self):
        from bergloom_spark.operators.pdfmeta import pdf_meta

        blob, ref, _ = self._hybrid(stale_offset_for=1)
        # were the STALE classic offset used, object 1 would resolve
        # to object 2's body and pdf_meta would raise "/Root does
        # not resolve to a /Catalog" — resolving proves the stream
        # entry shadowed it (the grafted trailer has no /Info, so
        # title is None by construction)
        m = pdf_meta(blob)
        assert m["n_pages"] == 2

    def test_malformed_xrefstm_falls_back_to_classic(self):
        """§7.5.8.4: the classic table of the ORIGINAL file is not
        reachable from the grafted trailer alone here, so build the
        fallback case from a fully classic file instead: a classic
        trailer whose /XRefStm points at garbage must not error-row
        a file the classic chain fully describes."""
        from bergloom_spark.operators.pdfmeta import make_pdf, pdf_meta

        p = make_pdf(3, title="c")  # fully classic
        # append /XRefStm pointing at a non-stream offset
        trailer_at = p.rfind(b"trailer")
        dict_at = p.index(b"<<", trailer_at)
        blob = (p[: dict_at + 2]
                + b" /XRefStm 10 " + p[dict_at + 2:])
        m = pdf_meta(blob)
        assert m["n_pages"] == 3 and m["title"] == "c"


class TestWetRecordIdUniqueness:
    def test_duplicate_url_text_pages_get_distinct_ids(self, spark):
        from bergloom_spark.operators.crawl import pages_to_wet
        from bergloom_spark.operators.warc import parse_warc

        rows = [("https://dup.example/p", "identical body text")] * 3
        rows.append(("https://other.example/q", "other body"))
        # duplicates deliberately SPREAD across partitions (review
        # r12: a per-partition counter passed the coalesce(1) version
        # of this test while still colliding across partitions)
        df = spark.createDataFrame(
            rows, "url string, text string"
        ).repartition(4)
        payloads = [r.payload for r in pages_to_wet(df).collect()]
        ids = [
            rec["record_id"]
            for pay in payloads
            for rec in parse_warc(pay)
            if rec["record_type"] == "conversion"
        ]
        assert len(ids) == 4
        assert len(set(ids)) == 4, ids

    def test_first_occurrence_id_partitioning_independent(self, spark):
        from bergloom_spark.operators.crawl import pages_to_wet
        from bergloom_spark.operators.warc import parse_warc

        rows = [
            ("https://a.example/1", "alpha body"),
            ("https://b.example/2", "beta body"),
            ("https://c.example/3", "gamma body"),
        ]

        def ids_of(df):
            out = {}
            for r in pages_to_wet(df).collect():
                for rec in parse_warc(r.payload):
                    if rec["record_type"] == "conversion":
                        out[rec["target_uri"]] = rec["record_id"]
            return out

        one = ids_of(
            spark.createDataFrame(
                rows, "url string, text string").coalesce(1))
        three = ids_of(
            spark.createDataFrame(
                rows, "url string, text string").repartition(3))
        assert one == three


class TestXrefInflateBudgetPreBound:
    def test_oversized_inflate_for_tiny_index_rejected(self):
        """A 2-row xref stream that inflates to megabytes must be
        rejected at the row-derived budget (n_rows*(stride+2)+1024),
        long before the absolute 32 MiB budget or the predictor
        loop."""
        import zlib as _z

        from bergloom_spark.operators.pdfmeta import pdf_meta

        comp = _z.compress(b"\x00" * (4 << 20))  # 4 MiB of zeros
        body = (
            b"1 0 obj\n<< /Type /XRef /Size 2 /W [1 4 2] "
            b"/Index [0 2] /Root 1 0 R /Filter /FlateDecode "
            b"/Length %d >>\nstream\n" % len(comp)
            + comp + b"\nendstream\nendobj\n"
        )
        pdf = b"%PDF-1.5\n" + body + b"startxref\n9\n%%EOF\n"
        with pytest.raises(ValueError, match="budget"):
            pdf_meta(pdf)

    def test_legit_modern_files_still_parse(self):
        from bergloom_spark.operators.pdfmeta import make_pdf, pdf_meta

        for pred in (False, True):
            m = pdf_meta(make_pdf(
                4, title="ok", xref_stream=True, objstm=True,
                predictor=pred))
            assert m["n_pages"] == 4 and m["title"] == "ok"
