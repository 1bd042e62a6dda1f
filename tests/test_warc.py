"""WARC ingestion kernel + Spark-seam tests (round 10).

The writers are the fixtures: a header-walk bug, a Content-Length
bug, or a gzip-member bug breaks exact field comparisons here and
the r11 oracle replay later.
"""

from __future__ import annotations

import zlib

import pytest

from bergloom_spark.operators.warc import (
    make_http_response,
    make_warc,
    make_warc_record,
    parse_warc,
    split_gzip_members,
    warc_records,
)


def _pages(n=5):
    return [
        {
            "url": f"https://example.org/page/{i}",
            "text": f"document body {i} " + "x" * (i * 7),
            "status": (200, 200, 404, 301, 200)[i % 5],
            "content_type": ("text/html", "text/plain")[i % 2],
        }
        for i in range(n)
    ]


def test_roundtrip_plain():
    pages = _pages()
    recs = parse_warc(make_warc(pages))
    assert recs[0]["record_type"] == "warcinfo"
    assert recs[0]["content_type"] == "application/warc-fields"
    body_recs = recs[1:]
    assert len(body_recs) == len(pages)
    for page, r in zip(pages, body_recs):
        assert r["record_type"] == "response"
        assert r["target_uri"] == page["url"]
        assert r["http_status"] == page["status"]
        assert r["http_content_type"] == page["content_type"]
        assert r["payload_text"] == page["text"]
        assert r["payload_len"] == len(page["text"].encode())
        assert r["warc_date"] == "2025-01-01T00:00:00Z"
        assert r["record_id"].startswith("<urn:uuid:")
        # content_length covers the full HTTP message, not the body
        assert r["content_length"] > r["payload_len"]


def test_roundtrip_gzip_records_identical():
    pages = _pages(7)
    plain = parse_warc(make_warc(pages))
    gz = parse_warc(make_warc(pages, gzip_records=True))
    # offsets differ by construction (post-decompression they match
    # the plain layout), everything else must be identical
    assert gz == plain


def test_split_gzip_members_counts_records():
    pages = _pages(4)
    payload = make_warc(pages, gzip_records=True)
    members = split_gzip_members(payload)
    assert len(members) == len(pages) + 1  # + warcinfo
    assert b"".join(members) == make_warc(pages)


def test_conversion_records_wet_shape():
    pages = [
        {"url": "https://a.example/x", "text": "extracted text",
         "conversion": True}
    ]
    recs = parse_warc(make_warc(pages, warcinfo=False))
    assert len(recs) == 1
    r = recs[0]
    assert r["record_type"] == "conversion"
    assert r["http_status"] is None
    assert r["payload_text"] == "extracted text"
    assert r["content_length"] == r["payload_len"]


def test_binary_body_yields_none_text():
    http = make_http_response(
        b"\xff\xfe\x00binary", content_type="image/png"
    )
    rec = make_warc_record(
        "response", http, record_id="<urn:uuid:1>",
        content_type="application/http; msgtype=response",
    )
    r = parse_warc(rec)[0]
    assert r["payload_text"] is None
    assert r["payload_len"] == 9
    assert r["http_content_type"] == "image/png"


def test_max_text_bytes_truncates_after_decode():
    pages = [{"url": "u", "text": "abécdef", "conversion": True}]
    recs = parse_warc(make_warc(pages, warcinfo=False),
                      max_text_bytes=4)
    # truncation happens on the decoded string, so the multi-byte
    # char cannot flip the row to None
    assert recs[0]["payload_text"] == "abéc"


def test_header_folding_continuation():
    rec = make_warc_record(
        "metadata", b"x", record_id="<urn:uuid:2>",
        extra_headers=[("WARC-Concurrent-To", "<urn:uuid:3>")],
    )
    folded = rec.replace(
        b"WARC-Concurrent-To: <urn:uuid:3>",
        b"WARC-Concurrent-To: <urn:\r\n uuid:3>",
    )
    r = parse_warc(folded)[0]
    assert r["record_type"] == "metadata"


def test_missing_mandatory_field_rejected():
    rec = make_warc_record("response", b"x", record_id="<urn:uuid:4>")
    broken = rec.replace(b"WARC-Date: 2025-01-01T00:00:00Z\r\n", b"")
    with pytest.raises(ValueError, match="mandatory"):
        parse_warc(broken)


def test_bad_separator_rejected():
    rec = make_warc_record("resource", b"abc", record_id="<urn:uuid:5>")
    with pytest.raises(ValueError, match="separator"):
        parse_warc(rec[:-1])


def test_content_length_past_end_rejected():
    rec = make_warc_record("resource", b"abc", record_id="<urn:uuid:6>")
    broken = rec.replace(b"Content-Length: 3", b"Content-Length: 9999")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(broken)


def test_unsupported_version_rejected():
    rec = make_warc_record("resource", b"abc", record_id="<urn:uuid:7>")
    with pytest.raises(ValueError, match="version"):
        parse_warc(rec.replace(b"WARC/1.1", b"WARC/9.9"))


def test_http_block_without_terminator_rejected():
    rec = make_warc_record(
        "response", b"HTTP/1.1 200 OK\r\nX: 1",
        record_id="<urn:uuid:8>",
        content_type="application/http; msgtype=response",
    )
    with pytest.raises(ValueError, match="terminator"):
        parse_warc(rec)


def test_gzip_budget_rejects_bomb():
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    bomb = co.compress(b"\x00" * (1 << 20)) + co.flush()
    assert len(bomb) < 4096
    with pytest.raises(ValueError, match="budget"):
        split_gzip_members(bomb, max_output=1 << 16)


def test_gzip_garbage_between_members_rejected():
    payload = make_warc(_pages(2), gzip_records=True)
    with pytest.raises(ValueError, match="garbage|corrupt"):
        split_gzip_members(payload + b"JUNK")


def test_truncated_gzip_member_rejected():
    payload = make_warc(_pages(2), gzip_records=True)
    with pytest.raises(ValueError, match="truncated|corrupt"):
        split_gzip_members(payload[:-5])


def test_empty_payload_yields_no_records():
    assert parse_warc(b"") == []


def test_warc_records_spark_seam(spark, sf_dir):
    """Executor-side drive on real testdata doc_ids: binary payloads
    cross the Arrow seam, the explosion yields exact recipe fields
    the r11 oracle will replay."""
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").orderBy("doc_id").limit(40).collect()
    ]
    rows = []
    for doc_id in ids:
        i = int(doc_id)
        pages = [
            {
                "url": f"https://host{i % 9}.example/{i}/{j}",
                "text": f"doc {i} rec {j} " + "y" * ((i + j) % 23),
                "status": (200, 404, 200)[j % 3],
            }
            for j in range(1 + i % 3)
        ]
        rows.append(
            (i, make_warc(pages, gzip_records=i % 2 == 1,
                          seed=f"seam:{i}"))
        )
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = warc_records(df.repartition(8)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {int(i) for i in ids}
    for i, recs in by_doc.items():
        recs.sort(key=lambda r: r.rec_index)
        assert recs[0].record_type == "warcinfo"
        body = recs[1:]
        assert len(body) == 1 + i % 3
        for j, r in enumerate(body):
            assert r.target_uri == f"https://host{i % 9}.example/{i}/{j}"
            assert r.http_status == (200, 404, 200)[j % 3]
            assert r.payload_text == (
                f"doc {i} rec {j} " + "y" * ((i + j) % 23)
            )
            assert r.payload_len == len(r.payload_text.encode())


class TestCharsetDecode:
    """Charset-aware page decode (verdict r10 missing #2): legacy-
    charset pages — ~5-15% of a real crawl — must decode via the
    declared charset instead of silently dropping, with the residue
    measurable through (charset, decode_ok)."""

    def _one(self, text, encoding=None, content_type="text/html"):
        page = {"url": "https://e.org/x", "text": text,
                "content_type": content_type}
        if encoding:
            page["encoding"] = encoding
        recs = parse_warc(make_warc([page], seed="cs"))
        return [r for r in recs if r["record_type"] == "response"][0]

    def test_http_charset_param(self):
        r = self._one("Привет мир", "cp1251",
                      "text/html; charset=windows-1251")
        assert (r["payload_text"], r["charset"], r["decode_ok"]) == (
            "Привет мир", "cp1251", True)

    def test_meta_charset_sniff(self):
        html = ("<html><head><meta charset=koi8-r></head>"
                "<body>мир</body></html>")
        r = self._one(html, "koi8_r")
        assert r["charset"] == "koi8-r" and r["decode_ok"]
        assert "мир" in r["payload_text"]

    def test_meta_http_equiv_form(self):
        html = ('<html><head><meta http-equiv="Content-Type" '
                'content="text/html; charset=Shift_JIS"></head>'
                "<body>こんにちは</body></html>")
        r = self._one(html, "shift_jis")
        assert r["charset"] == "shift_jis" and r["decode_ok"]
        assert "こんにちは" in r["payload_text"]

    def test_utf8_wins_over_stale_declaration(self):
        """A valid-UTF-8 body with a stale cp1251 header must NOT be
        mojibaked through the declared codec."""
        r = self._one("Привет utf-8", None,
                      "text/html; charset=windows-1251")
        assert (r["payload_text"], r["charset"]) == (
            "Привет utf-8", "utf-8")

    def test_undeclared_legacy_fails_measurably(self):
        r = self._one("caf\xe9 \xff", "latin-1")
        assert (r["payload_text"], r["charset"], r["decode_ok"]) == (
            None, None, False)

    def test_hostile_transform_codecs_rejected(self):
        """charset=base64/zlib/rot13 are transform codecs, not
        charsets — they must fail closed, never raise or emit
        non-str."""
        body = "x\xff".encode("latin-1")
        for cs in ("base64", "zlib", "rot13", "hex", "bz2"):
            http = make_http_response(
                body, content_type=f"text/html; charset={cs}")
            rec = make_warc_record(
                "response", http, record_id="<urn:uuid:0>",
                target_uri="u",
                content_type="application/http; msgtype=response")
            r = parse_warc(rec)[0]
            assert r["payload_text"] is None and not r["decode_ok"]

    def test_legacy_page_survives_crawl_pipeline(self, spark):
        """End-to-end: a cp1251 page flows through
        crawl_text_pipeline instead of vanishing."""
        from bergloom_spark.operators.crawl import crawl_text_pipeline

        w = make_warc([
            {"url": "https://ru.example/a",
             "text": "<html><body><p>Привет мир</p></body></html>",
             "encoding": "cp1251",
             "content_type": "text/html; charset=windows-1251"},
            {"url": "https://en.example/b",
             "text": "<html><body><p>plain page</p></body></html>"},
        ], seed="cs-pipe")
        df = spark.createDataFrame(
            [(1, w)], "doc_id long, payload binary")
        rows = {r.url: r.text for r in crawl_text_pipeline(df).collect()}
        assert any("Привет мир" in t for t in rows.values()), rows
        assert len(rows) == 2


class TestCharsetDetection:
    """Opt-in legacy-charset sniff for UNDECLARED non-UTF-8 pages
    (round 11): deterministic script-range scoring with a byte-run
    density gate for the single-byte pair. Heuristic, hence
    opt-in — the default pipeline reports honest None."""

    def _detect(self, text, enc):
        from bergloom_spark.operators.warc import detect_legacy_charset

        return detect_legacy_charset(text.encode(enc))

    def test_detects_the_big_five(self):
        cases = [
            ("Привет мир, это кириллический текст без объявления",
             "cp1251"),
            ("これは宣言のない日本語のページですこんにちは世界",
             "shift_jis"),
            ("这是一个没有声明的中文页面你好世界欢迎光临", "gbk"),
            ("선언이 없는 한국어 페이지입니다 안녕하세요", "euc-kr"),
            ("<html><body><p>Le café était délicieux — la journée "
             "s'annonçait déjà très agréable à Orléans</p></body>"
             "</html>", "cp1252"),
            ("<html><body><p>Ещё одна страница на русском языке"
             "</p></body></html>", "cp1251"),
        ]
        for text, enc in cases:
            name, decoded = self._detect(text, enc)
            assert name == enc and decoded == text, (enc, name)

    def test_density_gate_separates_single_byte_pair(self):
        """Accented-Latin bytes are VALID cp1251 — only the
        isolated-vs-run structure tells them apart. Both directions
        must hold."""
        fr = ("Le café était délicieux — la journée s'annonçait "
              "déjà très agréable à Orléans, évidemment")
        ru = "Русский текст состоит из сплошных байтов"
        assert self._detect(fr, "cp1252")[0] == "cp1252"
        assert self._detect(ru, "cp1251")[0] == "cp1251"

    def test_no_evidence_and_binary_stay_none(self):
        from bergloom_spark.operators.warc import detect_legacy_charset

        assert detect_legacy_charset(b"plain ascii only") == (None, None)
        assert detect_legacy_charset(b"caf\xe9 x") == (None, None)  # 1 hi byte
        # deterministic pseudo-binary
        blob = bytes((k * 77 + 13) % 256 for k in range(4096))
        name, _ = detect_legacy_charset(blob)
        # whatever decodes must still fail the script-share floor
        assert name is None

    def test_cjk_cross_decodes_never_confidently_wrong(self):
        """KS X 1001, GB2312, and Shift-JIS overlap at the byte
        level, so text in one decodes strictly under the others —
        the common-character frequency gate must keep each page in
        its OWN codec: a cross-decode yields essentially random
        code points that miss the target language's most frequent
        characters."""
        from bergloom_spark.operators.warc import detect_legacy_charset

        ko = "선언이 없는 한국어 페이지입니다 안녕하세요"
        zh = "这是一个没有声明的中文页面你好世界欢迎光临"
        ja = "これは宣言のない日本語のページですこんにちは世界"
        for text, enc in ((ko, "euc-kr"), (zh, "gbk"),
                          (ja, "shift_jis")):
            name, decoded = detect_legacy_charset(text.encode(enc))
            assert (name, decoded) == (enc, text)
        # structurally-plausible but frequency-free CJK bytes stay
        # an honest None instead of a confident guess
        blob = bytes(
            b for k in range(600)
            for b in (0xB1 + (k * 7) % 60, 0xA1 + (k * 11) % 80)
        )
        name, _ = detect_legacy_charset(blob)
        assert name is None

    def test_parse_warc_opt_in(self):
        w = make_warc(
            [{"url": "https://ru.example/",
              "text": "Привет без объявления",
              "encoding": "cp1251", "content_type": "text/html"}],
            seed="det",
        )
        off = [r for r in parse_warc(w)
               if r["record_type"] == "response"][0]
        on = [r for r in parse_warc(w, detect_charset=True)
              if r["record_type"] == "response"][0]
        assert off["payload_text"] is None and not off["decode_ok"]
        assert on["payload_text"] == "Привет без объявления"
        assert on["charset"] == "cp1251" and on["decode_ok"]

    def test_declared_charset_still_wins_over_detection(self):
        """Detection only runs when NOTHING is declared — a declared
        charset that fails must stay a measurable failure, not get
        second-guessed."""
        w = make_warc(
            [{"url": "https://x.example/",
              "text": "Привет мир кириллица здесь",
              "encoding": "cp1251",
              # declared but WRONG (body is not valid shift_jis...
              # actually cp1251 bytes may decode under shift_jis;
              # the point: charset is declared, so the detector must
              # not override the declared-path verdict)
              "content_type": "text/html; charset=no-such-cs"}],
            seed="det2",
        )
        on = [r for r in parse_warc(w, detect_charset=True)
              if r["record_type"] == "response"][0]
        assert on["charset"] == "no-such-cs" and not on["decode_ok"]


class TestCharsetDetectionHardening:
    """Second self-review pass findings (r11) pinned."""

    def test_window_split_multibyte_still_detects(self):
        """The 64 KiB sample window cutting a double-byte character
        in half must not disqualify the candidate (incremental
        decode buffers the partial char)."""
        from bergloom_spark.operators.warc import detect_legacy_charset

        body = ("这是一个没有声明的中文页面你好世界" * 4000).encode("gbk")
        assert len(body) > 65536
        # both byte parities at the window edge
        assert detect_legacy_charset(body)[0] == "gbk"
        assert detect_legacy_charset(b"x" + body)[0] == "gbk"

    def test_binary_content_type_never_detected(self):
        """A mostly-ASCII application/pdf body with a few isolated
        high bytes must stay an honest None even with detection on —
        the decode_ok residue measures binary share, and detection
        is scoped to text-family payloads."""
        from bergloom_spark.operators.warc import (
            make_http_response,
            make_warc_record,
        )

        pdfish = (b"%PDF-1.4 obj stream " * 50) + bytes(
            [0xE0, 0x20, 0xE5, 0x20, 0xE9, 0x20, 0xE8]
        )
        http = make_http_response(
            pdfish, content_type="application/pdf"
        )
        rec = make_warc_record(
            "response", http, record_id="<urn:uuid:1>",
            target_uri="u",
            content_type="application/http; msgtype=response",
        )
        r = parse_warc(rec, detect_charset=True)[0]
        assert r["payload_text"] is None and not r["decode_ok"]

    def test_corrupt_tail_past_window_is_honest_none(self):
        """Documented all-or-nothing: a >64 KiB body whose TAIL is
        corrupt returns (None, None), never silently truncated
        text."""
        from bergloom_spark.operators.warc import detect_legacy_charset

        body = ("没有声明的中文页面你好 " * 8000).encode("gbk")
        assert len(body) > 65536
        assert detect_legacy_charset(body + b"\x81\x00\x81")[0] is None

    def test_link_graph_and_pipeline_share_detection(self, spark):
        """The two corpus views must agree on which pages exist when
        detection is on (the ONE page-keeping policy)."""
        from bergloom_spark.operators.crawl import (
            crawl_link_graph,
            crawl_text_pipeline,
        )

        w = make_warc([
            {"url": "https://ru.example/a",
             "text": '<html><body><a href="https://out.example/x">'
                     "наружу</a><p>Ещё одна страница на русском "
                     "языке</p></body></html>",
             "encoding": "cp1251", "content_type": "text/html"},
        ], seed="lg-det")
        df = spark.createDataFrame(
            [(1, w)], "doc_id long, payload binary"
        )
        assert crawl_text_pipeline(df).count() == 0
        assert crawl_link_graph(df).count() == 0
        assert crawl_text_pipeline(df, detect_charset=True).count() == 1
        edges = {
            (r.src_site, r.dst_site)
            for r in crawl_link_graph(df, detect_charset=True).collect()
        }
        assert ("ru.example", "out.example") in edges
