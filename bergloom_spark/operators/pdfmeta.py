"""PDF document-corpus triage (header + classic xref walk) — PDFs
are the dominant *document* format of any real scraped corpus after
HTML, and a 100 TB ingest needs page counts, encryption flags, and
version/producer fields BEFORE committing a payload to expensive
text extraction.

Spec source: the public PDF 1.7 spec (ISO 32000-1) — header line
``%PDF-M.N``, body of ``n g obj … endobj`` indirect objects, classic
cross-reference table (``xref`` keyword, subsections of 20-byte
entries), ``trailer`` dictionary (/Size /Root /Info /Encrypt /Prev),
``startxref`` offset, ``%%EOF``. Incremental updates chain via
/Prev; the catalog's /Pages tree carries the authoritative /Count.

Honest gating: PDF 1.5+ cross-reference *streams* (compressed xref)
and object streams need a Flate+predictor decoder pipeline that this
header-only triage deliberately does not run — they raise a specific
ValueError rather than a wrong answer, same stance as the lossy-VP8
pixel gate in ``multimodal.py``.

The corpus contract holds: bytes → dict or ValueError, every cursor
strictly advances, token/object walks carry absolute caps so no
crafted payload can hang the kernel.
"""

from __future__ import annotations

import re

__all__ = ["make_pdf", "pdf_meta"]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_MAX_TOKENS = 200_000
_MAX_XREF_SECTIONS = 64


class _Ref:
    """An indirect reference ``n g R``."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):  # pragma: no cover — debug aid
        return f"{self.num} {self.gen} R"


class _Cursor:
    """Minimal PDF tokenizer over ``bytes`` — just enough of ISO
    32000-1 §7.2-7.3 for trailer/catalog/pages dictionaries: names
    (with #xx escapes), integers/reals, literal and hex strings,
    arrays, dictionaries, booleans, null, and indirect references."""

    def __init__(self, d: bytes, pos: int):
        self.d, self.pos = d, pos
        self.budget = _MAX_TOKENS

    def _skip_ws(self):
        d, n = self.d, len(self.d)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to end of line
                nl = d.find(b"\n", self.pos)
                self.pos = n if nl < 0 else nl + 1
            else:
                return

    def parse_value(self):
        self.budget -= 1
        if self.budget <= 0:
            raise ValueError("PDF value exceeds the token budget")
        self._skip_ws()
        d, pos = self.d, self.pos
        if pos >= len(d):
            raise ValueError("unexpected end of PDF data")
        c = d[pos]
        if d[pos : pos + 2] == b"<<":
            return self._parse_dict()
        if c == 0x3C:  # hex string
            end = d.find(b">", pos + 1)
            if end < 0:
                raise ValueError("unterminated hex string")
            hx = bytes(
                ch for ch in d[pos + 1 : end] if ch not in _WS
            )
            if len(hx) % 2:
                hx += b"0"
            try:
                out = bytes.fromhex(hx.decode("ascii"))
            except ValueError as exc:
                raise ValueError(f"bad hex string: {exc}") from exc
            self.pos = end + 1
            return out
        if c == 0x28:  # literal string, balanced parens + escapes
            return self._parse_literal_string()
        if c == 0x2F:  # name
            return self._parse_name()
        if c == 0x5B:  # array
            self.pos += 1
            out = []
            while True:
                self._skip_ws()
                if self.pos >= len(d):
                    raise ValueError("unterminated array")
                if d[self.pos] == 0x5D:
                    self.pos += 1
                    return out
                out.append(self.parse_value())
        for kw, val in ((b"true", True), (b"false", False),
                        (b"null", None)):
            if d[pos : pos + len(kw)] == kw:
                self.pos = pos + len(kw)
                return val
        m = re.match(rb"[+-]?(\d+\.\d*|\.\d+|\d+)", d[pos : pos + 64])
        if m:
            tok = m.group(0)
            self.pos = pos + len(tok)
            if b"." in tok:
                return float(tok)
            num = int(tok)
            # indirect reference lookahead: INT INT R
            save = self.pos
            self._skip_ws()
            m2 = re.match(rb"(\d+)", d[self.pos : self.pos + 20])
            if m2:
                p2 = self.pos + len(m2.group(0))
                q = _Cursor(d, p2)
                q._skip_ws()
                if d[q.pos : q.pos + 1] == b"R" and (
                    q.pos + 1 == len(d)
                    or d[q.pos + 1] in _WS + _DELIM
                ):
                    self.pos = q.pos + 1
                    return _Ref(num, int(m2.group(0)))
            self.pos = save
            return num
        raise ValueError(
            f"unparseable PDF token at {pos}: {d[pos:pos+16]!r}"
        )

    def _parse_dict(self) -> dict:
        d = self.d
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if d[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            if self.pos >= len(d):
                raise ValueError("unterminated dictionary")
            if d[self.pos] != 0x2F:
                raise ValueError(
                    f"dictionary key at {self.pos} is not a name"
                )
            key = self._parse_name()
            out[key] = self.parse_value()

    def _parse_name(self) -> str:
        d = self.d
        pos = self.pos + 1
        start = pos
        while pos < len(d) and d[pos] not in _WS + _DELIM:
            pos += 1
        raw = d[start:pos]
        self.pos = pos
        # #xx escapes (ISO 32000-1 §7.3.5)
        if b"#" in raw:
            out, i = bytearray(), 0
            while i < len(raw):
                if raw[i : i + 1] == b"#" and i + 3 <= len(raw):
                    try:
                        out.append(int(raw[i + 1 : i + 3], 16))
                        i += 3
                        continue
                    except ValueError:
                        pass
                out.append(raw[i])
                i += 1
            raw = bytes(out)
        return raw.decode("latin-1")

    def _parse_literal_string(self) -> bytes:
        d = self.d
        pos = self.pos + 1
        depth, out = 1, bytearray()
        esc = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
               0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
        while pos < len(d):
            c = d[pos]
            if c == 0x5C:  # backslash
                if pos + 1 >= len(d):
                    raise ValueError("dangling string escape")
                n = d[pos + 1]
                if n in esc:
                    out.append(esc[n])
                    pos += 2
                elif 0x30 <= n <= 0x37:  # octal, 1-3 digits
                    j = pos + 1
                    val = 0
                    while j < len(d) and j < pos + 4 and (
                        0x30 <= d[j] <= 0x37
                    ):
                        val = val * 8 + (d[j] - 0x30)
                        j += 1
                    out.append(val & 0xFF)
                    pos = j
                elif n == 0x0A:  # line continuation
                    pos += 2
                else:
                    out.append(n)
                    pos += 2
            elif c == 0x28:
                depth += 1
                out.append(c)
                pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = pos + 1
                    return bytes(out)
                out.append(c)
                pos += 1
            else:
                out.append(c)
                pos += 1
        raise ValueError("unterminated literal string")


def _object_body(d: bytes, off: int, want_num: int) -> _Cursor:
    """Cursor positioned at the value of indirect object
    ``want_num`` whose header starts at byte ``off``."""
    m = re.match(rb"[\x00\t\n\x0c\r ]*(\d+)\s+(\d+)\s+obj\b",
                 d[off : off + 64])
    if not m:
        raise ValueError(
            f"no indirect object at xref offset {off}"
        )
    if int(m.group(1)) != want_num:
        raise ValueError(
            f"xref points object {want_num} at an object numbered "
            f"{int(m.group(1))}"
        )
    return _Cursor(d, off + m.end())


def _parse_xref_table(d: bytes, off: int):
    """Classic xref section at ``off`` → (offsets dict, trailer
    dict). Rejects xref streams explicitly."""
    m = re.match(rb"[\x00\t\n\x0c\r ]*xref\b", d[off : off + 32])
    if not m:
        if re.match(rb"[\x00\t\n\x0c\r ]*\d+\s+\d+\s+obj\b",
                    d[off : off + 64]):
            raise ValueError(
                "cross-reference stream (PDF 1.5 compressed xref) "
                "unsupported by this header-only triage"
            )
        raise ValueError(f"no xref table at offset {off}")
    cur = _Cursor(d, off + m.end())
    offsets: dict[int, int] = {}
    sections = 0
    while True:
        cur._skip_ws()
        if d[cur.pos : cur.pos + 7] == b"trailer":
            cur.pos += 7
            trailer = cur.parse_value()
            if not isinstance(trailer, dict):
                raise ValueError("PDF trailer is not a dictionary")
            return offsets, trailer
        mm = re.match(rb"(\d+)\s+(\d+)[\x00\t\x0c ]*(\r\n|\r|\n)",
                      d[cur.pos : cur.pos + 40])
        if not mm:
            raise ValueError(
                f"bad xref subsection header at {cur.pos}"
            )
        start, count = int(mm.group(1)), int(mm.group(2))
        sections += 1
        if sections > _MAX_XREF_SECTIONS:
            raise ValueError("too many xref subsections")
        pos = cur.pos + mm.end()
        if pos + 20 * count > len(d):
            raise ValueError("xref subsection exceeds payload")
        for i in range(count):
            entry = d[pos + 20 * i : pos + 20 * (i + 1)]
            em = re.match(rb"(\d{10}) (\d{5}) ([nf])", entry)
            if not em:
                raise ValueError(
                    f"malformed xref entry: {entry!r}"
                )
            if em.group(3) == b"n":
                offsets.setdefault(start + i, int(em.group(1)))
        cur.pos = pos + 20 * count


def _resolve(d: bytes, offsets: dict, ref, depth: int = 0):
    """Follow an indirect reference to its object's parsed value."""
    if not isinstance(ref, _Ref):
        return ref
    if depth > 8:
        raise ValueError("indirect reference chain too deep")
    off = offsets.get(ref.num)
    if off is None:
        raise ValueError(f"object {ref.num} not in the xref table")
    val = _object_body(d, off, ref.num).parse_value()
    if isinstance(val, _Ref):
        return _resolve(d, offsets, val, depth + 1)
    return val


def pdf_meta(payload: bytes) -> dict:
    """Header-only PDF triage: ``{version, n_pages, n_objects,
    encrypted, title, n_updates}``. Walks startxref → classic xref
    table(s, via /Prev for incrementally-updated files) → trailer →
    catalog → pages-root /Count. ``title`` is the /Info /Title
    string (UTF-16BE with BOM or PDFDocEncoding≈latin-1), None when
    absent. Encrypted files report ``encrypted=True`` with
    title=None rather than leaking ciphertext."""
    d = payload
    m = re.match(rb"%PDF-(\d+)\.(\d+)", d)
    if not m:
        raise ValueError("missing %PDF- header")
    version = f"{int(m.group(1))}.{int(m.group(2))}"
    tail = d[-2048:]
    sx = tail.rfind(b"startxref")
    if sx < 0:
        raise ValueError("missing startxref")
    sm = re.match(rb"startxref[\r\n\x00\t\x0c ]+(\d+)", tail[sx:])
    if not sm:
        raise ValueError("malformed startxref offset")
    off = int(sm.group(1))
    if off >= len(d):
        raise ValueError(f"startxref offset {off} exceeds payload")
    offsets: dict[int, int] = {}
    trailer = None
    n_updates = 0
    seen = set()
    while True:
        if off in seen:
            raise ValueError("xref /Prev chain loops")
        seen.add(off)
        if len(seen) > _MAX_XREF_SECTIONS:
            raise ValueError("xref /Prev chain too long")
        sec_offsets, sec_trailer = _parse_xref_table(d, off)
        # earlier sections must not override later updates
        for k, v in sec_offsets.items():
            offsets.setdefault(k, v)
        if trailer is None:
            trailer = sec_trailer
        prev = sec_trailer.get("Prev")
        if prev is None:
            break
        n_updates += 1
        if not isinstance(prev, int) or prev < 0 or prev >= len(d):
            raise ValueError(f"bad /Prev offset {prev!r}")
        off = prev
    size = trailer.get("Size")
    root_ref = trailer.get("Root")
    if not isinstance(size, int) or not isinstance(root_ref, _Ref):
        raise ValueError("trailer lacks integer /Size or /Root ref")
    encrypted = "Encrypt" in trailer
    catalog = _resolve(d, offsets, root_ref)
    if not isinstance(catalog, dict) or catalog.get("Type") != (
        "Catalog"
    ):
        raise ValueError("/Root does not resolve to a /Catalog")
    pages = _resolve(d, offsets, catalog.get("Pages"))
    if not isinstance(pages, dict) or pages.get("Type") != "Pages":
        raise ValueError("/Pages does not resolve to a pages root")
    count = _resolve(d, offsets, pages.get("Count"))
    if not isinstance(count, int) or count < 0:
        raise ValueError(f"bad /Pages /Count: {count!r}")
    title = None
    if not encrypted and isinstance(trailer.get("Info"), _Ref):
        info = _resolve(d, offsets, trailer["Info"])
        if isinstance(info, dict):
            t = info.get("Title")
            if isinstance(t, _Ref):
                t = _resolve(d, offsets, t)
            if isinstance(t, bytes):
                if t[:2] == b"\xfe\xff":
                    title = t[2:].decode("utf-16-be",
                                         errors="strict")
                else:
                    title = t.decode("latin-1")
    return {
        "version": version,
        "n_pages": count,
        "n_objects": size - 1,  # /Size counts the free object 0
        "encrypted": encrypted,
        "title": title,
        "n_updates": n_updates,
    }


def make_pdf(
    n_pages: int,
    title: str | None = None,
    version: str = "1.7",
    encrypted: bool = False,
    incremental_retitle: str | None = None,
) -> bytes:
    """A spec-layout classic-xref PDF for tests/oracles: catalog,
    pages root with ``n_pages`` kids, one content stream per page,
    optional /Info /Title, optional stub /Encrypt dict, and — when
    ``incremental_retitle`` is set — a second incremental-update
    section re-pointing /Info the way real editors append changes.
    Byte-reproducible (no timestamps)."""
    if n_pages < 0:
        raise ValueError("n_pages must be >= 0")
    objects: list[bytes] = []  # bodies; object n = index + 1

    def add(body: str | bytes) -> int:
        if isinstance(body, str):
            body = body.encode("latin-1")
        objects.append(body)
        return len(objects)

    cat = add("<< /Type /Catalog /Pages 2 0 R >>")
    assert cat == 1
    pages_num = add("PLACEHOLDER")
    kid_nums = []
    for p in range(n_pages):
        content = f"BT /F1 12 Tf 72 720 Td (page {p + 1}) Tj ET"
        cnum = add(
            f"<< /Length {len(content)} >>\nstream\n{content}"
            "\nendstream"
        )
        kid_nums.append(
            add(
                "<< /Type /Page /Parent 2 0 R "
                "/MediaBox [0 0 612 792] "
                f"/Contents {cnum} 0 R >>"
            )
        )
    kids = " ".join(f"{k} 0 R" for k in kid_nums)
    objects[pages_num - 1] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
    ).encode()
    extra = []
    info_num = None
    if title is not None:
        raw = (
            title if isinstance(title, bytes)
            else title.encode("latin-1")
        )
        esc = raw.replace(b"\\", rb"\\").replace(b"(", rb"\(")
        esc = esc.replace(b")", rb"\)")
        info_num = add(b"<< /Title (" + esc + b") >>")
    enc_num = None
    if encrypted:
        enc_num = add(
            "<< /Filter /Standard /V 1 /R 2 /P -44 >>"
        )
        extra.append(f"/Encrypt {enc_num} 0 R")
    header = f"%PDF-{version}\n".encode() + b"%\xe2\xe3\xcf\xd3\n"
    out = bytearray(header)
    xref_offsets = []
    for i, body in enumerate(objects):
        xref_offsets.append(len(out))
        out += f"{i + 1} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    n = len(objects) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for o in xref_offsets:
        out += b"%010d 00000 n \n" % o
    trailer = f"<< /Size {n} /Root 1 0 R"
    if info_num is not None:
        trailer += f" /Info {info_num} 0 R"
    trailer += "".join(" " + e for e in extra) + " >>"
    out += b"trailer\n" + trailer.encode() + b"\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    if incremental_retitle is not None:
        # incremental update: append a replacement /Info object and
        # a second xref section chaining back via /Prev
        esc = incremental_retitle.replace("\\", r"\\")
        esc = esc.replace("(", r"\(").replace(")", r"\)")
        new_num = len(objects) + 1
        obj_off = len(out)
        out += f"{new_num} 0 obj\n<< /Title ({esc}) >>\nendobj\n".encode()
        x2 = len(out)
        out += f"xref\n{new_num} 1\n".encode()
        out += b"%010d 00000 n \n" % obj_off
        # an incremental trailer must repeat /Encrypt — a reader
        # only consults the newest trailer for it
        enc = f" /Encrypt {enc_num} 0 R" if enc_num else ""
        out += (
            f"trailer\n<< /Size {new_num + 1} /Root 1 0 R "
            f"/Info {new_num} 0 R{enc} /Prev {xref_pos} >>\n"
        ).encode()
        out += b"startxref\n%d\n%%%%EOF\n" % x2
    return bytes(out)
