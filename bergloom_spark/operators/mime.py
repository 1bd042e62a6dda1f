"""Email / MIME corpus ingestion (RFC 5322 + RFC 2045-2047) — the
mbox/EML family: mailing-list archives and enterprise mail dumps are
a classic LLM pretraining text source, and their on-disk shape is a
header block with folding, encoded-word subjects, and a MIME part
tree whose leaves carry quoted-printable or base64 transfer
encodings.

Spec-derived clean-room parser (the stdlib ``email`` package serves
as an *interop oracle in tests only* — same stance as libwebp for
the WebP encoder): the corpus contract holds (bytes → dict or
ValueError, cursor strictly advances, absolute part/depth caps), the
decode is deterministic, and the Spark seam is a map-only
Arrow-batched explosion of mbox payloads into one row per message.

Implemented: header folding + case-insensitive names; RFC 2047
encoded-words (B and Q, utf-8/latin-1/ascii charsets) in Subject /
From / To; multipart/* recursion with boundary walk (depth ≤ 8,
parts ≤ 1000); Content-Transfer-Encoding 7bit/8bit/binary/
quoted-printable/base64; text/* charset decode; mbox ``From ``
splitting with ``>From`` unstuffing.
"""

from __future__ import annotations

import binascii
import re

from pyspark.sql import DataFrame

__all__ = [
    "decode_encoded_words",
    "parse_eml",
    "parse_mbox",
    "make_eml",
    "make_mbox",
    "mbox_messages",
]

_MAX_PARTS = 1000
_MAX_DEPTH = 8
_CHARSETS = {
    "utf-8": "utf-8", "utf8": "utf-8", "us-ascii": "ascii",
    "ascii": "ascii", "iso-8859-1": "latin-1", "latin-1": "latin-1",
    "latin1": "latin-1", "windows-1252": "cp1252",
    "cp1252": "cp1252",
}


def _charset(name: str) -> str:
    cs = _CHARSETS.get(name.strip().lower().strip('"'))
    if cs is None:
        raise ValueError(f"unsupported charset {name!r}")
    return cs


# ---------------------------------------------------------------------------
# RFC 2047 encoded-words
# ---------------------------------------------------------------------------
_EW = re.compile(
    r"=\?([^?]+)\?([bBqQ])\?([^? ]*)\?="
)


def decode_encoded_words(s: str) -> str:
    """Decode RFC 2047 ``=?charset?B|Q?payload?=`` tokens in a
    header value. Q-encoding: ``_`` → space, ``=XX`` → byte.
    Adjacent encoded words separated only by whitespace concatenate
    without the separator (RFC 2047 §6.2). Malformed payloads raise
    ValueError."""

    def decode_one(m: re.Match) -> str:
        cs = _charset(m.group(1))
        kind = m.group(2).lower()
        payload = m.group(3)
        if kind == "b":
            try:
                raw = binascii.a2b_base64(payload.encode("ascii"),
                                          strict_mode=True)
            except (binascii.Error, UnicodeEncodeError) as exc:
                raise ValueError(
                    f"bad B-encoded word: {exc}"
                ) from exc
        else:
            raw = _decode_q(payload.replace("_", " "))
        try:
            return raw.decode(cs)
        except UnicodeDecodeError as exc:
            raise ValueError(
                f"encoded word not valid {cs}: {exc}"
            ) from exc

    # fold whitespace BETWEEN adjacent encoded words first
    s = re.sub(r"(\?=)[ \t]+(=\?)", r"\1\2", s)
    return _EW.sub(decode_one, s)


def _decode_q(s: str) -> bytes:
    out, i = bytearray(), 0
    while i < len(s):
        c = s[i]
        if c == "=":
            if i + 3 > len(s):
                raise ValueError("dangling Q-encoding escape")
            try:
                out.append(int(s[i + 1 : i + 3], 16))
            except ValueError as exc:
                raise ValueError(
                    f"bad Q-encoding hex {s[i + 1:i + 3]!r}"
                ) from exc
            i += 3
        else:
            out.append(ord(c) & 0xFF)
            i += 1
    return bytes(out)


def _decode_qp(raw: bytes) -> bytes:
    """RFC 2045 quoted-printable body decode: ``=XX`` escapes and
    soft line breaks (``=`` at end of line)."""
    out, i, n = bytearray(), 0, len(raw)
    while i < n:
        c = raw[i]
        if c == 0x3D:  # '='
            if raw[i + 1 : i + 3] == b"\r\n":
                i += 3  # soft break CRLF
            elif raw[i + 1 : i + 2] == b"\n":
                i += 2  # soft break bare LF
            elif i + 3 <= n:
                try:
                    out.append(int(raw[i + 1 : i + 3], 16))
                except ValueError as exc:
                    raise ValueError(
                        f"bad quoted-printable escape at {i}"
                    ) from exc
                i += 3
            else:
                raise ValueError("dangling quoted-printable escape")
        else:
            out.append(c)
            i += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# Header block
# ---------------------------------------------------------------------------
def _parse_headers(d: bytes, pos: int):
    """(ordered [(lower-name, value)], cursor past the blank line).
    Folded lines (leading SP/HT) unfold with a single space."""
    headers: list[tuple[str, str]] = []
    n = len(d)
    while True:
        if pos >= n:
            return headers, pos  # headers to EOF (no body)
        nl = d.find(b"\n", pos)
        if nl < 0:
            line, next_pos = d[pos:n], n
        else:
            line, next_pos = d[pos:nl], nl + 1
        line = line.rstrip(b"\r")
        pos = next_pos
        if not line:
            return headers, pos
        if line[:1] in (b" ", b"\t"):
            if not headers:
                raise ValueError("header continuation before any header")
            name, value = headers[-1]
            headers[-1] = (name, value + " " + line.strip().decode(
                "latin-1"))
            continue
        name, colon, value = line.partition(b":")
        if not colon or not name or b" " in name.strip():
            raise ValueError(f"malformed header line: {line[:60]!r}")
        headers.append(
            (name.strip().decode("latin-1").lower(),
             value.strip().decode("latin-1"))
        )


def _first(headers, name):
    for k, v in headers:
        if k == name:
            return v
    return None


def _content_type(headers):
    """(type/subtype lower, params dict) from Content-Type; defaults
    to text/plain us-ascii per RFC 2045 §5.2."""
    raw = _first(headers, "content-type")
    if raw is None:
        return "text/plain", {"charset": "us-ascii"}
    parts = raw.split(";")
    ctype = parts[0].strip().lower()
    if "/" not in ctype:
        raise ValueError(f"malformed Content-Type {ctype!r}")
    params = {}
    for p in parts[1:]:
        k, eq, v = p.partition("=")
        if eq:
            params[k.strip().lower()] = v.strip().strip('"')
    return ctype, params


def _decode_body(raw: bytes, headers) -> bytes:
    cte = (_first(headers, "content-transfer-encoding") or "7bit")
    cte = cte.strip().lower()
    if cte in ("7bit", "8bit", "binary"):
        return raw
    if cte == "quoted-printable":
        return _decode_qp(raw)
    if cte == "base64":
        compact = re.sub(rb"[\r\n \t]", b"", raw)
        try:
            return binascii.a2b_base64(compact, strict_mode=True)
        except binascii.Error as exc:
            raise ValueError(f"bad base64 body: {exc}") from exc
    raise ValueError(f"unsupported Content-Transfer-Encoding {cte!r}")


def _walk_parts(headers, body: bytes, out: list,
                depth: int) -> None:
    """Depth-first MIME tree walk appending leaf parts as
    (ctype, params, decoded_bytes)."""
    if depth > _MAX_DEPTH:
        raise ValueError("MIME nesting exceeds the depth cap")
    if len(out) >= _MAX_PARTS:
        raise ValueError("MIME tree exceeds the part cap")
    ctype, params = _content_type(headers)
    if not ctype.startswith("multipart/"):
        out.append((ctype, params, _decode_body(body, headers)))
        return
    boundary = params.get("boundary")
    if not boundary:
        raise ValueError("multipart body without a boundary param")
    delim = b"--" + boundary.encode("latin-1")
    # split on CRLF/LF + --boundary; the preamble before the first
    # delimiter and the epilogue after --boundary-- are discarded
    chunks = re.split(
        rb"(?:^|\r?\n)" + re.escape(delim), body
    )
    if len(chunks) < 2:
        raise ValueError(
            f"multipart body lacks its boundary {boundary!r}"
        )
    closed = False
    for chunk in chunks[1:]:
        if chunk[:2] == b"--":
            closed = True
            break
        # chunk starts right after the delimiter: optional transport
        # padding then CRLF, then the part's own header block
        m = re.match(rb"[ \t]*\r?\n", chunk)
        if not m:
            raise ValueError("malformed multipart delimiter line")
        part = chunk[m.end() :]
        ph, ppos = _parse_headers(part, 0)
        # the part body ends where the NEXT delimiter began (split
        # already cut it); strip the trailing CRLF owned by the
        # delimiter
        pbody = re.sub(rb"\r?\n$", b"", part[ppos:])
        _walk_parts(ph, pbody, out, depth + 1)
    if not closed:
        raise ValueError(
            f"multipart body never closes boundary {boundary!r}"
        )


def parse_eml(payload: bytes) -> dict:
    """One RFC 5322 message → ``{from_addr, to_addrs, subject, date,
    message_id, content_type, n_parts, text, html}``:

    - ``subject``/``from_addr``/``to_addrs`` have RFC 2047 encoded
      words decoded; ``to_addrs`` is the comma-split list;
    - ``text`` is the FIRST ``text/plain`` leaf decoded per its
      charset + transfer encoding (the part a training pipeline
      keeps); ``html`` the first ``text/html`` leaf;
    - ``n_parts`` counts leaves (1 for non-multipart)."""
    headers, pos = _parse_headers(payload, 0)
    if not headers:
        raise ValueError("message has no headers")
    body = payload[pos:]
    parts: list = []
    _walk_parts(headers, body, parts, 0)
    text = html = None
    for ctype, params, raw in parts:
        if ctype not in ("text/plain", "text/html"):
            continue
        if (text if ctype == "text/plain" else html) is not None:
            continue
        cs = _charset(params.get("charset", "us-ascii"))
        # RFC 2045 canonical text uses CRLF line breaks; decode to
        # the corpus-local form so a QP/base64 message and its 7bit
        # twin yield identical strings
        try:
            s = raw.replace(b"\r\n", b"\n").decode(cs)
        except UnicodeDecodeError as exc:
            raise ValueError(
                f"{ctype} part not valid {cs}: {exc}"
            ) from exc
        if ctype == "text/plain":
            text = s
        else:
            html = s
    subject = _first(headers, "subject")
    from_h = _first(headers, "from")
    to_h = _first(headers, "to")
    return {
        "from_addr": (
            decode_encoded_words(from_h) if from_h is not None
            else None
        ),
        "to_addrs": (
            [decode_encoded_words(a.strip())
             for a in to_h.split(",")] if to_h else []
        ),
        "subject": (
            decode_encoded_words(subject) if subject is not None
            else None
        ),
        "date": _first(headers, "date"),
        "message_id": _first(headers, "message-id"),
        "content_type": _content_type(headers)[0],
        "n_parts": len(parts),
        "text": text,
        "html": html,
    }


# ---------------------------------------------------------------------------
# mbox
# ---------------------------------------------------------------------------
def parse_mbox(payload: bytes) -> list[dict]:
    """mboxo payload → one :func:`parse_eml` dict per message, each
    with the envelope ``From `` line's sender under ``envelope_from``
    and ``>From `` quoting unstuffed in bodies."""
    d = payload
    if d[:5] != b"From ":
        raise ValueError("mbox payload must start with 'From '")
    # split on message starts; a real 'From ' only counts at a line
    # start (the body-stuffed form is '>From ')
    starts = [0]
    pos = 0
    while True:
        nxt = d.find(b"\nFrom ", pos)
        if nxt < 0:
            break
        starts.append(nxt + 1)
        pos = nxt + 1
    out = []
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(d)
        block = d[s:e]
        nl = block.find(b"\n")
        if nl < 0:
            raise ValueError("mbox message lacks a body")
        envelope = block[5:nl].rstrip(b"\r").decode("latin-1")
        msg_bytes = re.sub(rb"(?m)^>From ", b"From ",
                           block[nl + 1 :])
        # the newline before the next 'From ' line belongs to the
        # container (the writer always appends exactly one)
        msg_bytes = re.sub(rb"\r?\n$", b"", msg_bytes, count=1)
        msg = parse_eml(msg_bytes)
        msg["envelope_from"] = envelope.split(" ")[0]
        out.append(msg)
    return out


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------
def _encode_word_b(s: str) -> str:
    return "=?utf-8?B?" + binascii.b2a_base64(
        s.encode("utf-8"), newline=False
    ).decode("ascii") + "?="


def _qp_encode(raw: bytes, line_len: int = 72) -> bytes:
    out = bytearray()
    col = 0
    for b in raw:
        tok = (
            bytes([b])
            if (0x20 <= b <= 0x7E and b != 0x3D) or b in (0x0A,)
            else b"=%02X" % b
        )
        if b == 0x0A:
            out += b"\r\n"
            col = 0
            continue
        if col + len(tok) > line_len:
            out += b"=\r\n"
            col = 0
        out += tok
        col += len(tok)
    return bytes(out)


def make_eml(
    subject: str,
    body_text: str,
    from_addr: str = "sender@example.org",
    to_addrs: tuple[str, ...] = ("rcpt@example.org",),
    date: str = "Wed, 01 Jan 2025 00:00:00 +0000",
    message_id: str = "<fixture-1@example.org>",
    html: str | None = None,
    cte: str = "7bit",
    encode_subject: bool = False,
    charset: str = "utf-8",
) -> bytes:
    """A spec-shaped message: single-part text/plain, or
    multipart/alternative when ``html`` is given. ``cte`` picks the
    leaf transfer encoding (``7bit``/``quoted-printable``/
    ``base64``)."""

    def encode_leaf(text: str, subtype: str) -> bytes:
        raw = text.encode(charset)
        hdr = (
            f"Content-Type: text/{subtype}; charset={charset}\r\n"
            f"Content-Transfer-Encoding: {cte}\r\n\r\n"
        ).encode("ascii")
        if cte == "7bit":
            body = raw
        elif cte == "quoted-printable":
            body = _qp_encode(raw)
        elif cte == "base64":
            b64 = binascii.b2a_base64(raw, newline=False)
            body = b"\r\n".join(
                b64[i : i + 76] for i in range(0, len(b64) or 1, 76)
            )
        else:
            raise ValueError(f"unsupported cte {cte!r}")
        return hdr + body

    subj = _encode_word_b(subject) if encode_subject else subject
    top = (
        f"From: {from_addr}\r\n"
        f"To: {', '.join(to_addrs)}\r\n"
        f"Subject: {subj}\r\n"
        f"Date: {date}\r\n"
        f"Message-ID: {message_id}\r\n"
        "MIME-Version: 1.0\r\n"
    ).encode("ascii")
    if html is None:
        return top + encode_leaf(body_text, "plain")
    boundary = "=-bergloom-fixture-boundary"
    out = top + (
        f'Content-Type: multipart/alternative; boundary="{boundary}"'
        "\r\n\r\npreamble is discarded\r\n"
    ).encode("ascii")
    for leaf in (encode_leaf(body_text, "plain"),
                 encode_leaf(html, "html")):
        out += f"--{boundary}\r\n".encode() + leaf + b"\r\n"
    out += f"--{boundary}--\r\nepilogue\r\n".encode()
    return out


def make_mbox(messages: list[bytes],
              envelope_from: str = "sender@example.org") -> bytes:
    """mboxo container: each message prefixed with an envelope line,
    body ``From `` lines stuffed to ``>From ``."""
    out = []
    for msg in messages:
        out.append(
            f"From {envelope_from} Wed Jan  1 00:00:00 2025\n".encode()
        )
        out.append(re.sub(rb"(?m)^From ", b">From ", msg))
        out.append(b"\n")  # exactly one separator newline, always —
        # the parser strips exactly one back
    return b"".join(out)


# ---------------------------------------------------------------------------
# Spark seam
# ---------------------------------------------------------------------------
_MSG_SCHEMA = (
    "doc_id long, msg_index int, envelope_from string, "
    "from_addr string, subject string, date string, "
    "message_id string, content_type string, n_parts int, "
    "text string, html string"
)


def mbox_messages(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode binary mbox columns into one row per message —
    map-only Arrow-batched kernel over the scan partitioning, same
    stance as :func:`bergloom_spark.operators.warc.warc_records`."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, m in enumerate(parse_mbox(bytes(payload))):
                    rows.append(
                        (int(doc_id), i, m["envelope_from"],
                         m["from_addr"], m["subject"], m["date"],
                         m["message_id"], m["content_type"],
                         m["n_parts"], m["text"], m["html"])
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "msg_index", "envelope_from",
                         "from_addr", "subject", "date",
                         "message_id", "content_type", "n_parts",
                         "text", "html"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, _MSG_SCHEMA
    )
