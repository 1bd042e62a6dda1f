"""Dependency-free baseline TIFF codec (pure numpy + python).

Round 6: the scanned-document corpus format. Implemented from the
public TIFF 6.0 specification — the decoder reads real strip-based
baseline TIFFs; the encoder exists for roundtrip oracles (same stance
as the GIF/PNG encoders).

Decoder coverage, stated honestly:
- both byte orders (II little / MM big endian); multi-page files
  decode page-by-page via :func:`decode_tiff_pages` (round 7 — the
  multi-page sibling of GIF's frame explosion; :func:`decode_tiff`
  returns the first page, :func:`tiff_page_count` counts),
- strip organization (RowsPerStrip; tiled TIFFs raise),
- compression 1 (none), 5 (LZW — TIFF's MSB-first, EARLY-CHANGE
  variant, unlike GIF's) and 32773 (PackBits), with horizontal
  predictor 2,
- 8-bit samples, chunky planar config; photometric 0 (MinIsWhite,
  inverted), 1 (MinIsBlack), 2 (RGB, extra samples/alpha dropped),
  3 (palette via the 16-bit ColorMap, high byte taken).
- RAISED honestly: tiles, planar=2, other bit depths/compressions
  (CCITT fax, JPEG-in-TIFF, Deflate), float samples.

Encoder: little-endian, RGB or gray 8-bit chunky, compression none /
PackBits / LZW (early change), multi-strip via rows_per_strip,
multi-page via :func:`encode_tiff_pages` (chained IFDs).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_tiff",
    "encode_tiff",
    "decode_tiff_pages",
    "encode_tiff_pages",
    "tiff_page_count",
]


# --------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9)
# --------------------------------------------------------------------------
def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find a run
        j = i
        while j + 1 < n and row[j + 1] == row[j] and j - i < 127:
            j += 1
        if j > i:  # run of (j - i + 1) identical bytes
            out.append(256 - (j - i))  # -(j-i) two's complement
            out.append(row[i])
            i = j + 1
            continue
        # literal stretch: until a 3-byte run starts or 128 cap
        j = i
        while (
            j + 2 < n
            and not (row[j + 1] == row[j + 2] == row[j])
            and j - i < 127
        ):
            j += 1
        if j - i >= 127:
            j = i + 127
        elif j + 2 >= n:
            j = min(n - 1, i + 127)
        out.append(j - i)
        out += row[i : j + 1]
        i = j + 1
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected and i < len(data):
        c = data[i]
        i += 1
        if c == 128:  # noop
            continue
        if c < 128:
            out += data[i : i + c + 1]
            i += c + 1
        else:
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) < expected:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expected])


# --------------------------------------------------------------------------
# TIFF LZW (§13): MSB-first packing, EARLY code-width change
# --------------------------------------------------------------------------
def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    CLEAR, EOI = 256, 257
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return EOI  # spec: missing EOI tolerated at end
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        v = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1
        return v

    out = bytearray()
    table: list = [bytes((i,)) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes((i,)) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first TIFF-LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF-LZW code out of range")
        out += entry
        # EARLY CHANGE: grow when the NEXT code to assign is
        # 2^width - 1 (one earlier than GIF)
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError(
            f"TIFF strip ended early: {len(out)} of {expected}"
        )
    return bytes(out[:expected])


def _lzw_encode_tiff(raw: bytes) -> bytes:
    """TIFF §13 LZW with the universal EARLY-CHANGE convention: the
    code width grows one code earlier than GIF's — after assigning
    code 2^width − 1 (511/1023/2047), the NEXT emitted code is wider.
    MSB-first bit packing."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table = {(i,): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    buf: tuple = ()
    for b in raw:
        cand = buf + (b,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code >= 4093:  # refuse to reach the 12-bit ceiling
            emit(CLEAR, width)
            table = {(i,): i for i in range(256)}
            next_code = 258
            width = 9
        else:
            table[cand] = next_code
            next_code += 1
            if next_code >= (1 << width) and width < 12:
                width += 1  # early change
        buf = (b,)
    if buf:
        emit(table[buf], width)
        # Final-flush boundary (review r6): the DECODER adds one more
        # table entry while processing this last data code (the
        # one-entry lag), so it sits at next_code + 1 when it reads
        # EOI — early change means it widens at 2^width - 1, i.e.
        # exactly when next_code + 1 >= 2^width. The mid-loop check
        # (after an assignment) is `next_code >= 2^width` and stays.
        if next_code + 1 >= (1 << width) and width < 12:
            width += 1
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------
# Absolute budget for a multi-page decode's output bytes (shared
# shape with gifcodec's animation budget, review r7): chained IFDs
# may legally alias one strip, so bytes-out is otherwise unbounded.
_MAX_DECODED_BYTES = 1 << 29


def _ifd_entries(d: bytes, e: str, off: int) -> tuple[dict, int]:
    """One IFD at ``off`` → ({tag: value-or-list}, next IFD offset)."""
    try:
        return _ifd_entries_unchecked(d, e, off)
    except (struct.error, IndexError) as exc:
        # IndexError: a zero-count entry for a tag we index (fuzz r6)
        raise ValueError(f"truncated TIFF IFD: {exc}") from exc


def _ifd_entries_unchecked(d: bytes, e: str, off: int):
    (count,) = struct.unpack_from(e + "H", d, off)
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    tags: dict = {}
    p = off + 2
    for _ in range(count):
        tag, typ, n = struct.unpack_from(e + "HHI", d, p)
        size = type_size.get(typ, 1) * n
        voff = p + 8 if size <= 4 else struct.unpack_from(e + "I", d, p + 8)[0]
        if typ in type_fmt:
            vals = list(
                struct.unpack_from(e + str(n) + type_fmt[typ], d, voff)
            )
            tags[tag] = vals if n > 1 else vals[0]
        elif typ == 2 and n:  # ASCII (r9, for the EXIF sniff): NUL-
            # terminated byte string; latin-1 never fails, preserving
            # the decode-or-ValueError contract
            raw = d[voff : voff + n]
            if len(raw) != n:
                raise ValueError("truncated TIFF ASCII value")
            tags[tag] = raw.split(b"\x00")[0].decode("latin-1")
        p += 12
    (nxt,) = struct.unpack_from(e + "I", d, p)
    return tags, nxt


def _first_ifd(payload: bytes) -> tuple[bytes, str, dict, int, int]:
    d = payload
    if d[:2] == b"II":
        e = "<"
    elif d[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF payload (missing II/MM)")
    if len(d) < 8:
        raise ValueError("truncated TIFF header")
    magic, off = struct.unpack_from(e + "HI", d, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    tags, nxt = _ifd_entries(d, e, off)
    return d, e, tags, nxt, off


def tiff_page_count(payload: bytes) -> int:
    d, e, _, nxt, off0 = _first_ifd(payload)
    n = 1
    # seed with IFD0's own offset (review r7: a later next-pointer
    # looping back to IFD0 counted page 0 twice)
    seen = {off0}
    while nxt and nxt not in seen:
        seen.add(nxt)
        _, nxt = _ifd_entries(d, e, nxt)
        n += 1
    return n


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF bytes → (H, W, 3) uint8 RGB of the FIRST page."""
    d, e, t, _, _ = _first_ifd(payload)
    return _decode_ifd(d, t)


def decode_tiff_pages(payload: bytes) -> list:
    """TIFF bytes → [(H, W, 3) uint8 RGB] for EVERY page (round 7 —
    the multi-page sibling of GIF's frame explosion: each IFD in the
    next-IFD chain decodes independently; pages may differ in size,
    compression, and photometric). The chain walk carries the same
    cycle guard as :func:`tiff_page_count`."""
    d, e, t, nxt, off0 = _first_ifd(payload)
    pages = [_decode_ifd(d, t)]
    total = pages[0].nbytes
    seen = {off0}
    while nxt and nxt not in seen:
        seen.add(nxt)
        t, nxt = _ifd_entries(d, e, nxt)
        page = _decode_ifd(d, t)
        total += page.nbytes
        # absolute decoded-bytes budget (review r7, 4th pass): many
        # IFDs may legally share ONE strip, so a KB-sized payload can
        # otherwise explode to unbounded pages — same bound shape as
        # gifcodec's animation budget
        if total > _MAX_DECODED_BYTES:
            raise ValueError(
                f"multi-page TIFF too large to decode: past page "
                f"{len(pages)} the output exceeds the "
                f"{_MAX_DECODED_BYTES >> 20} MiB budget"
            )
        pages.append(page)
    return pages


def _decode_ifd(d: bytes, t: dict) -> np.ndarray:
    """One IFD's image → (H, W, 3) uint8 RGB."""
    if 322 in t or 323 in t or 324 in t:
        raise ValueError("tiled TIFF unsupported (strips only)")
    for req in (256, 257, 273, 279):  # review r6: KeyError is not the
        # malformed-payload contract (an EXIF-only 'II*\\0' blob
        # reaches here via the 2-byte magic dispatch)
        if req not in t:
            raise ValueError(f"TIFF IFD missing required tag {req}")

    def one(tag: int, default=None) -> int:
        """Scalar tag value — a multi-value count where the spec says
        one is malformed, not a TypeError (fuzz r6)."""
        v = t.get(tag, default)
        if isinstance(v, list):
            raise ValueError(
                f"TIFF tag {tag} expects one value, got {len(v)}"
            )
        return int(v)

    w, h = one(256), one(257)
    comp = one(259, 1)
    photo = one(262, 1)
    spp = one(277, 1)
    planar = one(284, 1)
    predictor = one(317, 1)
    bits = t.get(258, 8)
    bits = bits if isinstance(bits, list) else [bits]
    if any(b != 8 for b in bits):
        raise ValueError(f"BitsPerSample {bits} unsupported (8 only)")
    if planar != 1:
        raise ValueError("PlanarConfiguration 2 unsupported")
    if comp not in (1, 5, 32773):
        raise ValueError(
            f"compression {comp} unsupported (none/LZW/PackBits)"
        )
    if predictor not in (1, 2):
        raise ValueError(f"predictor {predictor} unsupported")
    offs = t[273]
    offs = offs if isinstance(offs, list) else [offs]
    lens = t[279]
    lens = lens if isinstance(lens, list) else [lens]
    rps = one(278, h)
    stride = w * spp
    rows = bytearray()
    for si, (o, ln) in enumerate(zip(offs, lens)):
        nrows = min(rps, h - si * rps)
        expected = nrows * stride
        raw = bytes(d[o : o + ln])
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("truncated uncompressed strip")
            raw = raw[:expected]
        elif comp == 5:
            raw = _lzw_decode_tiff(raw, expected)
        else:
            raw = _packbits_decode(raw, expected)
        rows += raw
    px = np.frombuffer(bytes(rows), np.uint8).reshape(h, stride)
    if predictor == 2:  # horizontal differencing: undo via cumsum
        px = px.astype(np.int64)
        acc = px.reshape(h, w, spp)
        px = (np.cumsum(acc, axis=1) & 0xFF).astype(np.uint8).reshape(
            h, stride
        )
    px = px.reshape(h, w, spp)
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB photometric with <3 samples")
        return px[:, :, :3].copy()
    if photo == 3:
        cmap = t.get(320)
        if cmap is None:
            raise ValueError("palette TIFF without ColorMap")
        if not isinstance(cmap, list) or len(cmap) < 3:
            raise ValueError("malformed TIFF ColorMap")
        n = len(cmap) // 3
        cm = (
            np.array(cmap, dtype=np.int64).reshape(3, n).T >> 8
        ).astype(np.uint8)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= n:
            raise ValueError("palette index out of ColorMap range")
        return cm[idx].copy()
    gray = px[:, :, 0]
    if photo == 0:  # MinIsWhite
        gray = 255 - gray
    elif photo != 1:
        raise ValueError(f"photometric {photo} unsupported")
    return np.repeat(gray[:, :, None], 3, axis=2).copy()


def encode_tiff(
    arr: np.ndarray,
    compression: str = "none",
    rows_per_strip: int | None = None,
) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) gray) → little-endian baseline
    TIFF bytes; ``compression``: "none", "packbits" or "lzw"."""
    return encode_tiff_pages([arr], compression, rows_per_strip)


def encode_tiff_pages(
    pages,
    compression: str = "none",
    rows_per_strip: int | None = None,
) -> bytes:
    """Multi-page little-endian TIFF: one IFD per image, chained via
    the next-IFD pointer (round 7). Pages may differ in size and in
    gray/RGB shape."""
    if not pages:
        raise ValueError("empty page list")
    out = bytearray(struct.pack("<2sHI", b"II", 42, 0))
    prev_next_pos = None
    for arr in pages:
        section, ifd_off, next_pos = _encode_page(
            arr, compression, rows_per_strip, base=len(out)
        )
        if prev_next_pos is None:
            struct.pack_into("<I", out, 4, ifd_off)  # header → IFD 1
        else:
            # previous page's next-IFD pointer → this page's IFD
            struct.pack_into("<I", out, prev_next_pos, ifd_off)
        out += section
        prev_next_pos = next_pos
    return bytes(out)


def _encode_page(arr, compression, rows_per_strip, base):
    """One page's section (strip data | extra values | IFD), laid out
    at absolute offset ``base`` → (bytes, absolute IFD offset,
    absolute position of the next-IFD pointer)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"expected (H, W, 3) or (H, W), got {a.shape}")
    h, w = a.shape[:2]
    spp = 1 if gray else 3
    rps = rows_per_strip or h
    stride = w * spp
    flat = a.reshape(h, stride)
    strips = []
    for y0 in range(0, h, rps):
        raw = flat[y0 : y0 + rps].tobytes()
        if compression == "packbits":
            strips.append(_packbits_encode(raw))
        elif compression == "lzw":
            strips.append(_lzw_encode_tiff(raw))
        elif compression == "none":
            strips.append(raw)
        else:
            raise ValueError(f"unsupported compression {compression!r}")
    comp_tag = {"none": 1, "lzw": 5, "packbits": 32773}[compression]

    # section layout: strip data | extra value area | IFD
    data = bytearray()
    strip_offs = []
    for s in strips:
        strip_offs.append(base + len(data))
        data += s
        if len(s) % 2:
            data += b"\x00"  # word-align next strip
    extra = bytearray()
    extra_base = base + len(data)

    def _vals(typ_fmt, vals):
        """Return (packed inline value, or offset into extra)."""
        blob = struct.pack("<" + str(len(vals)) + typ_fmt, *vals)
        if len(blob) <= 4:
            return blob + b"\x00" * (4 - len(blob)), None
        off = extra_base + len(extra)
        extra.extend(blob)
        if len(extra) % 2:
            extra.append(0)
        return struct.pack("<I", off), None

    entries = []

    def add(tag, typ, typ_fmt, vals):
        packed, _ = _vals(typ_fmt, vals)
        entries.append(
            struct.pack("<HHI", tag, typ, len(vals)) + packed
        )

    add(256, 4, "I", [w])
    add(257, 4, "I", [h])
    add(258, 3, "H", [8] * spp)
    add(259, 3, "H", [comp_tag])
    add(262, 3, "H", [2 if spp == 3 else 1])
    add(273, 4, "I", strip_offs)
    add(277, 3, "H", [spp])
    add(278, 4, "I", [rps])
    add(279, 4, "I", [len(s) for s in strips])
    ifd_off = extra_base + len(extra)
    ifd = (
        struct.pack("<H", len(entries))
        + b"".join(entries)
        + struct.pack("<I", 0)  # next-IFD pointer (patched by caller)
    )
    section = bytes(data) + bytes(extra) + ifd
    next_pos = base + len(section) - 4
    return section, ifd_off, next_pos
