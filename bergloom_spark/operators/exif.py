"""EXIF orientation/timestamp sniff (round 9; register driver rows in
round 10) — the image-metadata half of corpus triage.

EXIF is a TIFF IFD structure (the public EXIF spec embeds a complete
TIFF header inside a JPEG APP1 segment prefixed ``Exif\\0\\0``), so
this reuses ``tiffcodec``'s hardened IFD walk verbatim: JPEG payloads
get a marker walk to APP1 first, bare TIFF payloads parse directly.
A 100 TB image corpus filters and normalizes on exactly these fields
before any pixel decode: orientation (rotate/flip-aware dedup and
resize), capture timestamp (near-dup burst grouping, time-range
slicing), camera make/model (source stratification).

Scale shape: header-only, executor-side, map-only — same seam and
same ``bytes → dict or ValueError`` contract as every sniffer here.
"""

from __future__ import annotations

import struct

from bergloom_spark.operators.tiffcodec import _first_ifd, _ifd_entries

__all__ = [
    "exif_meta",
    "make_exif_jpeg",
    "make_exif_tiff",
    "make_exif_png",
]

_ORIENTATION = 0x0112
_DATETIME = 0x0132
_MAKE = 0x010F
_MODEL = 0x0110
_EXIF_IFD_PTR = 0x8769
_DATETIME_ORIGINAL = 0x9003


def _tiff_exif(blob: bytes) -> dict:
    _, e, tags, _nxt, _off0 = _first_ifd(blob)
    out = {
        "orientation": tags.get(_ORIENTATION, 1),
        "datetime": tags.get(_DATETIME),
        "datetime_original": None,
        "make": tags.get(_MAKE),
        "model": tags.get(_MODEL),
    }
    sub = tags.get(_EXIF_IFD_PTR)
    if isinstance(sub, int) and sub:
        sub_tags, _ = _ifd_entries(blob, e, sub)
        out["datetime_original"] = sub_tags.get(_DATETIME_ORIGINAL)
    if not isinstance(out["orientation"], int) or not (
        1 <= out["orientation"] <= 8
    ):
        raise ValueError(
            f"invalid EXIF orientation {out['orientation']!r}"
        )
    return out


def exif_meta(payload: bytes) -> dict:
    """JPEG, TIFF, or PNG bytes → ``{container, orientation, datetime,
    datetime_original, make, model}`` without any pixel decode.

    JPEG: marker walk to the APP1 ``Exif\\0\\0`` segment (stops at
    SOS — EXIF precedes scan data by spec); a JPEG without one raises
    ValueError (the honest triage answer — absent metadata is a
    signal, not a default). TIFF: IFD0 directly. ``orientation``
    must be the spec's 1..8."""
    d = payload
    if d[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(d):
            if d[pos] != 0xFF:
                raise ValueError(f"bad JPEG marker at {pos}")
            # ITU-T T.81 §B.1.1.2: any number of 0xFF fill bytes may
            # pad the space before a marker byte (ADVICE r9: these
            # previously fell into the length-prefixed branch and
            # spec-valid JPEGs were rejected)
            while pos + 1 < len(d) and d[pos + 1] == 0xFF:
                pos += 1
            if pos + 4 > len(d):
                break
            marker = d[pos + 1]
            if marker in (0xDA, 0xD9):  # SOS / EOI: no APP1 coming —
                break  # EXIF precedes scan data by spec (ADVICE r9:
                # EOI is standalone; reading length bytes after it
                # read garbage)
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers have no length
                continue
            (seglen,) = struct.unpack_from(">H", d, pos + 2)
            if seglen < 2 or pos + 2 + seglen > len(d):
                raise ValueError("truncated JPEG segment")
            if marker == 0xE1 and d[pos + 4 : pos + 10] == b"Exif\x00\x00":
                blob = d[pos + 10 : pos + 2 + seglen]
                meta = _tiff_exif(blob)
                meta["container"] = "jpeg"
                return meta
            pos += 2 + seglen
        raise ValueError("JPEG carries no EXIF APP1 segment")
    if d[:2] in (b"II", b"MM"):
        meta = _tiff_exif(d)
        meta["container"] = "tiff"
        return meta
    if d[:8] == b"\x89PNG\r\n\x1a\n":
        # PNG 1.5's eXIf chunk (round 10): the raw TIFF blob inside a
        # standard chunk walk — IDAT is never inflated
        pos = 8
        while pos + 8 <= len(d):
            (clen,) = struct.unpack_from(">I", d, pos)
            ctype = d[pos + 4 : pos + 8]
            if pos + 12 + clen > len(d):
                raise ValueError(f"truncated PNG chunk {ctype!r}")
            if ctype == b"eXIf":
                meta = _tiff_exif(d[pos + 8 : pos + 8 + clen])
                meta["container"] = "png"
                return meta
            if ctype == b"IEND":
                break
            pos += 12 + clen  # length + type + body + CRC
        raise ValueError("PNG carries no eXIf chunk")
    raise ValueError(
        f"unrecognized EXIF carrier magic {d[:4]!r}: JPEG, TIFF, "
        "and PNG"
    )


def _build_tiff_blob(
    orientation: int,
    datetime: str,
    datetime_original: str,
    make: str,
) -> bytes:
    """Little-endian TIFF blob: IFD0 (orientation, datetime, make,
    Exif-IFD pointer) + Exif IFD (datetime_original) + value area."""
    dt = datetime.encode() + b"\x00"
    dto = datetime_original.encode() + b"\x00"
    mk = make.encode() + b"\x00"
    # layout: header(8) IFD0(2+4*12+4) ExifIFD(2+1*12+4) values
    ifd0_off = 8
    ifd0_size = 2 + 4 * 12 + 4
    exif_off = ifd0_off + ifd0_size
    exif_size = 2 + 1 * 12 + 4
    val_off = exif_off + exif_size
    dt_off = val_off
    mk_off = dt_off + len(dt)
    dto_off = mk_off + len(mk)

    def entry(tag, typ, n, value_or_off, inline=False):
        e = struct.pack("<HHI", tag, typ, n)
        if inline:
            return e + struct.pack("<HH", value_or_off, 0)
        return e + struct.pack("<I", value_or_off)

    def ascii_entry(tag, raw, off):
        # the spec stores values of ≤ 4 bytes INLINE in the entry's
        # value field, not behind an offset (review: a 2-char make
        # string read back as offset bytes before this)
        e = struct.pack("<HHI", tag, 2, len(raw))
        if len(raw) <= 4:
            return e + raw.ljust(4, b"\x00")
        return e + struct.pack("<I", off)

    ifd0 = struct.pack("<H", 4)
    ifd0 += ascii_entry(_MAKE, mk, mk_off)
    ifd0 += entry(_ORIENTATION, 3, 1, orientation, inline=True)
    ifd0 += ascii_entry(_DATETIME, dt, dt_off)
    ifd0 += entry(_EXIF_IFD_PTR, 4, 1, exif_off)
    ifd0 += struct.pack("<I", 0)
    exif = struct.pack("<H", 1)
    exif += ascii_entry(_DATETIME_ORIGINAL, dto, dto_off)
    exif += struct.pack("<I", 0)
    return (
        b"II*\x00" + struct.pack("<I", ifd0_off)
        + ifd0 + exif + dt + mk + dto
    )


def make_exif_jpeg(
    jpeg: bytes,
    orientation: int = 1,
    datetime: str = "2020:01:01 00:00:00",
    datetime_original: str = "2020:01:01 00:00:00",
    make: str = "synthcam",
) -> bytes:
    """Inject an APP1 EXIF segment (spec layout) right after a JPEG's
    SOI — for tests and oracles; any EXIF-aware tool reads it."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    blob = _build_tiff_blob(orientation, datetime, datetime_original, make)
    body = b"Exif\x00\x00" + blob
    seg = b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body
    return jpeg[:2] + seg + jpeg[2:]


def make_exif_png(
    png: bytes,
    orientation: int = 1,
    datetime: str = "2020:01:01 00:00:00",
    datetime_original: str = "2020:01:01 00:00:00",
    make: str = "synthcam",
) -> bytes:
    """Inject a PNG 1.5 eXIf chunk (raw TIFF blob, real chunk CRC)
    right after IHDR — for tests and oracles."""
    import zlib

    if png[:8] != b"\x89PNG\r\n\x1a\n" or len(png) < 16:
        raise ValueError("not a PNG payload")
    (ihdr_len,) = struct.unpack_from(">I", png, 8)
    if png[12:16] != b"IHDR" or 8 + 12 + ihdr_len > len(png):
        raise ValueError("PNG payload does not start with a whole IHDR")
    insert_at = 8 + 12 + ihdr_len  # after IHDR's CRC
    blob = _build_tiff_blob(orientation, datetime, datetime_original, make)
    chunk = (
        struct.pack(">I", len(blob)) + b"eXIf" + blob
        + struct.pack(">I", zlib.crc32(b"eXIf" + blob) & 0xFFFFFFFF)
    )
    return png[:insert_at] + chunk + png[insert_at:]


def make_exif_tiff(
    orientation: int = 1,
    datetime: str = "2020:01:01 00:00:00",
    datetime_original: str = "2020:01:01 00:00:00",
    make: str = "synthcam",
) -> bytes:
    """Bare metadata-only TIFF blob (IFD structure is valid TIFF; no
    image strips — the sniffer never needs them)."""
    return _build_tiff_blob(orientation, datetime, datetime_original, make)
