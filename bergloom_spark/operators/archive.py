"""Archive-container triage + extraction (ZIP / ustar TAR / gzip) —
the bundle formats a real training corpus arrives in.

Same stance as the media triage battery (``avcodec.py``): a 100 TB
ingest decides per payload — how many entries, how big expanded,
which compression method — from *headers only* for ZIP/TAR/zstd
(gzip alone cannot be counted without inflating — deflate has no
length field — so its triage is budget-bounded instead;
:func:`gzip_isize_hint` is the zero-cost advisory form), before
committing any extraction; extraction is then a map-only Arrow-batched
kernel with an absolute expansion budget (a crafted bomb gets a
ValueError, never an OOM). All three parsers honor the corpus
contract: bytes → result or ValueError, cursor strictly advances,
no hang class.

Spec sources (public): PKWARE APPNOTE 6.3 (ZIP local header
0x04034b50, central directory 0x02014b50, EOCD 0x06054b50),
POSIX.1-1988 ustar (512-byte octal headers, space-blanked
checksum), RFC 1952 (gzip member header flags FTEXT/FHCRC/FEXTRA/
FNAME/FCOMMENT, MTIME, OS, ISIZE trailer).
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import DataFrame

__all__ = [
    "make_zip",
    "zip_entries",
    "zip_meta",
    "zip_extract",
    "make_tar",
    "tar_entries",
    "tar_meta",
    "make_gzip",
    "gzip_meta",
    "gzip_isize_hint",
    "make_zstd_frame",
    "zstd_meta",
    "archive_meta",
    "archive_entries",
]

_EOCD_SIG = 0x06054B50
_EOCD64_SIG = 0x06064B50
_EOCD64_LOC_SIG = 0x07064B50
_CD_SIG = 0x02014B50
_LOCAL_SIG = 0x04034B50
_MAX_EXPANSION = 256 << 20  # absolute extraction budget (bytes)
# Fixed DOS time/date for byte-reproducible fixtures:
# 2025-01-01 00:00:00 → date = ((2025-1980)<<9)|(1<<5)|1
_DOS_DATE = ((2025 - 1980) << 9) | (1 << 5) | 1
_DOS_TIME = 0


# ---------------------------------------------------------------------------
# ZIP
# ---------------------------------------------------------------------------
def make_zip(
    entries: list[tuple[str, bytes]],
    method: int = 0,
    zip64: bool = False,
) -> bytes:
    """ZIP bytes from (name, data) pairs — method 0 (store) or 8
    (deflate, fixed level 6 so fixtures are byte-reproducible).
    Local headers + central directory + EOCD. ``zip64=True`` emits
    the zip64 format (sentinel 32/16-bit fields + 0x0001 extended-
    information extras + EOCD64 record/locator) — the layout any
    >4 GiB archive uses, writable here on small fixtures so the
    reader's zip64 path is testable without 4 GiB of disk."""
    if method not in (0, 8):
        raise ValueError(f"unsupported ZIP method {method}")
    version = 45 if zip64 else 20
    locals_, cd, offset = [], [], 0
    for name, data in entries:
        nb = name.encode()
        crc = zlib.crc32(data)
        if method == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            blob = co.compress(data) + co.flush()
        else:
            blob = data
        if zip64:
            l_extra = struct.pack("<HHQQ", 1, 16, len(data),
                                  len(blob))
            lh = struct.pack(
                "<IHHHHHIIIHH", _LOCAL_SIG, version, 0, method,
                _DOS_TIME, _DOS_DATE, crc, 0xFFFFFFFF, 0xFFFFFFFF,
                len(nb), len(l_extra),
            ) + nb + l_extra + blob
            # CD zip64 extra order (APPNOTE 4.5.3): usize, csize,
            # local offset — each present because its 32-bit field
            # is the sentinel
            c_extra = struct.pack("<HHQQQ", 1, 24, len(data),
                                  len(blob), offset)
            cd.append(
                struct.pack(
                    "<IHHHHHHIIIHHHHHII", _CD_SIG, version,
                    version, 0, method, _DOS_TIME, _DOS_DATE, crc,
                    0xFFFFFFFF, 0xFFFFFFFF, len(nb), len(c_extra),
                    0, 0, 0, 0, 0xFFFFFFFF,
                ) + nb + c_extra
            )
        else:
            lh = struct.pack(
                "<IHHHHHIIIHH", _LOCAL_SIG, version, 0, method,
                _DOS_TIME, _DOS_DATE, crc, len(blob), len(data),
                len(nb), 0,
            ) + nb + blob
            cd.append(
                struct.pack(
                    "<IHHHHHHIIIHHHHHII", _CD_SIG, version,
                    version, 0, method, _DOS_TIME, _DOS_DATE, crc,
                    len(blob), len(data), len(nb), 0, 0, 0, 0, 0,
                    offset,
                ) + nb
            )
        locals_.append(lh)
        offset += len(lh)
    cd_blob = b"".join(cd)
    out = b"".join(locals_) + cd_blob
    if zip64:
        eocd64_off = offset + len(cd_blob)
        eocd64 = struct.pack(
            "<IQHHIIQQQQ", _EOCD64_SIG, 44, version, version, 0, 0,
            len(entries), len(entries), len(cd_blob), offset,
        )
        locator = struct.pack(
            "<IIQI", _EOCD64_LOC_SIG, 0, eocd64_off, 1
        )
        eocd = struct.pack(
            "<IHHHHIIH", _EOCD_SIG, 0, 0, 0xFFFF, 0xFFFF,
            0xFFFFFFFF, 0xFFFFFFFF, 0,
        )
        return out + eocd64 + locator + eocd
    eocd = struct.pack(
        "<IHHHHIIH", _EOCD_SIG, 0, 0, len(entries), len(entries),
        len(cd_blob), offset, 0,
    )
    return out + eocd


def _find_eocd(d: bytes) -> tuple:
    """Locate the EOCD record scanning back over a possible trailing
    comment (≤65535 bytes per spec) → (n_total, cd_size, cd_off).
    Sentinel EOCD fields route through the zip64 locator + EOCD64
    record — >4 GiB archives are ROUTINE in a 100 TB corpus, so
    zip64 is the format this reader must speak, not reject."""
    if len(d) < 22:
        raise ValueError("payload too short for a ZIP EOCD")
    lo = max(0, len(d) - 22 - 65535)
    pos = d.rfind(struct.pack("<I", _EOCD_SIG), lo)
    while pos >= 0:
        if pos + 22 <= len(d):
            (_, disk, cd_disk, n_disk, n_total, cd_size, cd_off,
             clen) = struct.unpack_from("<IHHHHIIH", d, pos)
            if pos + 22 + clen == len(d):
                # APPNOTE 4.4.19/20: ANY of the six EOCD fields may
                # carry its sentinel in a zip64 archive (review r10
                # pass 4 — a sentinel disk number is legal too)
                if 0xFFFF in (disk, cd_disk, n_disk, n_total) or (
                    0xFFFFFFFF in (cd_size, cd_off)
                ):
                    return _read_eocd64(d, pos)
                if disk or cd_disk:
                    raise ValueError("multi-disk ZIP unsupported")
                if n_disk != n_total:
                    raise ValueError("multi-disk ZIP unsupported")
                return n_total, cd_size, cd_off
        pos = d.rfind(struct.pack("<I", _EOCD_SIG), lo, pos)
    raise ValueError("no ZIP end-of-central-directory record")


def _read_eocd64(d: bytes, eocd_pos: int) -> tuple:
    """zip64: the 20-byte EOCD64 LOCATOR sits immediately before the
    EOCD; it points at the EOCD64 record carrying the 64-bit
    directory fields."""
    loc_pos = eocd_pos - 20
    if loc_pos < 0:
        raise ValueError("zip64 EOCD without a locator")
    sig, loc_disk, off64, n_disks = struct.unpack_from(
        "<IIQI", d, loc_pos
    )
    if sig != _EOCD64_LOC_SIG:
        raise ValueError("missing zip64 EOCD locator signature")
    if loc_disk != 0 or n_disks > 1:
        raise ValueError("multi-disk ZIP unsupported")
    if off64 + 56 > len(d):
        raise ValueError("zip64 EOCD offset exceeds payload")
    (sig64, _size, _vm, _vn, disk, cd_disk, n_this, n_total,
     cd_size, cd_off) = struct.unpack_from("<IQHHIIQQQQ", d, off64)
    if sig64 != _EOCD64_SIG:
        raise ValueError("bad zip64 EOCD signature")
    if disk or cd_disk or n_this != n_total:
        raise ValueError("multi-disk ZIP unsupported")
    return n_total, cd_size, cd_off


def _zip64_extra(extra: bytes, usize: int, csize: int,
                 loff: int) -> tuple:
    """Resolve sentinel CD fields from the 0x0001 zip64 extended-
    information extra (APPNOTE 4.5.3 — values appear in fixed order,
    each present only when its 32-bit field is the sentinel)."""
    pos = 0
    while pos + 4 <= len(extra):
        xid, xlen = struct.unpack_from("<HH", extra, pos)
        data = extra[pos + 4 : pos + 4 + xlen]
        if len(data) != xlen:
            raise ValueError("truncated ZIP extra field")
        if xid == 1:
            dp = 0
            if usize == 0xFFFFFFFF:
                if dp + 8 > len(data):
                    raise ValueError("zip64 extra lacks usize")
                usize = int.from_bytes(data[dp : dp + 8], "little")
                dp += 8
            if csize == 0xFFFFFFFF:
                if dp + 8 > len(data):
                    raise ValueError("zip64 extra lacks csize")
                csize = int.from_bytes(data[dp : dp + 8], "little")
                dp += 8
            if loff == 0xFFFFFFFF:
                if dp + 8 > len(data):
                    raise ValueError("zip64 extra lacks offset")
                loff = int.from_bytes(data[dp : dp + 8], "little")
                dp += 8
            # int64 ceiling: downstream schemas are 'long' and an
            # Arrow cast crash is not the contract ValueError
            # (review r10 pass 4)
            if max(usize, csize, loff) >= 1 << 63:
                raise ValueError(
                    "zip64 field exceeds the int64 range"
                )
            return usize, csize, loff
        pos += 4 + xlen
    raise ValueError(
        "sentinel ZIP fields without a zip64 extended-info extra"
    )


def zip_entries(payload: bytes) -> list[dict]:
    """Central-directory walk → one dict per entry:
    ``{name, method, compressed_size, uncompressed_size, crc32,
    local_offset}``. Header-only (nothing is decompressed). zip64
    sentinel fields resolve through the 0x0001 extended-info extra
    and the EOCD64 record (round 10: >4 GiB members are routine at
    corpus scale)."""
    d = payload
    n_total, cd_size, cd_off = _find_eocd(d)
    if cd_off + cd_size > len(d):
        raise ValueError("central directory exceeds payload")
    out, pos = [], cd_off
    for _ in range(n_total):
        if pos + 46 > len(d):
            raise ValueError("truncated central-directory entry")
        (sig, _vmade, _vneed, flags, method, _t, _dt, crc, csize,
         usize, nlen, elen, clen, _dsk, _ia, _ea, loff
         ) = struct.unpack_from("<IHHHHHHIIIHHHHHII", d, pos)
        if sig != _CD_SIG:
            raise ValueError(
                f"bad central-directory signature at {pos}"
            )
        if 0xFFFFFFFF in (csize, usize, loff):
            extra = d[pos + 46 + nlen : pos + 46 + nlen + elen]
            if len(extra) != elen:
                raise ValueError("truncated CD extra field")
            usize, csize, loff = _zip64_extra(extra, usize, csize,
                                              loff)
        name_b = d[pos + 46 : pos + 46 + nlen]
        if len(name_b) != nlen:
            raise ValueError("truncated entry name")
        # APPNOTE D.1: names are CP437 unless flag bit 11 (UTF-8)
        name = name_b.decode(
            "utf-8" if flags & 0x800 else "cp437", errors="strict"
        )
        out.append(
            {
                "name": name,
                "method": method,
                "compressed_size": csize,
                "uncompressed_size": usize,
                "crc32": crc,
                "local_offset": loff,
            }
        )
        pos += 46 + nlen + elen + clen
    if pos != cd_off + cd_size:
        raise ValueError("central directory size mismatch")
    return out


def zip_meta(payload: bytes) -> dict:
    """Header-only ZIP triage: ``{n_entries, total_compressed,
    total_uncompressed, n_deflate, n_store}`` — the
    decide-before-extract numbers."""
    entries = zip_entries(payload)
    return {
        "n_entries": len(entries),
        "total_compressed": sum(e["compressed_size"] for e in entries),
        "total_uncompressed": sum(
            e["uncompressed_size"] for e in entries
        ),
        "n_deflate": sum(1 for e in entries if e["method"] == 8),
        "n_store": sum(1 for e in entries if e["method"] == 0),
    }


def zip_extract(
    payload: bytes, max_output: int = _MAX_EXPANSION
) -> list[tuple[str, bytes]]:
    """Extract all entries → (name, data) pairs. The central
    directory's declared uncompressed total gates the work BEFORE
    any inflate runs, then each entry's actual output is capped at
    its declared size (a lying header cannot blow past the budget)
    and CRC-checked."""
    entries = zip_entries(payload)
    declared = sum(e["uncompressed_size"] for e in entries)
    if declared > max_output:
        raise ValueError(
            f"declared expansion {declared} exceeds the "
            f"{max_output}-byte budget"
        )
    d, out = payload, []
    for e in entries:
        pos = e["local_offset"]
        if pos + 30 > len(d):
            raise ValueError("local header exceeds payload")
        sig, _v, _f, method, _t, _dt, _crc, _cs, _us, nlen, elen = (
            struct.unpack_from("<IHHHHHIIIHH", d, pos)
        )
        if sig != _LOCAL_SIG:
            raise ValueError(f"bad local header signature at {pos}")
        start = pos + 30 + nlen + elen
        blob = d[start : start + e["compressed_size"]]
        if len(blob) != e["compressed_size"]:
            raise ValueError("entry data exceeds payload")
        if method == 0:
            data = blob
        elif method == 8:
            try:
                do = zlib.decompressobj(-15)
                # max_length=0 means UNLIMITED to zlib — a declared
                # size of 0 must still cap the inflate, so floor the
                # limit at 1 and let the size check below reject
                data = do.decompress(
                    blob, e["uncompressed_size"] or 1
                )
                if do.unconsumed_tail:
                    raise ValueError(
                        f"entry {e['name']!r} inflates past its "
                        "declared size"
                    )
                if not do.eof:
                    raise ValueError(
                        f"truncated deflate in {e['name']!r}"
                    )
            except zlib.error as exc:
                raise ValueError(
                    f"corrupt deflate in {e['name']!r}: {exc}"
                ) from exc
        else:
            raise ValueError(
                f"unsupported ZIP method {method} in {e['name']!r}"
            )
        if len(data) != e["uncompressed_size"]:
            raise ValueError(
                f"entry {e['name']!r} size mismatch: "
                f"{len(data)} != {e['uncompressed_size']}"
            )
        if zlib.crc32(data) != e["crc32"]:
            raise ValueError(f"CRC mismatch in {e['name']!r}")
        out.append((e["name"], data))
    return out


# ---------------------------------------------------------------------------
# TAR (POSIX.1-1988 ustar)
# ---------------------------------------------------------------------------
def _octal(n: int, width: int) -> bytes:
    return (("%0" + str(width - 1) + "o") % n).encode() + b"\0"


def _tar_header(name_b: bytes, size: int, typeflag: bytes) -> bytes:
    hdr = bytearray(512)
    hdr[0 : len(name_b)] = name_b
    hdr[100:108] = _octal(0o644, 8)
    hdr[108:116] = _octal(0, 8)
    hdr[116:124] = _octal(0, 8)
    hdr[124:136] = _octal(size, 12)
    hdr[136:148] = _octal(1735689600, 12)  # 2025-01-01 UTC
    hdr[148:156] = b" " * 8  # checksum blanked for the sum
    hdr[156:157] = typeflag
    hdr[257:263] = b"ustar\0"
    hdr[263:265] = b"00"
    chk = sum(hdr)
    hdr[148:156] = ("%06o" % chk).encode() + b"\0 "
    return bytes(hdr)


def make_tar(
    entries: list[tuple[str, bytes]], longnames: str = "gnu"
) -> bytes:
    """ustar TAR bytes from (name, data) pairs (names ending "/"
    become directories). Fixed mtime for reproducible fixtures.
    Names over 100 bytes emit the ``longnames`` mechanism first:
    ``"gnu"`` = a typeflag-L ``././@LongLink`` entry, ``"pax"`` = a
    typeflag-x extended header with a ``path=`` record — the two
    forms real tarballs actually use."""
    blocks = []

    def emit(name_b: bytes, data: bytes, typeflag: bytes) -> None:
        blocks.append(_tar_header(name_b, len(data), typeflag))
        blocks.append(data)
        blocks.append(b"\0" * (-len(data) % 512))

    for name, data in entries:
        nb = name.encode()
        if len(nb) > 100:
            if longnames == "gnu":
                emit(b"././@LongLink", nb + b"\0", b"L")
            elif longnames == "pax":
                body = b" path=" + nb + b"\n"
                # pax record length prefix counts ITSELF (POSIX.1:
                # one fixed-point adjustment suffices)
                total = len(body) + len(str(len(body)))
                if len(str(total)) != len(str(len(body))):
                    total = len(body) + len(str(total))
                emit(b"PaxHeader", str(total).encode() + body, b"x")
            else:
                raise ValueError(
                    f"unknown longnames mechanism {longnames!r}"
                )
            nb = nb[:100]
        typeflag = b"5" if name.endswith("/") else b"0"
        emit(nb, data, typeflag)
    blocks.append(b"\0" * 1024)
    return b"".join(blocks)


def _pax_records(data: bytes) -> dict:
    """POSIX.1 pax extended-header body → {key: value}. Each record
    is ``"<len> <key>=<value>\\n"`` where ``len`` counts the whole
    record including itself."""
    out, pos = {}, 0
    while pos < len(data):
        sp = data.find(b" ", pos)
        if sp < 0:
            raise ValueError("malformed pax record (no length)")
        try:
            rec_len = int(data[pos:sp])
        except ValueError as exc:
            raise ValueError("bad pax record length") from exc
        if rec_len <= sp - pos or pos + rec_len > len(data):
            raise ValueError("pax record length out of range")
        rec = data[sp + 1 : pos + rec_len]
        if not rec.endswith(b"\n"):
            raise ValueError("pax record lacks newline terminator")
        key, eq, value = rec[:-1].partition(b"=")
        if not eq:
            raise ValueError("pax record lacks '='")
        out[key.decode("utf-8")] = value.decode("utf-8")
        pos += rec_len
    return out


def tar_entries(payload: bytes) -> list[dict]:
    """Header walk → one dict per entry ``{name, size, typeflag,
    offset}``. Verifies the ustar magic and the space-blanked
    checksum on every header (the checksum is what separates a TAR
    from 512 bytes of coincidence); stops at the two-zero-block
    terminator or end of payload.

    Long names resolve through all three real-world mechanisms
    (round 10): the ustar 155-byte ``prefix`` field, GNU typeflag-L
    ``././@LongLink`` entries, and pax typeflag-x extended headers
    (``path=``/``size=`` records; typeflag-g globals apply to all
    subsequent entries). Sizes in GNU base-256 form (high bit set)
    decode too — octal caps out at 8 GiB, and corpus-scale members
    exceed it."""
    d = payload
    out, pos = [], 0
    pending_name: str | None = None  # from 'L' or pax path=
    pending_size: int | None = None  # from pax size=
    global_pax: dict = {}
    while pos + 512 <= len(d):
        hdr = d[pos : pos + 512]
        if hdr == b"\0" * 512:
            break  # terminator
        if hdr[257:262] != b"ustar":
            raise ValueError(f"missing ustar magic at offset {pos}")
        stored = hdr[148:156]
        try:
            chk = int(stored.rstrip(b"\0 ").lstrip(b" "), 8)
        except ValueError as exc:
            raise ValueError(
                f"bad checksum field at offset {pos}"
            ) from exc
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if chk != calc:
            raise ValueError(
                f"checksum mismatch at offset {pos}: "
                f"{chk} != {calc}"
            )
        # name field decoded LAZILY: when a long-name mechanism
        # overrides it, the 100-byte field may hold a byte-truncated
        # multibyte name that must not be strict-decoded (review r10
        # pass 4 — valid GNU/pax archives were rejected)
        name_b = hdr[:100].split(b"\0", 1)[0]
        if hdr[124] & 0x80:  # GNU base-256 size
            size = int.from_bytes(hdr[124:136], "big") - (
                0x80 << 88
            )
            if size < 0:
                raise ValueError(
                    f"negative base-256 size at offset {pos}"
                )
        else:
            size_f = hdr[124:136].rstrip(b"\0 ").lstrip(b" ")
            try:
                size = int(size_f, 8) if size_f else 0
            except ValueError as exc:
                raise ValueError(
                    f"bad size field at offset {pos}"
                ) from exc
        typeflag = chr(hdr[156]) if hdr[156] else "0"
        data_end = pos + 512 + size
        if data_end > len(d):
            raise ValueError(
                f"entry {name_b!r} data exceeds payload"
            )
        data_next = pos + 512 + size + (-size % 512)
        if typeflag == "L":  # GNU long name for the NEXT entry
            pending_name = (
                d[pos + 512 : data_end].split(b"\0", 1)[0]
                .decode("utf-8", errors="strict")
            )
            pos = data_next
            continue
        if typeflag == "K":  # GNU long LINKNAME: metadata for the
            # next entry's linkname, which this walk does not
            # report — consume it WITHOUT touching pending_name
            # (review r10 pass 4: it leaked as a phantom entry)
            pos = data_next
            continue
        if typeflag in ("x", "g"):  # pax extended header
            recs = _pax_records(d[pos + 512 : data_end])
            if typeflag == "g":
                global_pax.update(recs)
            else:
                if "path" in recs:
                    pending_name = recs["path"]
                if "size" in recs:
                    try:
                        pending_size = int(recs["size"])
                    except ValueError as exc:
                        raise ValueError(
                            "bad pax size record"
                        ) from exc
            pos = data_next
            continue
        if pending_name is not None:
            name = pending_name
        elif "path" in global_pax:
            name = global_pax["path"]
        else:
            name = name_b.decode("utf-8", errors="strict")
            # ustar prefix field (155 bytes at 345) joins with '/'
            # — POSIX magic+version ONLY: GNU headers ('ustar  ')
            # keep atime/ctime at that offset (review r10 pass 4)
            if hdr[257:263] == b"ustar\0" and hdr[263:265] == b"00":
                prefix = hdr[345:500].split(b"\0", 1)[0]
                if prefix:
                    name = (
                        prefix.decode("utf-8", errors="strict")
                        + "/" + name
                    )
        over = pending_size
        if over is None and "size" in global_pax:
            try:
                over = int(global_pax["size"])
            except ValueError as exc:
                raise ValueError("bad pax size record") from exc
        if over is not None:
            size = over
            data_end = pos + 512 + size
            if data_end > len(d):
                raise ValueError(
                    f"entry {name!r} pax size exceeds payload"
                )
            data_next = pos + 512 + size + (-size % 512)
        out.append(
            {"name": name, "size": size, "typeflag": typeflag,
             "offset": pos}
        )
        pending_name = pending_size = None
        pos = data_next
    return out


def tar_meta(payload: bytes) -> dict:
    """Header-only TAR triage: ``{n_entries, n_files, n_dirs,
    total_size}``."""
    entries = tar_entries(payload)
    return {
        "n_entries": len(entries),
        "n_files": sum(1 for e in entries if e["typeflag"] == "0"),
        "n_dirs": sum(1 for e in entries if e["typeflag"] == "5"),
        "total_size": sum(e["size"] for e in entries),
    }


# ---------------------------------------------------------------------------
# gzip (RFC 1952)
# ---------------------------------------------------------------------------
def make_gzip(
    data: bytes, name: str | None = None, mtime: int = 1735689600
) -> bytes:
    """One gzip member with an optional FNAME field (zlib's wbits=31
    writer never emits one, so the header-field parse needs its own
    writer to be testable)."""
    flg = 0x08 if name is not None else 0
    head = struct.pack("<2sBBIBB", b"\x1f\x8b", 8, flg, mtime, 0, 255)
    if name is not None:
        head += name.encode("latin-1") + b"\0"
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = co.compress(data) + co.flush()
    tail = struct.pack("<II", zlib.crc32(data), len(data) & 0xFFFFFFFF)
    return head + body + tail


def gzip_isize_hint(payload: bytes) -> int:
    """ADVISORY uncompressed-size hint: the final member's ISIZE
    trailer (RFC 1952 — mod 2^32, attacker-controlled, and only the
    LAST member's when members are concatenated, since deflate
    streams carry no length field and member boundaries are
    unknowable without inflating). Zero-cost; use for sizing
    heuristics, never for allocation decisions."""
    # structural minimum: 10-byte header + ≥2-byte deflate + 8-byte
    # trailer (review r10 pass 3: 18-19 bytes would read the hint
    # from CRC/deflate bytes)
    if payload[:2] != b"\x1f\x8b" or len(payload) < 20:
        raise ValueError("not a gzip payload")
    return int.from_bytes(payload[-4:], "little")


def gzip_meta(
    payload: bytes, max_output: int = _MAX_EXPANSION
) -> dict:
    """gzip triage: first-member header fields (mtime, os, fname,
    ftext) + whole-payload member walk → ``{n_members, mtime, os,
    name, total_uncompressed}``.

    Unlike the ZIP/TAR/zstd sniffs this is NOT header-only: deflate
    streams carry no length field, so member boundaries — and
    therefore an honest count and size — are unknowable without
    inflating (ISIZE is mod-2^32, attacker-controlled, and
    last-member-only; see :func:`gzip_isize_hint` for the zero-cost
    advisory form). The walk runs under the absolute ``max_output``
    budget, which bounds the triage cost a fleet pays per
    payload."""
    d = payload
    if d[:2] != b"\x1f\x8b":
        raise ValueError("not a gzip payload")
    if len(d) < 10:
        raise ValueError("truncated gzip header")
    cm, flg, mtime, _xfl, os_byte = struct.unpack_from("<BBIBB", d, 2)
    if cm != 8:
        raise ValueError(f"unsupported gzip method {cm}")
    if flg & 0xE0:
        raise ValueError(f"reserved gzip FLG bits set: {flg:#x}")
    pos = 10
    if flg & 0x04:  # FEXTRA
        if pos + 2 > len(d):
            raise ValueError("truncated FEXTRA length")
        xlen = struct.unpack_from("<H", d, pos)[0]
        pos += 2 + xlen
    name = None
    if flg & 0x08:  # FNAME
        nul = d.find(b"\0", pos)
        if nul < 0:
            raise ValueError("unterminated FNAME")
        name = d[pos:nul].decode("latin-1")
        pos = nul + 1
    from bergloom_spark.operators.warc import split_gzip_members

    members = split_gzip_members(d, max_output=max_output)
    return {
        "n_members": len(members),
        "mtime": mtime,
        "os": os_byte,
        "name": name,
        "ftext": bool(flg & 0x01),
        "total_uncompressed": sum(len(m) for m in members),
    }


# ---------------------------------------------------------------------------
# Zstandard frames (RFC 8878) — header-only
# ---------------------------------------------------------------------------
_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
_SKIPPABLE_LO = 0x184D2A50


def make_zstd_frame(
    content_size: int | None,
    n_blocks: int = 1,
    checksum: bool = False,
    dict_id: int = 0,
) -> bytes:
    """One structurally-valid zstd frame whose blocks are RAW
    (Block_Type=0) zero bytes — no entropy coding, so the writer
    needs no zstd library and the header fields are still the real
    spec layout a sniffing reader must walk. ``content_size=None``
    omits the Frame_Content_Size field (single_segment off)."""
    fhd = 0
    if checksum:
        fhd |= 1 << 2
    dict_bytes = b""
    if dict_id:
        did_len = 1 if dict_id < 1 << 8 else (
            2 if dict_id < 1 << 16 else 4
        )
        fhd |= {1: 1, 2: 2, 4: 3}[did_len]
        dict_bytes = dict_id.to_bytes(did_len, "little")
    # FCS encoding (RFC 8878 §3.1.1.1.1): flag 0 = absent (or a
    # 1-byte field when single_segment), flag 1 = 2 bytes storing
    # size − 256, flag 2/3 = 4/8 raw bytes
    fcs_bytes = b""
    if content_size is not None:
        if content_size < 256:
            fhd |= 1 << 5  # single_segment: 1-byte FCS, no window
            fcs_bytes = content_size.to_bytes(1, "little")
        elif content_size - 256 < 1 << 16:
            fhd |= 1 << 6
            fcs_bytes = (content_size - 256).to_bytes(2, "little")
        elif content_size < 1 << 32:
            fhd |= 2 << 6
            fcs_bytes = content_size.to_bytes(4, "little")
        else:
            fhd |= 3 << 6
            fcs_bytes = content_size.to_bytes(8, "little")
    window = b"" if fhd & (1 << 5) else b"\x00"  # exponent 0
    out = _ZSTD_MAGIC + bytes([fhd]) + window + dict_bytes + fcs_bytes
    total = content_size if content_size is not None else 1024
    left = total
    for i in range(n_blocks):
        size = left // (n_blocks - i) if n_blocks - i else 0
        left -= size
        last = 1 if i == n_blocks - 1 else 0
        header = last | (0 << 1) | (size << 3)  # RAW block
        out += header.to_bytes(3, "little") + b"\x00" * size
    if checksum:
        out += b"\x00\x00\x00\x00"  # stub XXH64 low bytes
    return out


def zstd_meta(payload: bytes) -> dict:
    """Header-only zstd triage (RFC 8878): walks every frame in the
    payload — data frames (magic 0x28B52FFD: frame-header fields,
    then the block chain by Block_Size to find the next frame) and
    skippable frames (magics 0x184D2A50-5F, skipped by their length
    field) → ``{n_frames, n_skippable, total_content_size,
    has_checksum, dict_id, window_log}``. ``total_content_size`` is
    None when any data frame omits Frame_Content_Size (the honest
    answer — RAW/RLE/compressed block walks know sizes, but a
    compressed block's decoded size is not in its header).
    Never decompresses anything."""
    d = payload
    if d[:4] != _ZSTD_MAGIC and not (
        len(d) >= 4
        and _SKIPPABLE_LO
        <= int.from_bytes(d[:4], "little")
        <= _SKIPPABLE_LO + 0xF
    ):
        raise ValueError("not a zstd payload")
    pos = 0
    n_frames = n_skippable = 0
    total: int | None = 0
    has_checksum = False
    dict_id = 0
    window_log = None
    while pos < len(d):
        if pos + 4 > len(d):
            raise ValueError("truncated zstd frame magic")
        magic = int.from_bytes(d[pos : pos + 4], "little")
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_LO + 0xF:
            if pos + 8 > len(d):
                raise ValueError("truncated skippable frame header")
            size = int.from_bytes(d[pos + 4 : pos + 8], "little")
            if pos + 8 + size > len(d):
                raise ValueError("skippable frame exceeds payload")
            n_skippable += 1
            pos += 8 + size
            continue
        if d[pos : pos + 4] != _ZSTD_MAGIC:
            raise ValueError(
                f"bad zstd magic at offset {pos}"
            )
        pos += 4
        if pos >= len(d):
            raise ValueError("truncated frame header descriptor")
        fhd = d[pos]
        pos += 1
        single_segment = bool(fhd & (1 << 5))
        if fhd & (1 << 3):
            raise ValueError("reserved FHD bit set")
        if not single_segment:
            if pos >= len(d):
                raise ValueError("truncated window descriptor")
            wd = d[pos]
            window_log = 10 + (wd >> 3)
            pos += 1
        did_flag = fhd & 0x3
        did_len = (0, 1, 2, 4)[did_flag]
        if pos + did_len > len(d):
            raise ValueError("truncated Dictionary_ID")
        if did_len:
            dict_id = int.from_bytes(d[pos : pos + did_len],
                                     "little")
        pos += did_len
        fcs_flag = fhd >> 6
        fcs_len = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
        fcs = None
        if fcs_len:
            if pos + fcs_len > len(d):
                raise ValueError("truncated Frame_Content_Size")
            fcs = int.from_bytes(d[pos : pos + fcs_len], "little")
            if fcs_len == 2:
                fcs += 256
            pos += fcs_len
        if total is not None:
            total = total + fcs if fcs is not None else None
        has_checksum = has_checksum or bool(fhd & (1 << 2))
        # block chain: 3-byte headers, Block_Size counts payload
        # bytes for RAW/compressed, 1 for RLE
        while True:
            if pos + 3 > len(d):
                raise ValueError("truncated block header")
            bh = int.from_bytes(d[pos : pos + 3], "little")
            last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
            if btype == 3:
                raise ValueError("reserved block type")
            pos += 3
            consumed = 1 if btype == 1 else bsize
            if pos + consumed > len(d):
                raise ValueError("block exceeds payload")
            pos += consumed
            if last:
                break
        if fhd & (1 << 2):
            if pos + 4 > len(d):
                raise ValueError("truncated content checksum")
            pos += 4
        n_frames += 1
        if n_frames + n_skippable > 1 << 20:
            raise ValueError("frame count exceeds the cap")
    return {
        "n_frames": n_frames,
        "n_skippable": n_skippable,
        "total_content_size": total,
        "has_checksum": has_checksum,
        "dict_id": dict_id,
        "window_log": window_log,
    }


# ---------------------------------------------------------------------------
# Unified dispatch + Spark seam
# ---------------------------------------------------------------------------
def archive_meta(payload: bytes) -> dict:
    """ANY archive container → uniform triage
    ``{container, n_entries, total_uncompressed}`` — the bundle twin
    of :func:`bergloom_spark.operators.avcodec.audio_meta`'s
    dispatch. ZIP by its full 4-byte signatures (APPNOTE 4.3.6 —
    local PK\\x03\\x04, empty-archive EOCD PK\\x05\\x06, spanning
    marker PK\\x07\\x08; ADVICE r10: bare ``PK`` misrouted a TAR
    whose first entry name starts with 'PK', e.g. 'PKG/readme.txt'),
    gzip by RFC 1952 magic, TAR by the ustar magic at offset 257.
    Unknown magic raises ValueError."""
    d = payload
    if d[:4] in (b"PK\x03\x04", b"PK\x05\x06", b"PK\x07\x08"):
        m = zip_meta(d)
        return {
            "container": "zip",
            "n_entries": m["n_entries"],
            "total_uncompressed": m["total_uncompressed"],
        }
    if d[:2] == b"\x1f\x8b":
        m = gzip_meta(d)
        return {
            "container": "gzip",
            "n_entries": m["n_members"],
            "total_uncompressed": m["total_uncompressed"],
        }
    if d[:4] == _ZSTD_MAGIC or (
        len(d) >= 4
        and _SKIPPABLE_LO
        <= int.from_bytes(d[:4], "little")
        <= _SKIPPABLE_LO + 0xF
    ):
        m = zstd_meta(d)
        return {
            "container": "zstd",
            "n_entries": m["n_frames"],
            # honest None when any frame omits Frame_Content_Size
            "total_uncompressed": m["total_content_size"],
        }
    if d[257:262] == b"ustar":
        m = tar_meta(d)
        return {
            "container": "tar",
            "n_entries": m["n_entries"],
            "total_uncompressed": m["total_size"],
        }
    raise ValueError(
        f"unknown archive magic: {bytes(d[:4])!r}"
    )


_ENTRY_SCHEMA = (
    "doc_id long, container string, entry_index int, name string, "
    "size long, is_dir boolean"
)


def archive_entries(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode binary ZIP/TAR columns into one row per archive entry
    (name, declared size) — header-only, nothing decompressed, so
    cost is independent of payload expansion. Map-only Arrow-batched
    kernel over the scan partitioning."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = bytes(payload)
                # full 4-byte ZIP signatures (ADVICE r10 / r11
                # self-review: bare b"PK" misrouted a TAR whose
                # first entry name starts with 'PK' — here it would
                # crash the whole stage, not just mislabel a row)
                if d[:4] in (b"PK\x03\x04", b"PK\x05\x06",
                             b"PK\x07\x08"):
                    for i, e in enumerate(zip_entries(d)):
                        rows.append(
                            (int(doc_id), "zip", i, e["name"],
                             e["uncompressed_size"],
                             e["name"].endswith("/"))
                        )
                elif d[257:262] == b"ustar":
                    for i, e in enumerate(tar_entries(d)):
                        rows.append(
                            (int(doc_id), "tar", i, e["name"],
                             e["size"], e["typeflag"] == "5")
                        )
                else:
                    raise ValueError(
                        f"unknown archive magic: {d[:4]!r}"
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "container", "entry_index",
                         "name", "size", "is_dir"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, _ENTRY_SCHEMA
    )
