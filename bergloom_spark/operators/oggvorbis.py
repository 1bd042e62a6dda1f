"""Ogg-Vorbis corpus-triage metadata sniff (round 9 — extends the
header-only triage battery of ``avcodec.mp3_meta`` / ``flac_meta`` to
the remaining common audio container).

Implemented from the public Ogg framing spec (RFC 3533) and the
Vorbis I specification only. A triage pass needs sample rate /
channels / duration, not PCM: the Vorbis identification header (the
first packet of the first page) carries rate/channels, and the LAST
Ogg page's granule position is, for Vorbis, the total PCM sample
count — so exact duration falls out of two header reads and a
backward page scan, no MDCT anywhere. Full Vorbis decode stays
honestly out of scope (floor/residue codebooks are far past the
triage point).

Page CRCs are verified for the pages the sniffer actually reads
(first and last), using the Ogg CRC-32 (poly 0x04C11DB7, init 0,
no reflection, no final xor) — a corrupted header page raises
ValueError rather than returning garbage metadata.

Scale shape: executor-side kernel for Arrow-batched ``mapInPandas``
(same seam as every codec here) — header walks only, microseconds per
item independent of payload size; payload bytes never key a shuffle.
"""

from __future__ import annotations

import struct

__all__ = ["ogg_vorbis_meta", "make_ogg_vorbis_stream"]


def _crc_table() -> list:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
        table.append(r)
    return table


_CRC_TABLE = _crc_table()


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[(crc >> 24) ^ b]
    return crc


def _parse_page(d: bytes, pos: int, verify_crc: bool) -> dict:
    """One Ogg page at ``pos`` → header fields + body + total size."""
    if d[pos : pos + 4] != b"OggS":
        raise ValueError("not an Ogg page (missing OggS capture)")
    if pos + 27 > len(d):
        raise ValueError("truncated Ogg page header")
    if d[pos + 4] != 0:
        raise ValueError(f"unsupported Ogg version {d[pos + 4]}")
    header_type = d[pos + 5]
    granule = int.from_bytes(d[pos + 6 : pos + 14], "little")
    serial = int.from_bytes(d[pos + 14 : pos + 18], "little")
    seq = int.from_bytes(d[pos + 18 : pos + 22], "little")
    crc = int.from_bytes(d[pos + 22 : pos + 26], "little")
    nseg = d[pos + 26]
    seg_end = pos + 27 + nseg
    if seg_end > len(d):
        raise ValueError("truncated Ogg segment table")
    lacing = d[pos + 27 : seg_end]
    body_len = sum(lacing)
    if seg_end + body_len > len(d):
        raise ValueError("truncated Ogg page body")
    body = d[seg_end : seg_end + body_len]
    if verify_crc:
        page = bytearray(d[pos : seg_end + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
    return {
        "header_type": header_type,
        "granule": granule,
        "serial": serial,
        "seq": seq,
        "body": body,
        "size": 27 + nseg + body_len,
    }


def ogg_vorbis_meta(payload: bytes) -> dict:
    """Ogg-Vorbis bytes → corpus-triage metadata without decoding
    audio: ``{sample_rate, channels, total_samples, duration_ms,
    nominal_bitrate, n_pages}``.

    Reads the Vorbis identification header from the first page
    (CRC-verified), walks page boundaries by lacing totals (no byte
    scanning — page sizes are declared), and takes the LAST page's
    granule position as the total sample count (the Vorbis I
    granule-position contract; -1/absent granules on the last page
    raise, as does a non-EOS final page). Raises ValueError on
    anything malformed."""
    d = payload
    first = _parse_page(d, 0, verify_crc=True)
    if not first["header_type"] & 0x02:
        raise ValueError("first Ogg page is not a stream begin (BOS)")
    body = first["body"]
    if len(body) < 30 or body[0] != 1 or body[1:7] != b"vorbis":
        raise ValueError("first packet is not a Vorbis id header")
    version = int.from_bytes(body[7:11], "little")
    if version != 0:
        raise ValueError(f"unsupported Vorbis version {version}")
    channels = body[11]
    rate = int.from_bytes(body[12:16], "little")
    nominal = int.from_bytes(body[20:24], "little", signed=True)
    if channels == 0 or rate == 0:
        raise ValueError("Vorbis id header has zero channels/rate")
    # walk the remaining pages by declared sizes to the end of the
    # physical stream; only the first and last pages are CRC-verified
    # (the two the metadata actually comes from), middle pages are
    # walked by size only
    pos = first["size"]
    n_pages = 1
    page, last_pos = first, 0
    while pos < len(d):
        page = _parse_page(d, pos, verify_crc=False)
        last_pos = pos
        n_pages += 1
        pos += page["size"]
    if n_pages > 1:
        _parse_page(d, last_pos, verify_crc=True)
    if not page["header_type"] & 0x04:
        raise ValueError("final Ogg page is not end-of-stream (EOS)")
    total = page["granule"]
    if total == (1 << 64) - 1:  # -1: page contains no packet boundary
        raise ValueError("final Ogg page carries no granule position")
    return {
        "sample_rate": rate,
        "channels": channels,
        "total_samples": total,
        "duration_ms": total * 1000 // rate,
        "nominal_bitrate": nominal,
        "n_pages": n_pages,
    }


def _make_page(
    body: bytes,
    granule: int,
    seq: int,
    header_type: int,
    serial: int = 0x42,
) -> bytes:
    """One spec-valid Ogg page (255-byte lacing, real CRC)."""
    lacing = bytearray()
    rem = len(body)
    while rem >= 255:
        lacing.append(255)
        rem -= 255
    lacing.append(rem)  # final short (or 0) lacing value
    hdr = (
        b"OggS\x00"
        + bytes((header_type,))
        + granule.to_bytes(8, "little")
        + serial.to_bytes(4, "little")
        + seq.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + bytes((len(lacing),))
        + bytes(lacing)
    )
    page = bytearray(hdr + body)
    crc = _ogg_crc(bytes(page))
    page[22:26] = crc.to_bytes(4, "little")
    return bytes(page)


def make_ogg_vorbis_stream(
    sample_rate: int,
    channels: int,
    total_samples: int,
    nominal_bitrate: int = 0,
    n_audio_pages: int = 1,
    audio_bytes_per_page: int = 64,
) -> bytes:
    """Synthetic Ogg-Vorbis container for tests/oracles: a real id
    header on a BOS page, ``n_audio_pages`` pages of opaque audio
    bytes the sniffer must never decode, granule positions increasing
    to ``total_samples`` on the EOS page. Spec-valid framing with real
    page CRCs."""
    if not (1 <= channels <= 255) or sample_rate <= 0:
        raise ValueError("bad channels/sample rate")
    if n_audio_pages < 1:
        raise ValueError("need at least one audio page")
    id_header = (
        b"\x01vorbis"
        + (0).to_bytes(4, "little")          # version
        + bytes((channels,))
        + sample_rate.to_bytes(4, "little")
        + (0).to_bytes(4, "little", signed=True)   # max bitrate
        + nominal_bitrate.to_bytes(4, "little", signed=True)
        + (0).to_bytes(4, "little", signed=True)   # min bitrate
        + bytes((0xB8,))                     # blocksizes (2^8 / 2^11)
        + bytes((0x01,))                     # framing bit
    )
    out = bytearray(_make_page(id_header, 0, 0, 0x02))
    for k in range(n_audio_pages):
        is_last = k == n_audio_pages - 1
        granule = (
            total_samples
            if is_last
            else total_samples * (k + 1) // n_audio_pages
        )
        body = bytes((k % 251 + 1,)) * audio_bytes_per_page
        out += _make_page(
            body, granule, k + 1, 0x04 if is_last else 0x00
        )
    return bytes(out)
