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

__all__ = [
    "ogg_vorbis_meta",
    "ogg_opus_meta",
    "ogg_meta",
    "make_ogg_vorbis_stream",
    "make_ogg_opus_stream",
]


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


def _final_page(d: bytes, first: dict) -> tuple:
    """Walk the remaining pages by declared sizes to the end of the
    physical stream and return ``(final_page, n_pages)``. Only the
    first and last pages are CRC-verified (the two the metadata
    actually comes from); middle pages are walked by size only. The
    final page must be EOS and carry a real granule position."""
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
    if page["granule"] == (1 << 64) - 1:  # -1: no packet boundary
        raise ValueError("final Ogg page carries no granule position")
    return page, n_pages


def _bos_page(d: bytes) -> dict:
    first = _parse_page(d, 0, verify_crc=True)
    if not first["header_type"] & 0x02:
        raise ValueError("first Ogg page is not a stream begin (BOS)")
    return first


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
    return _vorbis_meta(payload, _bos_page(payload))


def _vorbis_meta(d: bytes, first: dict) -> dict:
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
    page, n_pages = _final_page(d, first)
    total = page["granule"]
    return {
        "sample_rate": rate,
        "channels": channels,
        "total_samples": total,
        "duration_ms": total * 1000 // rate,
        "nominal_bitrate": nominal,
        "n_pages": n_pages,
    }


def ogg_opus_meta(payload: bytes) -> dict:
    """Ogg-Opus bytes (RFC 7845) → corpus-triage metadata without
    decoding audio: ``{sample_rate, channels, pre_skip,
    total_samples, duration_ms, n_pages}``.

    The OpusHead packet on the BOS page carries channels, pre-skip,
    and the (informational) input sample rate — 0 means unknown and
    reports as Opus's native 48000. Granule positions count 48 kHz
    samples INCLUDING pre-skip, so playable samples = EOS granule −
    pre-skip and ``duration_ms = playable · 1000 // 48000`` (the
    spec's own arithmetic, independent of the input rate). Raises
    ValueError on anything malformed."""
    return _opus_meta(payload, _bos_page(payload))


def _opus_meta(d: bytes, first: dict) -> dict:
    body = first["body"]
    if len(body) < 19 or body[:8] != b"OpusHead":
        raise ValueError("first packet is not an OpusHead header")
    if body[8] >> 4 != 0:
        raise ValueError(f"unsupported OpusHead major version {body[8]}")
    channels = body[9]
    pre_skip = int.from_bytes(body[10:12], "little")
    input_rate = int.from_bytes(body[12:16], "little")
    if channels == 0:
        raise ValueError("OpusHead declares zero channels")
    family = body[18]
    # RFC 7845 §5.1.1: family 0 is restricted to mono/stereo; any
    # other family carries a channel-mapping table of 2+channels
    # bytes (review r10 — the writer previously emitted family-0
    # headers for >2 channels, which no real muxer produces)
    if family == 0:
        if channels > 2:
            raise ValueError(
                f"OpusHead mapping family 0 allows 1-2 channels, "
                f"got {channels}"
            )
    elif len(body) < 19 + 2 + channels:
        raise ValueError(
            "OpusHead mapping table truncated for family "
            f"{family} x {channels} channels"
        )
    page, n_pages = _final_page(d, first)
    granule = page["granule"]
    if granule < pre_skip:
        raise ValueError(
            f"EOS granule {granule} below pre-skip {pre_skip}"
        )
    playable = granule - pre_skip
    return {
        "sample_rate": input_rate or 48000,
        "channels": channels,
        "pre_skip": pre_skip,
        "total_samples": playable,
        "duration_ms": playable * 1000 // 48000,
        "n_pages": n_pages,
    }


def ogg_meta(payload: bytes) -> dict:
    """ANY Ogg audio stream → uniform triage metadata — BOS-packet
    magic dispatch between Vorbis (``\\x01vorbis``) and Opus
    (``OpusHead``), the two codecs that carry essentially all
    real-world Ogg audio. Adds ``codec`` to the codec-specific
    fields. The BOS page is parsed (and CRC-verified) ONCE and handed
    to the codec reader — the dominant per-item cost in the triage
    path is the pure-Python page CRC, so dispatch must not double it
    (review r10)."""
    d = payload
    first = _bos_page(d)
    body = first["body"]
    if body[:8] == b"OpusHead":
        out = _opus_meta(d, first)
        out["codec"] = "opus"
        return out
    if len(body) >= 7 and body[0] == 1 and body[1:7] == b"vorbis":
        out = _vorbis_meta(d, first)
        out["codec"] = "vorbis"
        return out
    raise ValueError(
        f"Ogg BOS packet is neither Vorbis nor Opus: {body[:8]!r}"
    )


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


def make_ogg_opus_stream(
    channels: int,
    playable_samples: int,
    pre_skip: int = 312,
    input_sample_rate: int = 48000,
    n_audio_pages: int = 1,
    audio_bytes_per_page: int = 64,
) -> bytes:
    """Synthetic Ogg-Opus container (RFC 7845 layout) for tests and
    oracles: OpusHead on a BOS page, an OpusTags comment page
    (granule 0, as the spec requires for header pages), then
    ``n_audio_pages`` of opaque packet bytes with granule positions
    rising to ``pre_skip + playable_samples`` on the EOS page."""
    if not (1 <= channels <= 255):
        raise ValueError("bad channel count")
    if playable_samples < 0 or pre_skip < 0:
        raise ValueError("negative sample counts")
    if n_audio_pages < 1:
        raise ValueError("need at least one audio page")
    head = (
        b"OpusHead"
        + bytes((1, channels))
        + pre_skip.to_bytes(2, "little")
        + input_sample_rate.to_bytes(4, "little")
        + (0).to_bytes(2, "little")  # output gain
    )
    if channels <= 2:
        head += bytes((0,))  # mapping family 0 (mono/stereo only)
    else:
        # RFC 7845 §5.1.1: >2 channels require family 1 + a mapping
        # table (stream count, coupled count, per-channel mapping)
        head += bytes((1, channels, 0)) + bytes(range(channels))
    tags = b"OpusTags" + (5).to_bytes(4, "little") + b"synth" \
        + (0).to_bytes(4, "little")
    out = bytearray(_make_page(head, 0, 0, 0x02))
    out += _make_page(tags, 0, 1, 0x00)
    total = pre_skip + playable_samples
    for k in range(n_audio_pages):
        is_last = k == n_audio_pages - 1
        granule = (
            total if is_last
            else pre_skip + playable_samples * (k + 1) // n_audio_pages
        )
        body = bytes((k % 251 + 1,)) * audio_bytes_per_page
        out += _make_page(
            body, granule, k + 2, 0x04 if is_last else 0x00
        )
    return bytes(out)
