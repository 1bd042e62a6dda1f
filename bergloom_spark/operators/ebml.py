"""Matroska/WebM header sniff (round 10, verdict r9 stretch #8) —
the second-most-common real-world video/audio container family.

Matroska is an EBML document (RFC 8794): a tree of
(varint id, varint size, body) elements. Corpus triage needs only
two subtrees of the Segment — ``Info`` (TimestampScale + Duration)
and ``Tracks`` (per-TrackEntry type, codec id, video geometry,
audio rate/channels) — so the walk never enters a Cluster; cost is
independent of payload size. Element ids are the published Matroska
registry values; WebM is the same structure with DocType "webm".

Scale shape: header-only, executor-side, map-only kernel for
Arrow-batched ``mapInPandas`` — ``bytes → dict or ValueError``
corpus contract (strictly-advancing cursor, element budget).
"""

from __future__ import annotations

import struct

__all__ = ["mkv_meta", "make_mkv_stream"]

_MAX_ELEMENTS = 4096

# EBML / Matroska element ids (class-encoded, as they appear on wire)
_EBML_HEADER = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQUENCY = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675

_UNKNOWN = -1  # size marker: all-ones varint ("unknown size")


def _read_varint(d: bytes, pos: int, keep_marker: bool) -> tuple:
    """One EBML varint at ``pos`` → ``(value, new_pos)``. Ids keep
    the length-marker bit (registry ids are written marker-included);
    sizes clear it, and an all-ones size decodes to ``_UNKNOWN``."""
    if pos >= len(d):
        raise ValueError("truncated EBML varint")
    first = d[pos]
    if first == 0:
        raise ValueError("invalid EBML varint (leading zero byte)")
    length = 8 - first.bit_length() + 1
    if pos + length > len(d):
        raise ValueError("truncated EBML varint body")
    if keep_marker:
        value = int.from_bytes(d[pos : pos + length], "big")
    else:
        value = first & (0xFF >> length)
        for i in range(1, length):
            value = (value << 8) | d[pos + i]
        if value == (1 << (7 * length)) - 1:
            return _UNKNOWN, pos + length
    return value, pos + length


def _elements(d: bytes, pos: int, end: int, budget: list):
    """Yield ``(id, body_start, body_end)`` for the children of
    ``d[pos:end]``. An unknown-size element extends to the parent's
    end (legal for Segment; accepted generally — the walk is a
    sniffer, not a validator)."""
    while pos < end:
        budget[0] -= 1
        if budget[0] < 0:
            raise ValueError("EBML element budget exceeded")
        eid, p = _read_varint(d, pos, keep_marker=True)
        size, body = _read_varint(d, p, keep_marker=False)
        if size == _UNKNOWN:
            yield eid, body, end
            return
        if body + size > end:
            raise ValueError(
                f"EBML element 0x{eid:X} runs past its parent"
            )
        yield eid, body, body + size
        pos = body + size


def _uint(d: bytes, b: int, e: int) -> int:
    if e - b > 8:
        raise ValueError("EBML uint wider than 8 bytes")
    return int.from_bytes(d[b:e], "big")


def _float(d: bytes, b: int, e: int) -> float:
    n = e - b
    if n == 4:
        v = struct.unpack(">f", d[b:e])[0]
    elif n == 8:
        v = struct.unpack(">d", d[b:e])[0]
    elif n == 0:
        v = 0.0
    else:
        raise ValueError(f"EBML float of width {n} (must be 0/4/8)")
    # inf/NaN float payloads previously reached int() and raised
    # OverflowError — a corpus-contract violation (r10 fuzz campaign,
    # 532k payloads: the only parser findings). Negative durations /
    # rates are equally meaningless triage values.
    if v != v or v in (float("inf"), float("-inf")) or v < 0:
        raise ValueError(f"EBML float {v!r} is not a finite non-negative")
    return v


def _track(d: bytes, b: int, e: int, budget: list) -> dict:
    t = {"type": None, "codec": None, "width": None, "height": None,
         "sample_rate": None, "channels": None}
    for eid, cb, ce in _elements(d, b, e, budget):
        if eid == _TRACK_TYPE:
            t["type"] = _uint(d, cb, ce)
        elif eid == _CODEC_ID:
            t["codec"] = d[cb:ce].decode("latin-1")
        elif eid == _VIDEO:
            for vid, vb, ve in _elements(d, cb, ce, budget):
                if vid == _PIXEL_WIDTH:
                    t["width"] = _uint(d, vb, ve)
                elif vid == _PIXEL_HEIGHT:
                    t["height"] = _uint(d, vb, ve)
        elif eid == _AUDIO:
            for aid, ab, ae in _elements(d, cb, ce, budget):
                if aid == _SAMPLING_FREQUENCY:
                    t["sample_rate"] = _float(d, ab, ae)
                elif aid == _CHANNELS:
                    t["channels"] = _uint(d, ab, ae)
    return t


def mkv_meta(payload: bytes) -> dict:
    """Matroska/WebM bytes → ``{container, duration_ms, n_tracks,
    width, height, video_codec, audio_rate, audio_channels,
    audio_codec}`` from the Segment's Info and Tracks subtrees only
    (Clusters are never entered).

    ``container`` is the EBML DocType (``matroska`` → ``mkv``,
    ``webm`` stays ``webm``). ``duration_ms`` is
    ``int(Duration · TimestampScale // 10⁶)`` with TimestampScale
    defaulting to the spec's 1,000,000 ns; Duration is Matroska's
    float element, absent → None. Geometry/codec come from the first
    video (type 1) track, audio fields from the first audio (type 2)
    track. Raises ValueError on anything malformed."""
    d = payload
    budget = [_MAX_ELEMENTS]
    top = _elements(d, 0, len(d), budget)
    try:
        eid, b, e = next(top)
    except StopIteration:
        raise ValueError("empty EBML payload") from None
    if eid != _EBML_HEADER:
        raise ValueError(
            f"not an EBML payload (leading id 0x{eid:X})"
        )
    doctype = None
    for hid, hb, he in _elements(d, b, e, budget):
        if hid == _DOCTYPE:
            doctype = d[hb:he].decode("latin-1").rstrip("\x00")
    if doctype not in ("matroska", "webm"):
        raise ValueError(f"EBML DocType {doctype!r} is not Matroska")
    segment = None
    for eid, b, e in top:
        if eid == _SEGMENT:
            segment = (b, e)
            break
    if segment is None:
        raise ValueError("Matroska payload has no Segment element")
    scale = 1_000_000
    duration = None
    tracks: list = []
    for eid, b, e in _elements(d, segment[0], segment[1], budget):
        if eid == _CLUSTER:
            break  # headers precede clusters; never walk media data
        if eid == _INFO:
            for iid, ib, ie in _elements(d, b, e, budget):
                if iid == _TIMESTAMP_SCALE:
                    scale = _uint(d, ib, ie)
                    if scale == 0:
                        raise ValueError("TimestampScale is 0")
                elif iid == _DURATION:
                    duration = _float(d, ib, ie)
        elif eid == _TRACKS:
            tracks = [
                _track(d, tb, te, budget)
                for tid, tb, te in _elements(d, b, e, budget)
                if tid == _TRACK_ENTRY
            ]
    video = next((t for t in tracks if t["type"] == 1), None)
    audio = next((t for t in tracks if t["type"] == 2), None)
    if duration is None:
        duration_ms = None
    else:
        ns = duration * scale
        # a FINITE-huge Duration (e.g. 1e307) times the scale can
        # overflow float64 to inf even though _float accepted it —
        # int(inf) would raise OverflowError, not the contract's
        # ValueError (review r10, the gap the fuzz fix left open)
        if ns == float("inf"):
            raise ValueError(
                f"Matroska duration {duration!r} x scale {scale} "
                "overflows"
            )
        duration_ms = int(ns) // 1_000_000
    return {
        "container": "webm" if doctype == "webm" else "mkv",
        "duration_ms": duration_ms,
        "n_tracks": len(tracks),
        "width": video["width"] if video else None,
        "height": video["height"] if video else None,
        "video_codec": video["codec"] if video else None,
        "audio_rate": (
            int(audio["sample_rate"])
            if audio and audio["sample_rate"] is not None else None
        ),
        "audio_channels": audio["channels"] if audio else None,
        "audio_codec": audio["codec"] if audio else None,
    }


# ---------------------------------------------------------------------------
# Synthetic writer (tests + oracles): minimal spec-layout EBML. Sizes
# are written as 1-byte varints where they fit, wider otherwise.
# ---------------------------------------------------------------------------
def _enc_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _enc_size(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:  # all-ones is reserved
            return (n | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _el(eid: int, body: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def make_mkv_stream(
    duration_ms: int | None,
    webm: bool = False,
    timestamp_scale: int = 1_000_000,
    video: tuple | None = ("V_VP9", 640, 360),
    audio: tuple | None = ("A_OPUS", 48000, 2),
    cluster_bytes: int = 0,
    unknown_segment_size: bool = False,
) -> bytes:
    """Synthetic Matroska/WebM for tests/oracles. ``duration_ms`` is
    stored as a float64 Duration element in ``timestamp_scale``-ns
    units — exact when ``duration_ms·10⁶`` divides by the scale and
    the quotient is integer-representable, which every recipe here
    guarantees, so the sniffed value replays as integer arithmetic.
    ``video``/``audio`` are ``(codec, w, h)`` / ``(codec, rate,
    channels)`` or None; ``unknown_segment_size`` writes the
    all-ones Segment size (the common streaming-muxer layout)."""
    header = _el(
        _EBML_HEADER,
        _el_uint(0x4286, 1)  # EBMLVersion
        + _el(_DOCTYPE, (b"webm" if webm else b"matroska"))
        + _el_uint(0x4287, 4),  # DocTypeVersion
    )
    info_body = _el_uint(_TIMESTAMP_SCALE, timestamp_scale)
    if duration_ms is not None:
        units = duration_ms * 1_000_000 / timestamp_scale
        info_body += _el(_DURATION, struct.pack(">d", units))
    info = _el(_INFO, info_body)
    entries = b""
    if video is not None:
        codec, w, h = video
        entries += _el(
            _TRACK_ENTRY,
            _el_uint(_TRACK_TYPE, 1)
            + _el(_CODEC_ID, codec.encode())
            + _el(
                _VIDEO,
                _el_uint(_PIXEL_WIDTH, w) + _el_uint(_PIXEL_HEIGHT, h),
            ),
        )
    if audio is not None:
        codec, rate, channels = audio
        entries += _el(
            _TRACK_ENTRY,
            _el_uint(_TRACK_TYPE, 2)
            + _el(_CODEC_ID, codec.encode())
            + _el(
                _AUDIO,
                _el(_SAMPLING_FREQUENCY, struct.pack(">d", float(rate)))
                + _el_uint(_CHANNELS, channels),
            ),
        )
    tracks = _el(_TRACKS, entries)
    cluster = _el(_CLUSTER, _el_uint(0xE7, 0) + bytes(cluster_bytes))
    seg_body = info + tracks + cluster
    if unknown_segment_size:
        return (
            header + _enc_id(_SEGMENT) + b"\xff" + seg_body
        )
    return header + _el(_SEGMENT, seg_body)
