"""MP4 / ISO-BMFF header sniff (round 10, verdict r9 #2) — the most
common real-world video container the triage battery could not read.

ISO/IEC 14496-12 lays out an MP4 file as a tree of length-prefixed
"boxes" (uint32 big-endian size including the 8-byte header, 4-byte
type; size==1 switches to a uint64 largesize). Everything corpus
triage needs is fixed big-endian fields in the ``moov`` subtree —
``mvhd`` (movie timescale + duration), per-track ``tkhd`` (16.16
fixed-point geometry), ``mdhd`` (media timescale + duration),
``hdlr`` (vide/soun), ``stsd`` (codec fourcc), ``stsz`` (sample
count) and ``stts`` (sample delta) — so the sniff never touches
``mdat``. A 100 TB video corpus filters on exactly these fields
(geometry, duration, codec, frame count) before any packet is
demuxed; this is the decide-before-decode read that runs first.

Reference parity note: the reference engine (nimtable/BergLoom) has
no media layer — this module belongs to the LLM-training-data
pipeline surface, same stance as ``avcodec.video_meta``
(AVI/Y4M), which this extends to MP4/MOV.

Scale shape: header-only, executor-side, map-only kernel for
Arrow-batched ``mapInPandas`` — cost independent of payload size,
``bytes → dict or ValueError`` corpus contract (cursor strictly
advances; box budget bounds the walk).
"""

from __future__ import annotations

import struct

__all__ = ["mp4_meta", "make_mp4_stream"]

# A spec-valid moov tree is shallow; a walk that visits more boxes
# than this is a crafted bomb, not a movie header.
_MAX_BOXES = 4096


def _boxes(d: bytes, pos: int, end: int, budget: list):
    """Yield ``(type, body_start, body_end)`` for the direct children
    of ``d[pos:end]``. Bounds-checked; the cursor strictly advances."""
    while pos + 8 <= end:
        budget[0] -= 1
        if budget[0] < 0:
            raise ValueError("ISO-BMFF box budget exceeded")
        (size,), typ = struct.unpack_from(">I", d, pos), d[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("truncated ISO-BMFF largesize")
            (size,) = struct.unpack_from(">Q", d, body)
            body += 8
            if size < 16:
                raise ValueError(f"ISO-BMFF largesize {size} < 16")
        elif size == 0:
            size = end - pos  # box extends to the end of its parent
        elif size < 8:
            raise ValueError(f"ISO-BMFF box size {size} < 8")
        box_end = pos + size
        if box_end > end:
            raise ValueError(f"truncated ISO-BMFF box {typ!r}")
        yield typ, body, box_end
        pos = box_end


def _children(d: bytes, pos: int, end: int, budget: list) -> list:
    """Materialize the direct children of one parent in ONE walk —
    repeated ``_find``-style rescans were re-counting the same boxes
    against the shared budget several times over (review r10)."""
    return list(_boxes(d, pos, end, budget))


def _first(children: list, typ: bytes):
    for t, b, e in children:
        if t == typ:
            return b, e
    return None


def _fullbox(d: bytes, body: int) -> tuple:
    if body + 4 > len(d):
        raise ValueError("truncated ISO-BMFF FullBox header")
    version = d[body]
    return version, body + 4


def _mvhd(d: bytes, body: int, end: int) -> tuple:
    v, p = _fullbox(d, body)
    if v == 1:
        if p + 28 > end:
            raise ValueError("truncated mvhd v1")
        timescale = struct.unpack_from(">I", d, p + 16)[0]
        duration = struct.unpack_from(">Q", d, p + 20)[0]
        if duration == (1 << 64) - 1:
            duration = None
    elif v == 0:
        if p + 16 > end:
            raise ValueError("truncated mvhd v0")
        timescale, duration = struct.unpack_from(">II", d, p + 8)
        if duration == (1 << 32) - 1:
            duration = None
    else:
        raise ValueError(f"mvhd version {v} is not 0/1")
    # ISO 14496-12 §8.2.2.3: an all-ones duration means "cannot be
    # determined" (fragmented/streaming files) — reporting it as a
    # real ~49.7-day duration would silently misclassify every such
    # file in a duration-filtered corpus (review r10); mapped to
    # None above.
    if timescale == 0:
        raise ValueError("mvhd timescale is 0 (invalid)")
    return timescale, duration


def _tkhd(d: bytes, body: int, end: int) -> tuple:
    v, p = _fullbox(d, body)
    # width/height are the LAST 8 bytes of the box in both versions
    # (16.16 fixed point)
    fixed = 80 if v == 0 else 92
    if p + fixed > end:
        raise ValueError("truncated tkhd")
    w, h = struct.unpack_from(">II", d, end - 8)
    return w >> 16, h >> 16


def _mdhd(d: bytes, body: int, end: int) -> tuple:
    v, p = _fullbox(d, body)
    if v == 1:
        if p + 28 > end:
            raise ValueError("truncated mdhd v1")
        timescale = struct.unpack_from(">I", d, p + 16)[0]
        duration = struct.unpack_from(">Q", d, p + 20)[0]
    elif v == 0:
        if p + 16 > end:
            raise ValueError("truncated mdhd v0")
        timescale, duration = struct.unpack_from(">II", d, p + 8)
    else:
        raise ValueError(f"mdhd version {v} is not 0/1")
    if timescale == 0:
        raise ValueError("mdhd timescale is 0 (invalid)")
    return timescale, duration


def _track_meta(d: bytes, body: int, end: int, budget: list) -> dict:
    """One ``trak`` subtree → handler/geometry/codec/sample stats."""
    out = {
        "handler": None, "width": None, "height": None,
        "codec": None, "n_samples": None, "sample_delta": None,
        "media_timescale": None, "media_duration": None,
        "entry_channels": None, "entry_rate": None,
    }
    kids = _children(d, body, end, budget)
    tk = _first(kids, b"tkhd")
    if tk is not None:
        out["width"], out["height"] = _tkhd(d, *tk)
    mdia = _first(kids, b"mdia")
    if mdia is None:
        raise ValueError("trak has no mdia box")
    mkids = _children(d, mdia[0], mdia[1], budget)
    hd = _first(mkids, b"hdlr")
    if hd is not None:
        b, e = hd
        _, p = _fullbox(d, b)
        if p + 8 > e:
            raise ValueError("truncated hdlr")
        out["handler"] = d[p + 4 : p + 8].decode("latin-1")
    md = _first(mkids, b"mdhd")
    if md is not None:
        ts, dur = _mdhd(d, *md)
        out["media_timescale"], out["media_duration"] = ts, dur
    minf = _first(mkids, b"minf")
    if minf is None:
        return out
    stbl = _first(_children(d, minf[0], minf[1], budget), b"stbl")
    if stbl is None:
        return out
    skids = _children(d, stbl[0], stbl[1], budget)
    sd = _first(skids, b"stsd")
    if sd is not None:
        b, e = sd
        _, p = _fullbox(d, b)
        if p + 4 > e:
            raise ValueError("truncated stsd")
        (n_entries,) = struct.unpack_from(">I", d, p)
        if n_entries:
            if p + 12 > e:
                raise ValueError("truncated stsd sample entry")
            out["codec"] = d[p + 8 : p + 12].decode("latin-1")
            # AudioSampleEntry (ISO 14496-12 §12.2.3): channelcount
            # at entry+24, samplerate (16.16 fixed) at entry+32 —
            # an m4a corpus triages rate/channels from here (r10).
            # Bound by the FIRST entry's own declared size, not the
            # stsd box end — a short first entry followed by a second
            # entry otherwise leaks the neighbor's bytes into the
            # audio fields (review r10, fourth pass)
            entry = p + 4
            (esize,) = struct.unpack_from(">I", d, entry)
            hdr = 8
            if esize == 1 and entry + 16 <= e:
                # largesize: 16-byte header, body fields shift
                # (fifth-pass review — the literal uint32 read
                # skipped the module's own size special values)
                (esize,) = struct.unpack_from(">Q", d, entry + 8)
                hdr = 16
            elif esize == 0:
                esize = e - entry  # box extends to the stsd end
            # AudioSampleEntry body after the header: reserved(6)
            # dri(2) reserved(8) channels(2) bits(2) predefined(2)
            # reserved(2) samplerate 16.16(4) = 28 bytes
            if esize >= hdr + 28 and entry + esize <= e:
                base = entry + hdr
                out["entry_channels"] = struct.unpack_from(
                    ">H", d, base + 16
                )[0]
                out["entry_rate"] = (
                    struct.unpack_from(">I", d, base + 24)[0] >> 16
                )
    sz = _first(skids, b"stsz")
    if sz is not None:
        b, e = sz
        _, p = _fullbox(d, b)
        if p + 8 > e:
            raise ValueError("truncated stsz")
        out["n_samples"] = struct.unpack_from(">I", d, p + 4)[0]
    st = _first(skids, b"stts")
    if st is not None:
        b, e = st
        _, p = _fullbox(d, b)
        if p + 4 > e:
            raise ValueError("truncated stts")
        (n_entries,) = struct.unpack_from(">I", d, p)
        if n_entries:
            if p + 12 > e:
                raise ValueError("truncated stts entry")
            out["sample_delta"] = struct.unpack_from(">I", d, p + 8)[0]
    return out


def mp4_meta(payload: bytes) -> dict:
    """MP4/MOV bytes → ``{container, brand, width, height, n_frames,
    usec_per_frame, duration_ms, video_codec, audio_codec,
    audio_rate, audio_channels, n_tracks}`` with no
    packet demux (ISO/IEC 14496-12 box walk, ``moov`` subtree only).

    ``duration_ms`` is the movie-header quantity
    (``mvhd.duration * 1000 // mvhd.timescale`` — integer, the
    container's own arithmetic); an all-ones mvhd duration is the
    spec's "cannot be determined" sentinel (ISO 14496-12 §8.2.2.3,
    fragmented/streaming files) and reports as None, not as a
    ~49.7-day value. Geometry/codec/frame stats come
    from the FIRST ``vide``-handler track (tkhd 16.16 integer part,
    stsd fourcc, stsz sample count); ``usec_per_frame`` is the first
    stts delta over the media timescale. A file with no video track
    reports them as None (audio-only MP4s are corpus-legal). Raises
    ValueError on anything malformed."""
    d = payload
    if len(d) < 12 or d[4:8] != b"ftyp":
        raise ValueError(
            f"not an ISO-BMFF payload (no ftyp box): {d[4:8]!r}"
        )
    budget = [_MAX_BOXES]
    # The TOP level stays a lazy walk that stops at moov (review r10,
    # second pass): materializing all top-level children re-rejected
    # faststart files whose trailing mdat is truncated — a partially
    # downloaded crawl object whose entire header IS present — and
    # burned budget on post-moov boxes. "The sniff never touches
    # mdat" includes never requiring the tail to be whole.
    ftyp = moov = None
    for t, b, e in _boxes(d, 0, len(d), budget):
        if t == b"ftyp" and ftyp is None:
            ftyp = (b, e)
        elif t == b"moov" and moov is None:
            moov = (b, e)
            break
    if ftyp is None:
        raise ValueError("ISO-BMFF payload has no ftyp box")
    if ftyp[1] - ftyp[0] < 4:
        # slicing past the box end would read the NEXT box's size
        # bytes as the brand (review r10)
        raise ValueError("ftyp box too short to carry a major brand")
    brand = d[ftyp[0] : ftyp[0] + 4].decode("latin-1")
    if moov is None:
        raise ValueError("ISO-BMFF payload has no moov box")
    mkids = _children(d, moov[0], moov[1], budget)
    mv = _first(mkids, b"mvhd")
    if mv is None:
        raise ValueError("moov has no mvhd box")
    timescale, duration = _mvhd(d, *mv)
    tracks = [
        _track_meta(d, b, e, budget)
        for t, b, e in mkids
        if t == b"trak"
    ]
    video = next((t for t in tracks if t["handler"] == "vide"), None)
    audio = next((t for t in tracks if t["handler"] == "soun"), None)
    out = {
        "container": "mp4",
        "brand": brand,
        "n_tracks": len(tracks),
        "duration_ms": (
            None if duration is None else duration * 1000 // timescale
        ),
        "width": None,
        "height": None,
        "n_frames": None,
        "usec_per_frame": None,
        "video_codec": None,
        "audio_codec": None,
        "audio_rate": None,
        "audio_channels": None,
    }
    if audio is not None:
        out["audio_codec"] = audio["codec"]
        out["audio_rate"] = audio["entry_rate"]
        out["audio_channels"] = audio["entry_channels"]
    if video is not None:
        out["width"] = video["width"]
        out["height"] = video["height"]
        out["n_frames"] = video["n_samples"]
        out["video_codec"] = video["codec"]
        if video["sample_delta"] is not None and video["media_timescale"]:
            out["usec_per_frame"] = (
                video["sample_delta"] * 1_000_000
                // video["media_timescale"]
            )
    return out


# ---------------------------------------------------------------------------
# Synthetic writer (tests + oracles): a spec-layout ftyp+moov+mdat
# file any MP4 demuxer indexes. Fixed big-endian fields throughout,
# so every sniffed output is exact integer arithmetic over the
# recipe — the same oracle stance as make_flac_stream/encode_y4m.
# ---------------------------------------------------------------------------
def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, version: int, body: bytes) -> bytes:
    return _box(typ, bytes((version, 0, 0, 0)) + body)


def make_mp4_stream(
    width: int,
    height: int,
    fps: int,
    n_frames: int,
    movie_timescale: int = 1000,
    codec: str = "avc1",
    audio_track: bool = False,
    audio_rate: int = 48000,
    audio_channels: int = 2,
    video_track: bool = True,
    mdat_bytes: int = 0,
    version1: bool = False,
) -> bytes:
    """Synthetic MP4 for tests/oracles. Media timescale = ``fps`` and
    stts delta = 1, so media duration = ``n_frames`` exactly; movie
    duration = ``n_frames * movie_timescale // fps`` (the standard
    edit-list-free mapping). ``version1`` emits v1 mvhd/mdhd (64-bit
    durations) to pin both parser paths. ``audio_track`` appends a
    ``soun`` track so multi-track selection is exercised."""
    if fps <= 0 or n_frames < 0 or movie_timescale <= 0:
        raise ValueError("fps/movie_timescale must be > 0, n_frames >= 0")
    movie_duration = n_frames * movie_timescale // fps

    def mvhd() -> bytes:
        if version1:
            body = (
                struct.pack(">QQIQ", 0, 0, movie_timescale, movie_duration)
                + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                + bytes(8) + bytes(36) + bytes(24)
                + struct.pack(">I", 3)
            )
            return _full(b"mvhd", 1, body)
        body = (
            struct.pack(">IIII", 0, 0, movie_timescale, movie_duration)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0)
            + bytes(8) + bytes(36) + bytes(24)
            + struct.pack(">I", 3)
        )
        return _full(b"mvhd", 0, body)

    def trak(handler: bytes, track_id: int) -> bytes:
        is_video = handler == b"vide"
        if version1:
            tkhd_body = (
                struct.pack(">QQI", 0, 0, track_id) + bytes(4)
                + struct.pack(">Q", movie_duration)
                + bytes(8) + bytes(8) + bytes(36)
                + struct.pack(
                    ">II",
                    (width << 16) if is_video else 0,
                    (height << 16) if is_video else 0,
                )
            )
            mdhd_body = struct.pack(
                ">QQIQHH", 0, 0, fps, n_frames, 0x55C4, 0
            )
        else:
            tkhd_body = (
                struct.pack(">III", 0, 0, track_id) + bytes(4)
                + struct.pack(">I", movie_duration)
                + bytes(8) + bytes(8) + bytes(36)
                + struct.pack(
                    ">II",
                    (width << 16) if is_video else 0,
                    (height << 16) if is_video else 0,
                )
            )
            mdhd_body = struct.pack(
                ">IIIIHH", 0, 0, fps, n_frames, 0x55C4, 0
            )
        hdlr = _full(
            b"hdlr", 0, bytes(4) + handler + bytes(12) + b"synth\x00"
        )
        fourcc = codec.encode("latin-1") if is_video else b"mp4a"
        if is_video:
            # minimal entry: 8-byte box header + 8 reserved/index
            entry = struct.pack(">I", 16) + fourcc + bytes(6) \
                + struct.pack(">H", 1)
        else:
            # full 36-byte AudioSampleEntry (ISO 14496-12 §12.2.3):
            # reserved(6) dri(2) reserved(8) channels(2) bits(2)
            # predefined(2) reserved(2) samplerate 16.16(4)
            entry = (
                struct.pack(">I", 36) + fourcc + bytes(6)
                + struct.pack(">H", 1) + bytes(8)
                + struct.pack(">HHHH", audio_channels, 16, 0, 0)
                + struct.pack(">I", audio_rate << 16)
            )
        stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
        stts = _full(
            b"stts", 0, struct.pack(">III", 1, n_frames, 1)
            if n_frames else struct.pack(">I", 0)
        )
        stsz = _full(b"stsz", 0, struct.pack(">II", 0, n_frames))
        stsc = _full(b"stsc", 0, struct.pack(">I", 0))
        stco = _full(b"stco", 0, struct.pack(">I", 0))
        stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco)
        vmhd = _full(b"vmhd", 0, struct.pack(">HHHH", 0, 0, 0, 0))
        smhd = _full(b"smhd", 0, struct.pack(">HH", 0, 0))
        minf = _box(b"minf", (vmhd if is_video else smhd) + stbl)
        mdia = _box(
            b"mdia",
            _full(b"mdhd", 1 if version1 else 0, mdhd_body)
            + hdlr + minf,
        )
        return _box(
            b"trak",
            _full(b"tkhd", 1 if version1 else 0, tkhd_body) + mdia,
        )

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    traks = b"" if not video_track else trak(b"vide", 1)
    if audio_track:
        traks += trak(b"soun", 2)
    moov = _box(b"moov", mvhd() + traks)
    mdat = _box(b"mdat", bytes(mdat_bytes))
    return ftyp + moov + mdat
