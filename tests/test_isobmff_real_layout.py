"""Real-encoder-layout MP4 seam test (verdict r10 what's-wrong #2:
the driver row exercises only make_mp4_stream output, a synthetic-
fixture blind spot for the highest-traffic container).

No real encoder or sample MP4 exists in this container (no ffmpeg,
no system .mp4 — checked), so this module is the next-best thing: an
INDEPENDENT second writer, built from raw struct packing with no
shared helpers, that reproduces ffmpeg's default muxer layout —
which differs from make_mp4_stream output in every way that has
historically broken parsers:

- ``moov`` at the END of the file, after ``free`` and ``mdat``
  (ffmpeg default, no ``+faststart``) — the top-level walk must skip
  a large mdat it never reads;
- multiple compatible brands (``isom`` major, ``iso2 avc1 mp41``);
- ``edts``/``elst`` edit lists in both tracks (skipped boxes);
- multi-entry ``stts`` (variable frame durations);
- full VisualSampleEntry/AudioSampleEntry layouts with ``avcC`` /
  ``esds`` codec-config children;
- a ``udta``/``meta``/``ilst`` encoder tag ("Lavf58.76.100") after
  the traks;
- 32-bit ``stco`` chunk offsets pointing into the real mdat.
"""

from __future__ import annotations

import struct

from bergloom_spark.operators.isobmff import mp4_meta


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, ver: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, bytes([ver]) + flags.to_bytes(3, "big") + payload)


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)


def _mvhd(timescale: int, duration: int) -> bytes:
    body = struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">IHH", 0x00010000, 0x0100, 0) + bytes(8)
    body += _MATRIX + bytes(24) + struct.pack(">I", 3)
    return _full(b"mvhd", 0, 0, body)


def _tkhd(track_id: int, duration: int, w: int, h: int,
          volume: int) -> bytes:
    body = struct.pack(">IIII", 0, 0, track_id, 0)
    body += struct.pack(">I", duration) + bytes(8)
    body += struct.pack(">HHHH", 0, 0, volume, 0) + _MATRIX
    body += struct.pack(">II", w << 16, h << 16)
    return _full(b"tkhd", 0, 3, body)


def _elst(duration: int) -> bytes:
    body = struct.pack(">IIiI", 1, duration, 0, 0x00010000)
    return _box(b"edts", _full(b"elst", 0, 0, body))


def _mdhd(timescale: int, duration: int) -> bytes:
    body = struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">HH", 0x55C4, 0)  # language 'und'
    return _full(b"mdhd", 0, 0, body)


def _hdlr(handler: bytes, name: bytes) -> bytes:
    return _full(
        b"hdlr", 0, 0,
        bytes(4) + handler + bytes(12) + name + b"\x00",
    )


def _dinf() -> bytes:
    url = _full(b"url ", 0, 1, b"")
    return _box(
        b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    )


def _avc1(w: int, h: int) -> bytes:
    # VisualSampleEntry (ISO 14496-12 §12.1.3) + avcC config blob
    entry = bytes(6) + struct.pack(">H", 1)
    entry += struct.pack(">HH", 0, 0) + bytes(12)
    entry += struct.pack(">HH", w, h)
    entry += struct.pack(">II", 0x00480000, 0x00480000) + bytes(4)
    entry += struct.pack(">H", 1)
    entry += bytes(32)  # compressorname
    entry += struct.pack(">Hh", 24, -1)
    avcc = _box(
        b"avcC",
        bytes(
            [1, 0x64, 0x00, 0x1F, 0xFF, 0xE1, 0x00, 0x05]
        ) + b"\x67\x64\x00\x1f\xac" + bytes([1, 0x00, 0x04])
        + b"\x68\xee\x3c\x80",
    )
    return _box(b"avc1", entry + avcc)


def _mp4a(rate: int, channels: int) -> bytes:
    entry = bytes(6) + struct.pack(">H", 1) + bytes(8)
    entry += struct.pack(">HHHH", channels, 16, 0, 0)
    entry += struct.pack(">I", rate << 16)
    esds = _full(
        b"esds", 0, 0,
        bytes([0x03, 0x19, 0x00, 0x01, 0x00, 0x04, 0x11, 0x40,
               0x15, 0x00, 0x00, 0x00, 0x00, 0x01, 0xF4, 0x00,
               0x00, 0x01, 0xF4, 0x00, 0x05, 0x02, 0x12, 0x10,
               0x06, 0x01, 0x02]),
    )
    return _box(b"mp4a", entry + esds)


def _stbl(sample_entry: bytes, stts_entries: list[tuple[int, int]],
          sizes: list[int], chunk_off: int) -> bytes:
    stsd = _full(
        b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry
    )
    stts = _full(
        b"stts", 0, 0,
        struct.pack(">I", len(stts_entries))
        + b"".join(struct.pack(">II", n, d) for n, d in stts_entries),
    )
    stsc = _full(
        b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(sizes), 1)
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, len(sizes))
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _full(
        b"stco", 0, 0, struct.pack(">II", 1, chunk_off)
    )
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def make_ffmpeg_layout_mp4(
    *, w: int = 320, h: int = 240, n_frames: int = 48,
    video: bool = True,
) -> bytes:
    """ffmpeg-default-layout MP4: ftyp(free)(mdat)(moov@end)."""
    ftyp = _box(
        b"ftyp",
        b"isom" + struct.pack(">I", 512) + b"isomiso2avc1mp41",
    )
    free = _box(b"free", b"")
    v_sizes = [100 + (k * 37) % 900 for k in range(n_frames)]
    a_sizes = [200 + (k * 13) % 150 for k in range(92)]
    mdat_payload = bytes(sum(v_sizes) + sum(a_sizes))
    mdat = _box(b"mdat", mdat_payload)
    chunk_off = len(ftyp) + len(free) + 8  # first byte of mdat data

    movie_timescale, movie_dur = 1000, 2000  # 2 s
    traks = []
    if video:
        # 12800 media timescale, deltas 512 then 533 (multi-entry)
        stbl = _stbl(
            _avc1(w, h),
            [(n_frames - 8, 512), (8, 533)],
            v_sizes, chunk_off,
        )
        minf = _box(
            b"minf",
            _full(b"vmhd", 0, 1, bytes(8)) + _dinf() + stbl,
        )
        mdia = _box(
            b"mdia",
            _mdhd(12800, n_frames * 512)
            + _hdlr(b"vide", b"VideoHandler") + minf,
        )
        traks.append(
            _box(
                b"trak",
                _tkhd(1, movie_dur, w, h, 0) + _elst(movie_dur)
                + mdia,
            )
        )
    a_stbl = _stbl(_mp4a(44100, 2), [(92, 1024)], a_sizes,
                   chunk_off + sum(v_sizes))
    a_minf = _box(
        b"minf", _full(b"smhd", 0, 0, bytes(4)) + _dinf() + a_stbl
    )
    a_mdia = _box(
        b"mdia",
        _mdhd(44100, 92 * 1024) + _hdlr(b"soun", b"SoundHandler")
        + a_minf,
    )
    traks.append(
        _box(
            b"trak",
            _tkhd(2, movie_dur, 0, 0, 0x0100) + _elst(movie_dur)
            + a_mdia,
        )
    )
    ilst = _box(
        b"ilst",
        _box(
            b"\xa9too",
            _box(b"data",
                 struct.pack(">II", 1, 0) + b"Lavf58.76.100"),
        ),
    )
    meta = _full(
        b"meta", 0, 0, _hdlr(b"mdir", b"") + ilst
    )
    udta = _box(b"udta", meta)
    moov = _box(
        b"moov",
        _mvhd(movie_timescale, movie_dur) + b"".join(traks) + udta,
    )
    return ftyp + free + mdat + moov


def test_ffmpeg_layout_av():
    p = make_ffmpeg_layout_mp4()
    m = mp4_meta(p)
    assert m["container"] == "mp4"
    assert m["brand"] == "isom"
    assert m["n_tracks"] == 2
    assert m["duration_ms"] == 2000
    assert (m["width"], m["height"]) == (320, 240)
    assert m["n_frames"] == 48
    # first stts delta over the media timescale
    assert m["usec_per_frame"] == 512 * 1_000_000 // 12800
    assert m["video_codec"] == "avc1"
    assert m["audio_codec"] == "mp4a"
    assert (m["audio_rate"], m["audio_channels"]) == (44100, 2)


def test_ffmpeg_layout_video_meta_and_triage():
    from bergloom_spark.operators.avcodec import video_meta
    from bergloom_spark.operators.triage import corpus_triage

    p = make_ffmpeg_layout_mp4(w=640, h=360, n_frames=24)
    v = video_meta(p)
    assert v["container"] == "mp4"
    assert (v["width"], v["height"], v["n_frames"]) == (640, 360, 24)
    t = corpus_triage(p)
    assert (t["kind"], t["container"], t["n_items"], t["width"],
            t["height"], t["duration_ms"], t["error"]) == (
        "video", "mp4", 24, 640, 360, 2000, None)


def test_ffmpeg_layout_audio_only_routes_m4a():
    from bergloom_spark.operators.avcodec import audio_meta

    p = make_ffmpeg_layout_mp4(video=False)
    m = audio_meta(p)
    assert m["container"] == "m4a"
    assert (m["sample_rate"], m["channels"]) == (44100, 2)
    assert m["duration_ms"] == 2000


def test_truncated_mdat_still_sniffs_header_boxes():
    """A partially-downloaded crawl object: ftyp+free survive, mdat
    is cut, moov is gone — must raise, not return a wrong answer."""
    import pytest

    p = make_ffmpeg_layout_mp4()
    with pytest.raises(ValueError):
        mp4_meta(p[: len(p) // 3])


def test_faststart_variant_roundtrip():
    """moov moved before mdat (what +faststart does) must parse to
    identical metadata — box order is presentation-irrelevant."""
    p = make_ffmpeg_layout_mp4()
    # split the file at the known top-level boundaries
    boxes = []
    pos = 0
    while pos < len(p):
        size = struct.unpack(">I", p[pos : pos + 4])[0]
        boxes.append((p[pos + 4 : pos + 8], p[pos : pos + size]))
        pos += size
    order = {b"ftyp": 0, b"moov": 1, b"free": 2, b"mdat": 3}
    fast = b"".join(
        raw for _, raw in sorted(boxes, key=lambda x: order[x[0]])
    )
    assert mp4_meta(fast) == mp4_meta(p)
