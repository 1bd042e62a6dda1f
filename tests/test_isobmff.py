"""MP4/ISO-BMFF sniff tests (round 10, verdict r9 #2).

Layers: exact roundtrips through the in-repo writer (v0 + v1 box
versions, multi-track, varying movie timescales), dispatch through
video_meta/media_frame_count, rejections, and the fuzz contract
(any bytes → parse or ValueError, never a crash or hang).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bergloom_spark.operators.avcodec import media_frame_count, video_meta
from bergloom_spark.operators.isobmff import make_mp4_stream, mp4_meta


def test_roundtrip_v0():
    p = make_mp4_stream(640, 360, 25, 100, movie_timescale=600)
    m = mp4_meta(p)
    assert m == {
        "container": "mp4",
        "brand": "isom",
        "n_tracks": 1,
        "duration_ms": (100 * 600 // 25) * 1000 // 600,
        "width": 640,
        "height": 360,
        "n_frames": 100,
        "usec_per_frame": 1_000_000 // 25,
        "video_codec": "avc1",
        "audio_codec": None,
        "audio_rate": None,
        "audio_channels": None,
    }


def test_roundtrip_v1_and_audio_track():
    p = make_mp4_stream(
        1920, 1080, 30, 7, movie_timescale=90000, audio_track=True,
        version1=True, codec="hvc1", mdat_bytes=64,
    )
    m = mp4_meta(p)
    assert m["n_tracks"] == 2
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["n_frames"] == 7
    assert m["video_codec"] == "hvc1"
    assert m["duration_ms"] == (7 * 90000 // 30) * 1000 // 90000
    assert m["usec_per_frame"] == 1_000_000 // 30


def test_video_meta_dispatch_and_frame_count():
    p = make_mp4_stream(320, 240, 24, 48)
    v = video_meta(p)
    assert v == {
        "container": "mp4",
        "width": 320,
        "height": 240,
        "n_frames": 48,
        "usec_per_frame": 1_000_000 // 24,
        "duration_ms": (48 * 1000 // 24) * 1000 // 1000,
    }
    assert media_frame_count(p) == {"container": "mp4", "n_frames": 48}


def test_audio_only_mp4():
    # strip the video trak by building audio_track-only via surgery:
    # build with video, then ask video_meta to reject a soun-only
    # file constructed by relabeling the handler
    p = bytearray(make_mp4_stream(64, 48, 10, 5))
    i = bytes(p).find(b"vide")
    p[i : i + 4] = b"soun"
    m = mp4_meta(bytes(p))
    assert m["n_frames"] is None  # no vide track → audio-only file
    with pytest.raises(ValueError, match="no video track"):
        video_meta(bytes(p))


def test_rejections():
    with pytest.raises(ValueError, match="ftyp"):
        mp4_meta(b"\x00" * 32)
    # ftyp but no moov
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    with pytest.raises(ValueError, match="no moov"):
        mp4_meta(ftyp)
    # box size runs past the payload
    bad = bytearray(make_mp4_stream(64, 48, 10, 5))
    bad[0:4] = struct.pack(">I", len(bad) + 100)
    with pytest.raises(ValueError, match="truncated|budget|size"):
        mp4_meta(bytes(bad))
    # box size < 8
    bad2 = bytearray(make_mp4_stream(64, 48, 10, 5))
    off = bytes(bad2).find(b"moov") - 4
    bad2[off : off + 4] = struct.pack(">I", 4)
    with pytest.raises(ValueError, match="< 8"):
        mp4_meta(bytes(bad2))


def test_zero_size_box_extends_to_parent_end():
    p = bytearray(make_mp4_stream(64, 48, 10, 5, mdat_bytes=8))
    off = bytes(p).rfind(b"mdat") - 4
    p[off : off + 4] = struct.pack(">I", 0)  # mdat: to end of file
    assert mp4_meta(bytes(p))["n_frames"] == 5


def test_fuzz_contract():
    rng = np.random.RandomState(10)
    base = make_mp4_stream(
        640, 360, 25, 12, movie_timescale=600, audio_track=True
    )
    for cut in range(0, len(base), 7):
        try:
            mp4_meta(base[:cut])
        except ValueError:
            pass
    for _ in range(1500):
        b = bytearray(base)
        for _ in range(1 + rng.randint(4)):
            b[rng.randint(len(b))] = rng.randint(256)
        try:
            mp4_meta(bytes(b))
        except ValueError:
            pass


def test_all_ones_duration_sentinel_is_none():
    """Review r10: ISO 14496-12 §8.2.2.3 — an all-ones mvhd duration
    means 'cannot be determined' (fragmented/streaming files), not a
    ~49.7-day movie."""
    for v1 in (False, True):
        p = bytearray(make_mp4_stream(64, 48, 10, 5, version1=v1))
        i = bytes(p).find(b"mvhd") + 4  # version/flags
        dur_off = i + 4 + (8 + 8 + 4) if v1 else i + 4 + (4 + 4 + 4)
        width = 8 if v1 else 4
        p[dur_off : dur_off + width] = b"\xff" * width
        m = mp4_meta(bytes(p))
        assert m["duration_ms"] is None, f"version1={v1}"
        # the strict video_meta dispatch must reject rather than
        # return a None field in its all-int shape
        with pytest.raises(ValueError, match="duration_ms"):
            video_meta(bytes(p))


def test_short_ftyp_brand_bounds():
    """Review r10: an ftyp body < 4 bytes must not read the next
    box's size bytes as the brand."""
    import struct as _st

    good = make_mp4_stream(64, 48, 10, 5)
    moov_off = good.find(b"moov") - 4
    short_ftyp = _st.pack(">I", 8) + b"ftyp"  # empty body
    with pytest.raises(ValueError, match="brand"):
        mp4_meta(short_ftyp + good[moov_off:])


def test_budget_survives_legit_many_track_moov():
    """Review r10: _find-style rescans burned the shared box budget
    ~3x per track; a legitimate many-track moov must parse."""
    import struct as _st

    base = make_mp4_stream(64, 48, 10, 5, audio_track=True)
    # splice 120 extra copies of the audio trak into moov
    a0 = base.find(b"trak", base.find(b"trak") + 4) - 4
    trak_size = _st.unpack_from(">I", base, a0)[0]
    trak = base[a0 : a0 + trak_size]
    moov_off = base.find(b"moov") - 4
    moov_size = _st.unpack_from(">I", base, moov_off)[0]
    insert_at = moov_off + moov_size
    extra = trak * 120
    rebuilt = bytearray(base[:insert_at] + extra + base[insert_at:])
    _st.pack_into(">I", rebuilt, moov_off, moov_size + len(extra))
    m = mp4_meta(bytes(rebuilt))
    assert m["n_tracks"] == 122
    assert m["n_frames"] == 5  # the vide track still wins selection


def test_truncated_faststart_tail_still_sniffs():
    """Review r10 (second pass): a moov-before-mdat file whose tail
    is truncated mid-mdat — a partially downloaded crawl object with
    its entire header present — must sniff; the top-level walk stops
    at moov and never requires the tail to be whole."""
    full = make_mp4_stream(640, 360, 25, 100, mdat_bytes=256)
    truncated = full[:-200]  # cut inside mdat
    m = mp4_meta(truncated)
    assert m["n_frames"] == 100
    assert m["duration_ms"] == (100 * 1000 // 25)
    assert video_meta(truncated)["n_frames"] == 100
    assert media_frame_count(truncated)["n_frames"] == 100


def test_frame_count_survives_sentinel_duration_and_bare_track():
    """Review r10 (second pass): media_frame_count consumes only
    n_frames, so an extractable frame count must not be rejected for
    an undeterminable duration (all-ones sentinel) — only video_meta
    (which returns the full all-int shape) rejects those."""
    p = bytearray(make_mp4_stream(64, 48, 10, 5))
    i = bytes(p).find(b"mvhd") + 4
    dur_off = i + 4 + (4 + 4 + 4)
    p[dur_off : dur_off + 4] = b"\xff" * 4
    assert media_frame_count(bytes(p)) == {
        "container": "mp4", "n_frames": 5,
    }
    with pytest.raises(ValueError, match="duration_ms"):
        video_meta(bytes(p))


def test_audio_sample_entry_and_m4a_route():
    """Round 10: AudioSampleEntry rate/channels (ISO 14496-12
    12.2.3) surface in mp4_meta, and audio_meta routes ftyp payloads
    as m4a — the most common lossy-audio container after MP3."""
    from bergloom_spark.operators.avcodec import audio_meta

    p = make_mp4_stream(
        0, 0, 10, 0, video_track=False, audio_track=True,
        audio_rate=44100, audio_channels=6, movie_timescale=1000,
    )
    m = mp4_meta(p)
    assert (m["audio_codec"], m["audio_rate"], m["audio_channels"]) \
        == ("mp4a", 44100, 6)
    assert m["n_frames"] is None  # no video track
    a = audio_meta(
        make_mp4_stream(
            0, 0, 25, 0, video_track=False, audio_track=True,
            audio_rate=48000, audio_channels=2,
        )
    )
    assert a["container"] == "m4a"
    assert (a["sample_rate"], a["channels"]) == (48000, 2)
    # a video-only MP4 must reject in the AUDIO triage
    import pytest

    with pytest.raises(ValueError, match="audio"):
        audio_meta(make_mp4_stream(64, 48, 10, 5))


def test_audio_entry_bounded_by_declared_size():
    """Review r10 (fourth pass): a 16-byte first sample entry
    followed by a second entry must NOT leak the neighbor's bytes
    into channels/rate — the read is bounded by the first entry's
    own declared size."""
    import struct as _st

    p = bytearray(
        make_mp4_stream(
            0, 0, 25, 0, video_track=False, audio_track=True,
            audio_rate=44100, audio_channels=2,
        )
    )
    i = bytes(p).find(b"stsd")
    # entry count -> 2; shrink the first entry's declared size to 16
    # and leave trailing bytes (the old parser read 0xABCD there)
    entry = i + 4 + 4 + 4
    _st.pack_into(">I", p, i + 8, 2)
    _st.pack_into(">I", p, entry, 16)
    m = mp4_meta(bytes(p))
    assert m["audio_rate"] is None and m["audio_channels"] is None


def test_mp3_with_ftyp_bytes_routes_to_mp3():
    """Review r10 (fourth pass): a bare-frame MP3 whose compressed
    bytes 4:8 spell 'ftyp' must still route to the MP3 walk — the
    m4a branch requires a plausible leading box size."""
    from bergloom_spark.operators.avcodec import (
        audio_meta,
        make_mp3_stream,
    )

    mp3 = bytearray(make_mp3_stream([128, 128], sample_rate=44100))
    mp3[4:8] = b"ftyp"  # inside the first frame's zeroed payload
    a = audio_meta(bytes(mp3))
    assert a["container"] == "mp3"
    assert a["sample_rate"] == 44100


def test_largesize_and_ftyp_special_size_encodings():
    """Fifth-pass review: a sample entry using the spec's size==1
    largesize encoding (16-byte header, shifted body offsets) must
    still yield rate/channels, and audio_meta must accept a file
    whose leading ftyp box uses size 1 or 0."""
    import struct as _st

    from bergloom_spark.operators.avcodec import audio_meta

    base = make_mp4_stream(
        0, 0, 25, 0, video_track=False, audio_track=True,
        audio_rate=32000, audio_channels=4,
    )
    # rewrite the 36-byte audio entry as a largesize entry: size=1,
    # fourcc, largesize=44, then the original 28-byte body
    p = bytearray(base)
    i = bytes(p).find(b"mp4a") - 4
    body = bytes(p[i + 8 : i + 36])
    new_entry = (
        _st.pack(">I", 1) + b"mp4a" + _st.pack(">Q", 44) + body
    )
    # grow every enclosing box size by 8 (stsd, stbl, minf, mdia,
    # trak, moov), then splice
    grown = bytearray(p[:i] + new_entry + p[i + 36 :])
    for fourcc in (b"stsd", b"stbl", b"minf", b"mdia", b"moov"):
        off = bytes(grown).find(fourcc) - 4
        _st.pack_into(
            ">I", grown, off,
            _st.unpack_from(">I", grown, off)[0] + 8,
        )
    # trak: the audio track's trak box (the only one)
    off = bytes(grown).find(b"trak") - 4
    _st.pack_into(
        ">I", grown, off, _st.unpack_from(">I", grown, off)[0] + 8
    )
    # stsd's fullbox size also needs its sample-entry... the entry
    # count stays 1; re-sniff
    m = mp4_meta(bytes(grown))
    assert (m["audio_rate"], m["audio_channels"]) == (32000, 4)
    # leading ftyp with size==0 (to end: only legal as the last box,
    # but the lazy top walk treats it as parent-end — moov inside)
    a = audio_meta(base)
    assert a["sample_rate"] == 32000
    one = bytearray(base)
    # size==1 ftyp: insert a largesize after the fourcc
    (fsize,) = _st.unpack_from(">I", one, 0)
    rebuilt = (
        _st.pack(">I", 1) + b"ftyp" + _st.pack(">Q", fsize + 8)
        + bytes(one[8:])
    )
    a1 = audio_meta(rebuilt)
    assert a1["sample_rate"] == 32000
