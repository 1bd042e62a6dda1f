"""ADTS AAC sniff tests (round 10) — header walk per ISO/IEC
13818-7 §6.2, with the ADTS-vs-MP3 sync disambiguation pinned."""

from __future__ import annotations

import pytest

from bergloom_spark.operators.avcodec import (
    adts_meta,
    audio_meta,
    make_adts_stream,
    make_mp3_stream,
)


def test_adts_basic_walk():
    p = make_adts_stream(25, sample_rate=48000, channels=2, profile=1)
    m = adts_meta(p)
    assert m == {
        "n_frames": 25,
        "sample_rate": 48000,
        "channels": 2,
        "profile": "LC",
        "duration_ms": 25 * 1024 * 1_000_000 // 48000 // 1000,
    }


@pytest.mark.parametrize("rate", [96000, 44100, 22050, 8000, 7350])
@pytest.mark.parametrize("channels", [1, 2, 6, 7])
def test_adts_rate_channel_table(rate, channels):
    m = adts_meta(make_adts_stream(3, sample_rate=rate,
                                   channels=channels))
    assert (m["sample_rate"], m["channels"]) == (rate, channels)


def test_adts_crc_header_length():
    p = make_adts_stream(4, crc=True, payload_bytes=10)
    assert len(p) == 4 * (9 + 10)
    assert adts_meta(p)["n_frames"] == 4


def test_adts_multi_block_frames():
    m = adts_meta(make_adts_stream(5, sample_rate=44100,
                                   blocks_per_frame=4))
    assert m["duration_ms"] == 5 * 4096 * 1_000_000 // 44100 // 1000


def test_adts_profiles():
    for idx, name in enumerate(("Main", "LC", "SSR", "LTP")):
        assert adts_meta(
            make_adts_stream(1, profile=idx)
        )["profile"] == name


def test_adts_truncated_final_frame_excluded():
    p = make_adts_stream(3, payload_bytes=20)
    assert adts_meta(p[:-5])["n_frames"] == 2


def test_adts_empty_rejected():
    with pytest.raises(ValueError, match="no ADTS frame"):
        adts_meta(b"\xff\xf1\x00\x00")


def test_adts_pce_channels_rejected():
    p = bytearray(make_adts_stream(1))
    p[2] &= 0xFE
    p[3] &= 0x3F  # channel_configuration = 0
    with pytest.raises(ValueError, match="no ADTS frame"):
        adts_meta(bytes(p))


def test_audio_meta_routes_adts_not_mp3():
    p = make_adts_stream(10, sample_rate=32000, channels=1)
    m = audio_meta(p)
    assert m["container"] == "aac"
    assert m["sample_rate"] == 32000
    assert m["channels"] == 1


def test_audio_meta_still_routes_mp3():
    p = make_mp3_stream([128, 128], sample_rate=44100)
    assert audio_meta(p)["container"] == "mp3"


def test_adts_vs_mp3_sync_disjoint():
    """An MP3 frame header's layer bits are nonzero; ADTS layer bits
    are zero — the dispatch masks must not overlap."""
    mp3 = make_mp3_stream([192], sample_rate=44100)
    assert (mp3[1] & 0xF6) != 0xF0  # never matches the ADTS mask
    aac = make_adts_stream(1)
    assert (aac[1] & 0xE0) == 0xE0  # matches the loose MP3 mask...
    assert audio_meta(aac)["container"] == "aac"  # ...but routes AAC


def test_audio_meta_routes_id3_fronted_adts():
    from bergloom_spark.operators.avcodec import make_id3v2

    tag = make_id3v2(title="aac file", artist="x", album="y")
    p = tag + make_adts_stream(8, sample_rate=48000, channels=2)
    m = audio_meta(p)
    assert m["container"] == "aac"
    assert m["sample_rate"] == 48000


def test_audio_meta_id3_fronted_mp3_still_routes_mp3():
    from bergloom_spark.operators.avcodec import make_id3v2

    tag = make_id3v2(title="mp3 file")
    p = tag + make_mp3_stream([128, 128], sample_rate=44100)
    assert audio_meta(p)["container"] == "mp3"
