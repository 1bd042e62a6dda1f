"""Pure-numpy WAV/Y4M codecs (operators/avcodec.py, round 4)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bergloom_spark.operators import avcodec as av


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=500),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_wav_roundtrip(n, rate, seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(-(2**15), 2**15, size=n, dtype=np.int64).astype(
        np.int16
    )
    got_rate, got = av.decode_wav(av.encode_wav(x, rate))
    assert got_rate == rate
    assert np.array_equal(got, x)


def test_wav_chunk_walk_skips_unknown_chunks():
    """A LIST chunk (odd-size, so RIFF padding applies) between fmt
    and data must be skipped by size, not tripped over."""
    x = np.arange(-5, 6, dtype=np.int16)
    payload = av.encode_wav(x, 8000)
    # splice an odd-sized junk chunk after the fmt chunk (ends at 36)
    junk = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # pad
    hacked = payload[:36] + junk + payload[36:]
    rate, got = av.decode_wav(hacked)
    assert rate == 8000
    assert np.array_equal(got, x)


def test_wav_rejects_non_pcm16_and_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        av.decode_wav(b"not audio at all")
    # stereo header: fmt says 2 channels
    x = np.zeros(4, dtype=np.int16)
    p = bytearray(av.encode_wav(x, 8000))
    p[22] = 2  # channel count lives at offset 22
    with pytest.raises(ValueError, match="PCM16 mono"):
        av.decode_wav(bytes(p))


@settings(max_examples=20, deadline=None)
@given(
    nf=st.integers(min_value=1, max_value=6),
    w=st.sampled_from([2, 8, 16]),
    h=st.sampled_from([2, 6, 12]),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_y4m_roundtrip(nf, w, h, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(nf, h, w), dtype=np.int64).astype(
        np.uint8
    )
    gw, gh, got = av.decode_y4m_frames(av.encode_y4m(frames))
    assert (gw, gh, len(got)) == (w, h, nf)
    for f in range(nf):
        assert np.array_equal(got[f], frames[f])


def test_y4m_frame_params_and_errors():
    frames = np.zeros((2, 2, 2), dtype=np.uint8)
    payload = av.encode_y4m(frames)
    # frame-level parameter strings (allowed by the spec) must parse
    hacked = payload.replace(b"FRAME\n", b"FRAME Ixyz\n", 1)
    _, _, got = av.decode_y4m_frames(hacked)
    assert len(got) == 2
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        av.decode_y4m_frames(b"RIFFnope\n")
    with pytest.raises(ValueError, match="even"):
        av.encode_y4m(np.zeros((1, 3, 2), dtype=np.uint8))


def test_audio_features_and_frame_sampling_spark(spark):
    """End-to-end through the Arrow kernels: known waveform/video with
    hand-computable features."""
    import pandas as pd
    from pyspark.sql import types as ST

    x = np.array([100, -100, 200, -200, 0, 300], dtype=np.int16)
    wav = av.encode_wav(x, 8000)
    vid = av.encode_y4m(
        np.arange(3 * 2 * 4, dtype=np.uint8).reshape(3, 2, 4)
    )
    schema = ST.StructType(
        [
            ST.StructField("doc_id", ST.LongType()),
            ST.StructField("payload", ST.BinaryType()),
        ]
    )
    adf = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "payload": [wav]}), schema)
    row = av.audio_features(adf).collect()[0]
    assert row.n_samples == 6
    assert row.sample_rate == 8000
    assert row.peak == 300
    # sign flips: +,-,+,-,0,+ → flips at 0-1, 1-2, 2-3; 4-5 has a zero
    assert row.n_zero_cross == 3
    assert row.rms_milli == int(np.sqrt((100**2 + 100**2 + 200**2 + 200**2 + 0 + 300**2) / 6) * 1000)

    vdf = spark.createDataFrame(pd.DataFrame({"doc_id": [7], "payload": [vid]}), schema)
    rows = av.sample_video_frames(vdf, every_k=2).collect()
    assert [(r.frame_index, r.width, r.height) for r in rows] == [
        (0, 4, 2),
        (2, 4, 2),
    ]
    assert rows[0].y_sum == sum(range(0, 8))
    assert rows[1].y_sum == sum(range(16, 24))


# ---------------------------------------------------------------------------
# MP3 frame-header walk (round 7, verdict r6 #8 stretch)
# ---------------------------------------------------------------------------
def test_mp3_meta_arithmetic():
    from bergloom_spark.operators.avcodec import make_mp3_stream, mp3_meta

    m = mp3_meta(make_mp3_stream([128] * 10))
    assert m["n_frames"] == 10
    assert m["sample_rate"] == 44100
    # 10 frames x 1152 samples at 44100 Hz
    assert m["duration_ms"] == 10 * 1152 * 1000 // 44100
    assert m["bitrate_kbps_mean"] == 128 and not m["vbr"]
    assert (m["version"], m["layer"]) == ("MPEG1", 3)


def test_mp3_meta_versions_layers_and_vbr():
    from bergloom_spark.operators.avcodec import make_mp3_stream, mp3_meta

    m = mp3_meta(make_mp3_stream([64, 128, 96, 64], sample_rate=22050))
    assert m["version"] == "MPEG2" and m["vbr"]
    assert m["duration_ms"] == 4 * 576 * 1000 // 22050
    assert m["bitrate_kbps_mean"] == (64 + 128 + 96 + 64) // 4
    m1 = mp3_meta(make_mp3_stream([448] * 3, sample_rate=48000, layer=1))
    assert m1["layer"] == 1 and m1["duration_ms"] == 3 * 384 * 1000 // 48000
    m25 = mp3_meta(make_mp3_stream([40] * 7, sample_rate=11025))
    assert m25["version"] == "MPEG2.5"
    assert m25["duration_ms"] == 7 * 576 * 1000 // 11025


def test_mp3_meta_id3_and_garbage_prefix():
    from bergloom_spark.operators.avcodec import make_mp3_stream, mp3_meta

    with_id3 = make_mp3_stream([96] * 4, id3_bytes=300)
    assert with_id3[:3] == b"ID3"
    assert mp3_meta(with_id3)["n_frames"] == 4
    # junk before the first sync, incl. a false 0xFF that does not
    # chain to a second frame
    junk = b"\xff\xfbzz" + bytes(40)
    assert mp3_meta(junk + make_mp3_stream([96] * 4))["n_frames"] == 4


def test_mp3_meta_real_world_file():
    """Independent sanity: a real MP3 shipped with the system SDK.
    Assertions stay robust to the file's particulars (review r7): the
    walk must succeed, and for a CBR file without an ID3 tag the
    walked duration must agree with size/bitrate to 20%."""
    import os

    import pytest as _pytest

    from bergloom_spark.operators.avcodec import mp3_meta

    path = (
        "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
        "test_data/test.mp3"
    )
    if not os.path.exists(path):
        _pytest.skip("no system sample MP3")
    with open(path, "rb") as fh:
        d = fh.read()
    m = mp3_meta(d)
    assert m["n_frames"] > 0 and m["duration_ms"] > 0
    if not m["vbr"] and d[:3] != b"ID3":
        approx_ms = len(d) * 8 // m["bitrate_kbps_mean"]
        assert abs(m["duration_ms"] - approx_ms) <= approx_ms // 5


def test_mp3_meta_rejections():
    import pytest as _pytest

    from bergloom_spark.operators.avcodec import mp3_meta

    with _pytest.raises(ValueError, match="sync"):
        mp3_meta(b"definitely not audio " * 20)
    with _pytest.raises(ValueError, match="sync"):
        mp3_meta(b"")


def test_mp3_meta_review_r7_fixes():
    """Review r7: mixed-rate duration, Xing/Info skip, trailing false
    sync in garbage, free-format encoder rejection."""
    import pytest as _pytest

    from bergloom_spark.operators.avcodec import make_mp3_stream, mp3_meta

    # mixed sample rates: duration integrates per frame's own rate
    mixed = make_mp3_stream([128] * 5) + make_mp3_stream(
        [64] * 5, sample_rate=22050
    )
    m = mp3_meta(mixed)
    want = 5 * 1152 * 1_000_000 // 44100 + 5 * 576 * 1_000_000 // 22050
    assert m["n_frames"] == 10
    assert m["duration_ms"] == want // 1000
    assert m["sample_rate"] == 44100  # first audio frame's

    # a lone false sync whose frame runs past the buffer is garbage
    with _pytest.raises(ValueError, match="sync"):
        mp3_meta(bytes(50) + b"\xff\xfb\x92\x00" + bytes(10))

    # Xing/Info header frame excluded from stats
    audio = make_mp3_stream([128] * 4)
    one = make_mp3_stream([64])
    xing = bytearray(one)
    xing[4 + 17 : 4 + 21] = b"Xing"  # MPEG1 mono side-info offset
    m2 = mp3_meta(bytes(xing) + audio)
    assert m2["n_frames"] == 4
    assert m2["bitrate_kbps_mean"] == 128 and not m2["vbr"]

    with _pytest.raises(ValueError, match="free-format"):
        make_mp3_stream([0])


# ---------------------------------------------------------------------------
# MP3 tail tags (round 9, verdict r8 #8) + FLAC STREAMINFO sniff (#7)
# ---------------------------------------------------------------------------
def test_mp3_meta_ignores_tail_tags():
    from bergloom_spark.operators.avcodec import make_mp3_stream, mp3_meta

    base = mp3_meta(make_mp3_stream([128, 64, 128], sample_rate=44100))
    for tag in ("id3v1", "ape", "ape+id3v1"):
        tagged = make_mp3_stream(
            [128, 64, 128], sample_rate=44100, tail_tag=tag
        )
        assert mp3_meta(tagged) == base, tag


def test_mp3_meta_truncated_final_frame_with_tail_tag():
    # the advice-r8 scenario: stream cut mid-frame, then a 128-byte
    # ID3v1 tag appended — the tag bytes must not be counted toward
    # the final frame, so the truncated frame is dropped either way
    from bergloom_spark.operators.avcodec import make_mp3_stream, mp3_meta

    raw = make_mp3_stream([128] * 4, sample_rate=44100)
    cut = raw[:-50]
    m = mp3_meta(cut)
    assert m["n_frames"] == 3
    assert mp3_meta(cut + b"TAG" + bytes(125)) == m


def test_flac_meta_roundtrip_fields():
    from bergloom_spark.operators.avcodec import flac_meta, make_flac_stream

    s = make_flac_stream(
        48000, 2, 24, 480000, extra_blocks=3, audio_bytes=512
    )
    m = flac_meta(s)
    assert m == {
        "sample_rate": 48000,
        "channels": 2,
        "bits_per_sample": 24,
        "total_samples": 480000,
        "duration_ms": 10000,
        "min_block_size": 4096,
        "max_block_size": 4096,
        "n_metadata_blocks": 4,
    }
    # unknown length: total_samples 0 → duration 0, not a guess
    m0 = flac_meta(make_flac_stream(44100, 1, 16, 0))
    assert m0["total_samples"] == 0 and m0["duration_ms"] == 0
    # 36-bit boundary and odd rates floor-divide exactly
    m1 = flac_meta(make_flac_stream(44100, 8, 32, 44100 * 7 + 22049))
    assert m1["duration_ms"] == 7499


def test_flac_meta_rejections():
    import pytest

    from bergloom_spark.operators.avcodec import flac_meta, make_flac_stream

    with pytest.raises(ValueError, match="fLaC"):
        flac_meta(b"OggS" + bytes(100))
    with pytest.raises(ValueError, match="truncated"):
        flac_meta(b"fLaC\x00")
    good = make_flac_stream(44100, 2, 16, 1000)
    with pytest.raises(ValueError, match="truncated"):
        flac_meta(good[:-10])
    # first block must be STREAMINFO
    bad = bytearray(good)
    bad[4] = 0x81  # type 1 (padding), last
    with pytest.raises(ValueError, match="STREAMINFO"):
        flac_meta(bytes(bad))
    # zero sample rate is spec-invalid
    packed_zero_rate = bytearray(good)
    # rate occupies the top 20 bits of bytes 10..18 of the 34-byte body
    for i in range(8 + 10, 8 + 13):
        packed_zero_rate[i] &= 0x0F if i == 8 + 12 else 0x00
    with pytest.raises(ValueError, match="sample rate"):
        flac_meta(bytes(packed_zero_rate))


def test_flac_meta_never_reads_audio_bytes():
    from bergloom_spark.operators.avcodec import flac_meta, make_flac_stream

    a = make_flac_stream(32000, 1, 16, 64000, audio_bytes=0)
    b = make_flac_stream(32000, 1, 16, 64000, audio_bytes=4096)
    assert flac_meta(a) == flac_meta(b)


def test_video_meta_avi_and_y4m():
    import numpy as np

    from bergloom_spark.operators.avcodec import (
        encode_mjpeg_avi,
        encode_y4m,
        video_meta,
    )

    fr = [np.zeros((6, 8, 3), np.uint8) for _ in range(3)]
    assert video_meta(encode_mjpeg_avi(fr, fps=25)) == {
        "container": "avi", "width": 8, "height": 6, "n_frames": 3,
        "usec_per_frame": 40000, "duration_ms": 120,
    }
    assert video_meta(encode_y4m(np.zeros((4, 6, 8), np.uint8), fps=30)) == {
        "container": "y4m", "width": 8, "height": 6, "n_frames": 4,
        "usec_per_frame": 33333, "duration_ms": 133,
    }


def test_video_meta_rejections_and_fuzz():
    import numpy as np
    import pytest

    from bergloom_spark.operators.avcodec import (
        encode_mjpeg_avi,
        encode_y4m,
        video_meta,
    )

    with pytest.raises(ValueError, match="magic"):
        video_meta(b"fLaC" + bytes(40))
    avi = encode_mjpeg_avi([np.zeros((6, 8, 3), np.uint8)] * 2)
    y4m = encode_y4m(np.zeros((2, 4, 4), np.uint8))
    for payload in (avi, y4m):
        for cut in range(0, len(payload), max(1, len(payload) // 80)):
            try:
                video_meta(payload[:cut])
            except ValueError:
                pass
    # point mutations
    rng = np.random.RandomState(3)
    for payload in (avi, y4m):
        for _ in range(150):
            b = bytearray(payload)
            b[rng.randint(len(b))] = rng.randint(256)
            try:
                video_meta(bytes(b))
            except ValueError:
                pass  # the contract: sniff or ValueError, nothing else


def test_wav_meta_and_audio_meta_dispatch():
    import numpy as np
    import pytest

    from bergloom_spark.operators.avcodec import (
        audio_meta,
        encode_wav,
        make_flac_stream,
        make_mp3_stream,
        wav_meta,
    )
    from bergloom_spark.operators.oggvorbis import make_ogg_vorbis_stream

    w = wav_meta(encode_wav(np.zeros(22050, np.int16), 44100))
    assert w == {
        "sample_rate": 44100, "channels": 1, "bits_per_sample": 16,
        "n_samples": 22050, "duration_ms": 500,
    }
    assert audio_meta(encode_wav(np.zeros(100, np.int16), 8000)) == {
        "container": "wav", "sample_rate": 8000, "channels": 1,
        "duration_ms": 12,
    }
    assert audio_meta(make_flac_stream(48000, 5, 24, 48000)) == {
        "container": "flac", "sample_rate": 48000, "channels": 5,
        "duration_ms": 1000,
    }
    assert audio_meta(make_ogg_vorbis_stream(22050, 3, 44100)) == {
        "container": "ogg", "sample_rate": 22050, "channels": 3,
        "duration_ms": 2000,
    }
    m = audio_meta(make_mp3_stream([128, 128], sample_rate=44100,
                                   id3_bytes=64, tail_tag="ape+id3v1"))
    assert m["container"] == "mp3" and m["sample_rate"] == 44100
    assert m["channels"] == 1  # the generator writes mode=11 (mono)
    with pytest.raises(ValueError, match="magic"):
        audio_meta(b"MThd" + bytes(40))


def test_audio_meta_fuzz_contract():
    import numpy as np

    from bergloom_spark.operators.avcodec import audio_meta, encode_wav

    rng = np.random.RandomState(17)
    base = encode_wav(np.zeros(64, np.int16), 16000)
    for _ in range(200):
        b = bytearray(base)
        b[rng.randint(len(b))] = rng.randint(256)
        try:
            audio_meta(bytes(b))
        except ValueError:
            pass
    for magic in (b"RIFF\x10\x00\x00\x00WAVE", b"fLaC", b"OggS", b"ID3"):
        for _ in range(100):
            data = magic + bytes(rng.randint(0, 256, rng.randint(0, 200),
                                             dtype=np.uint8))
            try:
                audio_meta(bytes(data))
            except ValueError:
                pass


def test_mp3_channels_respect_false_sync_filter():
    """Review r9: channels must come from the first AUDIO frame (the
    one the false-sync/Xing filter accepts), not from the first raw
    4-byte header match. A stereo-mode false sync before a mono
    stream must not leak into the metadata."""
    from bergloom_spark.operators.avcodec import (
        audio_meta,
        make_mp3_stream,
        mp3_meta,
    )

    mono = make_mp3_stream([128, 128], sample_rate=44100)  # mode=11
    # 4-byte valid-looking stereo header (mode bits 00) + junk: its
    # implied next frame does not sync, so the walk must skip it
    false_sync = b"\xff\xfb\x90\x00" + bytes(10)
    payload = false_sync + mono
    m = mp3_meta(payload)
    assert m["channels"] == 1 and m["n_frames"] == 2
    a = audio_meta(payload)
    assert a["channels"] == 1 and a["sample_rate"] == 44100


def test_media_frame_count_all_containers():
    import numpy as np
    import pytest

    from bergloom_spark.operators.avcodec import (
        encode_mjpeg_avi,
        encode_y4m,
        media_frame_count,
    )
    from bergloom_spark.operators.gifcodec import encode_gif_frames
    from bergloom_spark.operators.tiffcodec import encode_tiff_pages
    from bergloom_spark.operators.webpcodec import (
        encode_webp_frames,
        encode_webp_lossless,
    )

    pal = np.stack([np.arange(256)] * 3, -1).astype(np.uint8)
    base = (np.arange(5)[:, None] * 7 + np.arange(8)[None, :]) % 256
    patch = np.array([[3, 255], [255, 4]])
    gif = encode_gif_frames(
        (8, 5), pal,
        [(0, 0, base, 1, None), (0, 1, patch, 2, 255),
         (2, 2, patch, 3, 255)],
    )
    assert media_frame_count(gif) == {"container": "gif", "n_frames": 3}
    # frame count must agree with the real decode
    from bergloom_spark.operators.gifcodec import decode_gif_frames

    assert media_frame_count(gif)["n_frames"] == len(decode_gif_frames(gif))

    rgb = np.zeros((4, 6, 3), np.uint8)
    anim = encode_webp_frames(
        (6, 4), [(0, 0, rgb, True, False), (0, 0, rgb, False, False)]
    )
    assert media_frame_count(anim) == {"container": "webp", "n_frames": 2}
    assert media_frame_count(encode_webp_lossless(rgb)) == {
        "container": "webp", "n_frames": 1,
    }
    tiff = encode_tiff_pages([np.zeros((3, 4, 3), np.uint8)] * 4)
    assert media_frame_count(tiff) == {"container": "tiff", "n_frames": 4}
    assert media_frame_count(encode_mjpeg_avi([rgb] * 3)) == {
        "container": "avi", "n_frames": 3,
    }
    assert media_frame_count(encode_y4m(np.zeros((5, 4, 4), np.uint8))) == {
        "container": "y4m", "n_frames": 5,
    }
    with pytest.raises(ValueError):
        media_frame_count(b"fLaC" + bytes(40))


def test_media_frame_count_fuzz_contract():
    import numpy as np

    from bergloom_spark.operators.avcodec import media_frame_count
    from bergloom_spark.operators.gifcodec import encode_gif_frames
    from bergloom_spark.operators.tiffcodec import encode_tiff_pages
    from bergloom_spark.operators.webpcodec import encode_webp_frames

    pal = np.stack([np.arange(256)] * 3, -1).astype(np.uint8)
    base = np.zeros((4, 4), np.int64)
    payloads = [
        encode_gif_frames((4, 4), pal, [(0, 0, base, 1, None)]),
        encode_webp_frames(
            (4, 4), [(0, 0, np.zeros((4, 4, 3), np.uint8), True, False)]
        ),
        encode_tiff_pages([np.zeros((2, 2, 3), np.uint8)] * 2),
    ]
    rng = np.random.RandomState(23)
    for payload in payloads:
        for cut in range(len(payload)):
            try:
                media_frame_count(payload[:cut])
            except ValueError:
                pass
        for _ in range(200):
            b = bytearray(payload)
            b[rng.randint(len(b))] = rng.randint(256)
            try:
                media_frame_count(bytes(b))
            except ValueError:
                pass


def test_media_frame_count_agrees_with_decoders_on_edge_shapes():
    """Review r9: triage must accept exactly what the decoders accept
    — a trailer-less GIF (common truncation) and a cycle-looped TIFF
    both decode, so the count must match, not raise."""
    import struct

    import numpy as np

    from bergloom_spark.operators.avcodec import media_frame_count
    from bergloom_spark.operators.gifcodec import (
        decode_gif_frames,
        encode_gif,
    )
    from bergloom_spark.operators.tiffcodec import (
        decode_tiff_pages,
        encode_tiff_pages,
    )

    img = np.zeros((4, 4, 3), np.uint8)
    gif = encode_gif(img)
    assert gif[-1] == 0x3B
    headless = gif[:-1]  # strip the trailer
    n_dec = len(decode_gif_frames(headless))
    assert media_frame_count(headless)["n_frames"] == n_dec == 1

    tiff = bytearray(encode_tiff_pages([img, img]))
    # point the LAST IFD's next-pointer back at IFD0 (offset word 4)
    endian = "<" if tiff[:2] == b"II" else ">"
    (off0,) = struct.unpack_from(endian + "I", tiff, 4)
    off = off0
    while True:
        (count,) = struct.unpack_from(endian + "H", tiff, off)
        nxt_at = off + 2 + 12 * count
        (nxt,) = struct.unpack_from(endian + "I", tiff, nxt_at)
        if nxt == 0:
            struct.pack_into(endian + "I", tiff, nxt_at, off0)
            break
        off = nxt
    looped = bytes(tiff)
    n_dec = len(decode_tiff_pages(looped))
    assert media_frame_count(looped)["n_frames"] == n_dec == 2


def test_media_frame_count_rejects_lossy_vp8_still():
    """ADVICE r10: triage must agree with what decode_media_frames
    will decode — a VP8-only (lossy) still raises in the decoder, so
    the frame-count sniff rejects it too instead of green-lighting
    a payload the explosion stage then rejects."""
    import pytest

    from bergloom_spark.operators.avcodec import media_frame_count

    body = b"VP8 " + (4).to_bytes(4, "little") + bytes(4)
    riff = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body
    with pytest.raises(ValueError, match="lossy VP8"):
        media_frame_count(riff)


# ---------------------------------------------------------------------------
# ID3v2 text frames (round 10, verdict r9 stretch #7; driver row r11)
# ---------------------------------------------------------------------------
def test_id3v2_roundtrip_all_versions_and_encodings():
    from bergloom_spark.operators.avcodec import id3v2_tags, make_id3v2

    for major in (2, 3, 4):
        for enc in (0, 1, 2, 3):
            title = "Tïtle" if enc else "Title"  # latin-1-safe either way
            tag = make_id3v2(
                title=title, artist="Artist A", album="LP",
                major=major, encoding=enc, padding=16,
            )
            got = id3v2_tags(tag)
            assert got == {
                "version": f"2.{major}", "title": title,
                "artist": "Artist A", "album": "LP",
            }


def test_id3v2_absent_fields_and_mp3_meta_agreement():
    from bergloom_spark.operators.avcodec import (
        id3v2_tags,
        make_id3v2,
        make_mp3_stream,
        mp3_meta,
    )

    tag = make_id3v2(title="only title")
    got = id3v2_tags(tag)
    assert (got["title"], got["artist"], got["album"]) == (
        "only title", None, None,
    )
    # prepended to real framing: mp3_meta's syncsafe skip must land
    # exactly past the tag and report identical audio metadata
    audio = make_mp3_stream([128, 128, 64], sample_rate=44100)
    assert mp3_meta(tag + audio) == mp3_meta(audio)
    assert id3v2_tags(tag + audio)["title"] == "only title"


def test_id3v2_rejections():
    import pytest

    from bergloom_spark.operators.avcodec import id3v2_tags, make_id3v2

    with pytest.raises(ValueError, match="no leading ID3v2"):
        id3v2_tags(b"\xff\xfb" + bytes(32))
    bad = bytearray(make_id3v2(title="x"))
    bad[3] = 5  # unsupported major version
    with pytest.raises(ValueError, match="ID3v2.5"):
        id3v2_tags(bytes(bad))
    unsync = bytearray(make_id3v2(title="x"))
    unsync[5] = 0x80
    with pytest.raises(ValueError, match="unsynchronised"):
        id3v2_tags(bytes(unsync))
    # frame running past the tag boundary
    overrun = bytearray(make_id3v2(title="abcdef"))
    i = bytes(overrun).find(b"TIT2") + 4
    overrun[i : i + 4] = bytes((0, 0, 0x7F, 0x7F))
    with pytest.raises(ValueError, match="runs past"):
        id3v2_tags(bytes(overrun))


def test_id3v2_fuzz_contract():
    import numpy as np

    from bergloom_spark.operators.avcodec import id3v2_tags, make_id3v2

    rng = np.random.RandomState(11)
    base = make_id3v2(
        title="fuzz", artist="aa", album="bb", major=3, encoding=1,
        padding=8,
    )
    for cut in range(len(base)):
        try:
            id3v2_tags(base[:cut])
        except ValueError:
            pass
    for _ in range(2000):
        b = bytearray(base)
        for _ in range(1 + rng.randint(4)):
            b[rng.randint(len(b))] = rng.randint(256)
        try:
            id3v2_tags(bytes(b))
        except ValueError:
            pass


def test_id3v24_frame_level_unsync_and_flags():
    """Review r10: v2.4 frame-level unsynchronisation (flag 0x02)
    must be reversed (stuffed 0x00 bytes were returned inside the
    text), grouping/DLI prefixes skipped, and compressed/encrypted
    frames rejected."""
    import pytest

    from bergloom_spark.operators.avcodec import id3v2_tags

    def frame(fid, fl2, body):
        n = len(body)
        size = bytes((n >> 21 & 0x7F, n >> 14 & 0x7F,
                      n >> 7 & 0x7F, n & 0x7F))
        return fid + size + bytes((0, fl2)) + body

    def tag(frames):
        n = len(frames)
        return (
            b"ID3\x04\x00\x00"
            + bytes((n >> 21 & 0x7F, n >> 14 & 0x7F,
                     n >> 7 & 0x7F, n & 0x7F))
            + frames
        )

    # latin-1 text whose bytes contain a 0xFF that the writer
    # unsynchronises to 0xFF 0x00
    text = b"\x00a\xffb"  # enc byte latin-1 + "a\xffb"
    stuffed = text.replace(b"\xff", b"\xff\x00")
    t = tag(frame(b"TIT2", 0x02, stuffed))
    assert id3v2_tags(t)["title"] == "a\xffb"
    # grouping byte + DLI + unsync combined
    import struct as _st

    dli = bytes((0, 0, 0, len(text)))
    t2 = tag(frame(b"TPE1", 0x43, b"\x07" + (dli + text).replace(
        b"\xff", b"\xff\x00")))
    assert id3v2_tags(t2)["artist"] == "a\xffb"
    # compressed / encrypted reject
    for fl2 in (0x08, 0x04):
        with pytest.raises(ValueError, match="not supported"):
            id3v2_tags(tag(frame(b"TALB", fl2, text)))
    # v2.3 compressed/encrypted reject + grouping skip
    def frame3(fid, fl2, body):
        return fid + len(body).to_bytes(4, "big") + bytes((0, fl2)) + body

    t3 = (b"ID3\x03\x00\x00"
          + bytes((0, 0, 0, len(frame3(b"TIT2", 0x20, b"\x07" + text)))))
    t3 += frame3(b"TIT2", 0x20, b"\x07" + text)
    assert id3v2_tags(t3)["title"] == "a\xffb"
    bad3 = frame3(b"TIT2", 0x80, text)
    t3b = (b"ID3\x03\x00\x00"
           + bytes((0, 0, 0, len(bad3)))) + bad3
    with pytest.raises(ValueError, match="not supported"):
        id3v2_tags(t3b)


# ---------------------------------------------------------------------------
# AIFF/AIFF-C triage (round 10; driver row candidate r11)
# ---------------------------------------------------------------------------
def test_aiff_roundtrip_and_extended_float_rates():
    from bergloom_spark.operators.avcodec import aiff_meta, make_aiff

    for rate in (8000, 11025, 22050, 44100, 48000, 96000, 192000):
        m = aiff_meta(make_aiff(rate, 2, 16, rate * 3, audio_bytes=32))
        assert m["sample_rate"] == rate
        assert m["duration_ms"] == 3000
        assert m["compression"] is None
    c = aiff_meta(make_aiff(44100, 1, 16, 44100, compression="sowt"))
    assert (c["compression"], c["duration_ms"]) == ("sowt", 1000)


def test_aiff_audio_meta_route_and_rejections():
    import pytest

    from bergloom_spark.operators.avcodec import (
        aiff_meta,
        audio_meta,
        make_aiff,
    )

    a = audio_meta(make_aiff(22050, 4, 24, 11025))
    assert a == {
        "container": "aiff", "sample_rate": 22050, "channels": 4,
        "duration_ms": 500,
    }
    with pytest.raises(ValueError, match="FORM"):
        aiff_meta(b"RIFF" + bytes(20))
    # zero rate (exp=0, mant=0)
    bad = bytearray(make_aiff(44100, 2, 16, 100))
    i = bytes(bad).find(b"COMM") + 8 + 8
    bad[i : i + 10] = bytes(10)
    with pytest.raises(ValueError, match="rate"):
        aiff_meta(bytes(bad))
    # inf/NaN rate (exp=0x7FFF)
    bad[i : i + 2] = b"\x7f\xff"
    with pytest.raises(ValueError, match="inf"):
        aiff_meta(bytes(bad))


def test_aiff_fuzz_contract():
    import numpy as np

    from bergloom_spark.operators.avcodec import aiff_meta, make_aiff

    rng = np.random.RandomState(14)
    base = make_aiff(44100, 2, 16, 44100, compression="NONE",
                     audio_bytes=64)
    for cut in range(len(base)):
        try:
            aiff_meta(base[:cut])
        except ValueError:
            pass
    for _ in range(2000):
        b = bytearray(base)
        for _ in range(1 + rng.randint(4)):
            b[rng.randint(len(b))] = rng.randint(256)
        try:
            aiff_meta(bytes(b))
        except ValueError:
            pass
