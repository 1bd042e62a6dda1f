"""Matroska/WebM EBML sniff tests (round 10, verdict r9 stretch #8;
driver row in r11).

Layers: exact roundtrips through the in-repo writer (mkv + webm,
varying timestamp scales, unknown-size Segment, track subsets),
rejections, and the fuzz contract (any bytes → parse or ValueError,
never a crash or hang).
"""

from __future__ import annotations

import numpy as np
import pytest

from bergloom_spark.operators.ebml import make_mkv_stream, mkv_meta


def test_roundtrip_mkv():
    p = make_mkv_stream(
        734_000, video=("V_AV1", 1920, 1080), audio=("A_AAC", 44100, 6),
        cluster_bytes=128,
    )
    assert mkv_meta(p) == {
        "container": "mkv",
        "duration_ms": 734_000,
        "n_tracks": 2,
        "width": 1920,
        "height": 1080,
        "video_codec": "V_AV1",
        "audio_rate": 44100,
        "audio_channels": 6,
        "audio_codec": "A_AAC",
    }


def test_webm_unknown_segment_size_and_scales():
    for scale in (100_000, 1_000_000, 10_000_000):
        p = make_mkv_stream(
            5_120, webm=True, timestamp_scale=scale,
            unknown_segment_size=True,
        )
        m = mkv_meta(p)
        assert (m["container"], m["duration_ms"]) == ("webm", 5_120)


def test_track_subsets_and_absent_duration():
    v_only = mkv_meta(make_mkv_stream(1000, audio=None))
    assert v_only["audio_codec"] is None and v_only["n_tracks"] == 1
    a_only = mkv_meta(make_mkv_stream(None, video=None))
    assert a_only["duration_ms"] is None
    assert a_only["width"] is None
    assert a_only["audio_codec"] == "A_OPUS"


def test_rejections():
    with pytest.raises(ValueError, match="EBML"):
        mkv_meta(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="leading id"):
        mkv_meta(b"\x1f\x43\xb6\x75\x81\x00")  # Cluster id first
    # doctype that is not matroska/webm
    p = bytearray(make_mkv_stream(100))
    i = bytes(p).find(b"matroska")
    p[i : i + 8] = b"theorafi"
    with pytest.raises(ValueError, match="DocType"):
        mkv_meta(bytes(p))
    # element running past its parent
    p2 = bytearray(make_mkv_stream(100))
    j = bytes(p2).find(b"\x2a\xd7\xb1") + 3
    p2[j] = 0xBF  # TimestampScale size 0x3F: far past Info's end
    with pytest.raises(ValueError, match="runs past|truncated"):
        mkv_meta(bytes(p2))


def test_fuzz_contract():
    rng = np.random.RandomState(12)
    base = make_mkv_stream(
        90_061, video=("V_VP8", 320, 240), audio=("A_VORBIS", 48000, 2),
        cluster_bytes=32,
    )
    for cut in range(len(base)):
        try:
            mkv_meta(base[:cut])
        except ValueError:
            pass
    for _ in range(2500):
        b = bytearray(base)
        for _ in range(1 + rng.randint(4)):
            b[rng.randint(len(b))] = rng.randint(256)
        try:
            mkv_meta(bytes(b))
        except ValueError:
            pass


def test_infinite_duration_rejects_not_overflows():
    """r10 fuzz campaign (532k payloads): a mutated Duration float of
    +inf reached int() and raised OverflowError instead of the
    contract's ValueError. Exact finding bytes pinned."""
    import os

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "mkv_inf_duration.bin"
    )
    with open(path, "rb") as fh:
        payload = fh.read()
    with pytest.raises(ValueError):
        mkv_meta(payload)
    # the synthetic class: inf, nan, and negative duration floats
    import struct as _st

    base = make_mkv_stream(1000)
    for bad in (float("inf"), float("nan"), -1.0):
        p = bytearray(base)
        i = bytes(p).find(b"\x44\x89\x88") + 3  # Duration, 8-byte body
        p[i : i + 8] = _st.pack(">d", bad)
        with pytest.raises(ValueError, match="finite"):
            mkv_meta(bytes(p))


def test_finite_huge_duration_rejects_not_overflows():
    """Review r10: a FINITE-huge Duration (1e307) passes the _float
    guard but duration*scale overflows float64 to inf — int(inf)
    raised OverflowError instead of the contract's ValueError."""
    import struct as _st

    p = bytearray(make_mkv_stream(1000))
    i = bytes(p).find(b"\x44\x89\x88") + 3
    p[i : i + 8] = _st.pack(">d", 1e307)
    with pytest.raises(ValueError, match="overflows"):
        mkv_meta(bytes(p))
