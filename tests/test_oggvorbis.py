"""Ogg-Vorbis triage sniff tests (round 9).

Layers: field roundtrips over the generator space, the CRC gate
(corrupted header pages must raise, not return garbage), lacing-edge
pages (bodies at exact 255-multiples need a trailing 0 lacing value),
and the decode-or-ValueError fuzz contract.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bergloom_spark.operators.oggvorbis import (
    _ogg_crc,
    make_ogg_vorbis_stream,
    ogg_vorbis_meta,
)


def test_roundtrip_fields():
    s = make_ogg_vorbis_stream(
        44100, 2, 441000, nominal_bitrate=128000, n_audio_pages=3
    )
    m = ogg_vorbis_meta(s)
    assert m == {
        "sample_rate": 44100,
        "channels": 2,
        "total_samples": 441000,
        "duration_ms": 10000,
        "nominal_bitrate": 128000,
        "n_pages": 4,
    }


@given(
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000, 96000]),
    channels=st.integers(1, 8),
    total=st.integers(0, 1 << 40),
    pages=st.integers(1, 5),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_generator_space(rate, channels, total, pages):
    s = make_ogg_vorbis_stream(rate, channels, total, n_audio_pages=pages)
    m = ogg_vorbis_meta(s)
    assert m["sample_rate"] == rate
    assert m["channels"] == channels
    assert m["total_samples"] == total
    assert m["duration_ms"] == total * 1000 // rate
    assert m["n_pages"] == pages + 1


def test_crc_gate_on_header_pages():
    s = bytearray(make_ogg_vorbis_stream(44100, 2, 1000))
    # flip a byte inside the id-header body (first page, after the
    # 27+1-byte header + lacing) — CRC must catch it
    s[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        ogg_vorbis_meta(bytes(s))


def test_exact_255_multiple_body_lacing():
    # a body of exactly 510 bytes needs lacing [255, 255, 0]
    s = make_ogg_vorbis_stream(
        48000, 1, 12345, n_audio_pages=1, audio_bytes_per_page=510
    )
    m = ogg_vorbis_meta(s)
    assert m["total_samples"] == 12345 and m["n_pages"] == 2


def test_rejections():
    with pytest.raises(ValueError, match="OggS"):
        ogg_vorbis_meta(b"fLaC" + bytes(50))
    good = make_ogg_vorbis_stream(44100, 2, 1000)
    with pytest.raises(ValueError, match="truncated"):
        ogg_vorbis_meta(good[:-5])
    # non-vorbis BOS packet
    from bergloom_spark.operators.oggvorbis import _make_page

    # replace the BOS page with a non-vorbis one, keeping the
    # downstream pages VALIDLY framed (splice at good's own first
    # page boundary — review r9: a misaligned splice would make this
    # test pass for the wrong reason if the id check ever moved)
    from bergloom_spark.operators.oggvorbis import _parse_page

    good_first_len = _parse_page(good, 0, verify_crc=True)["size"]
    bad_bos = _make_page(b"\x7fFLAC" + bytes(30), 0, 0, 0x02)
    bad = bad_bos + good[good_first_len:]
    with pytest.raises(ValueError, match="Vorbis id header"):
        ogg_vorbis_meta(bad)


def test_missing_eos_rejected():
    s = make_ogg_vorbis_stream(44100, 2, 1000, n_audio_pages=2)
    # strip the final page: the new last page is not EOS
    from bergloom_spark.operators.oggvorbis import _parse_page

    pos, pages = 0, []
    while pos < len(s):
        p = _parse_page(s, pos, verify_crc=False)
        pages.append((pos, p["size"]))
        pos += p["size"]
    cut = s[: pages[-1][0]]
    with pytest.raises(ValueError, match="EOS"):
        ogg_vorbis_meta(cut)


def test_crc_impl_is_the_ogg_variant():
    # Known property: Ogg CRC is unreflected poly 0x04C11DB7, init 0.
    # Pin a couple of fixed vectors computed from the definition.
    assert _ogg_crc(b"") == 0
    assert _ogg_crc(b"\x01") == 0x04C11DB7
    # linearity sanity: crc(00) shifts, never equals crc(01)
    assert _ogg_crc(b"\x00") == 0
    assert _ogg_crc(b"\x00\x01") == 0x04C11DB7


@given(data=st.binary(min_size=0, max_size=400))
@settings(max_examples=120, deadline=None)
def test_fuzz_random_bytes_never_crash(data):
    try:
        ogg_vorbis_meta(b"OggS" + data)
    except ValueError:
        pass


@given(pos=st.integers(0, 10**6), val=st.integers(0, 255))
@settings(max_examples=150, deadline=None)
def test_fuzz_point_mutations_never_crash(pos, val):
    payload = bytearray(
        make_ogg_vorbis_stream(44100, 2, 88200, n_audio_pages=2)
    )
    payload[pos % len(payload)] = val
    try:
        ogg_vorbis_meta(bytes(payload))
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# Ogg-Opus (round 10 — RFC 7845; driver row candidate r11)
# ---------------------------------------------------------------------------
def test_opus_roundtrip_and_duration_arithmetic():
    from bergloom_spark.operators.oggvorbis import (
        make_ogg_opus_stream,
        ogg_opus_meta,
    )

    p = make_ogg_opus_stream(
        2, playable_samples=96000, pre_skip=312,
        input_sample_rate=44100, n_audio_pages=3,
    )
    m = ogg_opus_meta(p)
    assert m == {
        "sample_rate": 44100,
        "channels": 2,
        "pre_skip": 312,
        "total_samples": 96000,
        "duration_ms": 96000 * 1000 // 48000,
        "n_pages": 5,  # BOS + OpusTags + 3 audio
    }


def test_opus_unknown_input_rate_reports_native_48k():
    from bergloom_spark.operators.oggvorbis import (
        make_ogg_opus_stream,
        ogg_opus_meta,
    )

    m = ogg_opus_meta(
        make_ogg_opus_stream(1, 4800, input_sample_rate=0)
    )
    assert m["sample_rate"] == 48000


def test_ogg_meta_dispatch_and_audio_meta_route():
    from bergloom_spark.operators.avcodec import audio_meta
    from bergloom_spark.operators.oggvorbis import (
        make_ogg_opus_stream,
        make_ogg_vorbis_stream,
        ogg_meta,
    )

    v = ogg_meta(make_ogg_vorbis_stream(44100, 2, 44100))
    assert (v["codec"], v["sample_rate"]) == ("vorbis", 44100)
    o = ogg_meta(make_ogg_opus_stream(6, 48000))
    assert (o["codec"], o["channels"]) == ("opus", 6)
    a = audio_meta(make_ogg_opus_stream(2, 24000, pre_skip=0))
    assert a == {
        "container": "ogg", "sample_rate": 48000, "channels": 2,
        "duration_ms": 500,
    }
    import pytest

    from bergloom_spark.operators.oggvorbis import _make_page

    with pytest.raises(ValueError, match="neither Vorbis nor Opus"):
        ogg_meta(_make_page(b"\x7fFLAC....", 0, 0, 0x02))


def test_opus_rejections_and_fuzz():
    import numpy as np
    import pytest

    from bergloom_spark.operators.oggvorbis import (
        make_ogg_opus_stream,
        ogg_opus_meta,
    )

    base = make_ogg_opus_stream(2, 9600, pre_skip=312)
    # granule below pre-skip: hand-build spec-valid pages (review
    # r10 — mutating header bytes fails the CRC check BEFORE the
    # pre-skip guard, leaving it uncovered)
    from bergloom_spark.operators.oggvorbis import _make_page

    head = (
        b"OpusHead" + bytes((1, 2))
        + (50000).to_bytes(2, "little")
        + (48000).to_bytes(4, "little")
        + (0).to_bytes(2, "little") + bytes((0,))
    )
    bad = _make_page(head, 0, 0, 0x02) + _make_page(bytes(8), 10, 1, 0x04)
    with pytest.raises(ValueError, match="below pre-skip"):
        ogg_opus_meta(bad)
    # family 0 with >2 channels is RFC-7845-invalid
    h6 = bytearray(head)
    h6[9] = 6
    bad6 = _make_page(bytes(h6), 0, 0, 0x02) + _make_page(
        bytes(8), 60000, 1, 0x04
    )
    with pytest.raises(ValueError, match="family 0"):
        ogg_opus_meta(bad6)
    rng = np.random.RandomState(13)
    for cut in range(0, len(base), 3):
        try:
            ogg_opus_meta(base[:cut])
        except ValueError:
            pass
    for _ in range(1500):
        b = bytearray(base)
        for _ in range(1 + rng.randint(4)):
            b[rng.randint(len(b))] = rng.randint(256)
        try:
            ogg_opus_meta(bytes(b))
        except ValueError:
            pass
