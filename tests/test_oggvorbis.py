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
