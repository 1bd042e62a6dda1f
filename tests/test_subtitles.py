"""SRT/WebVTT subtitle parsing tests (round 9; driver rows in r10).

Layers: exact roundtrips through the in-repo writers, real-world
tolerances (dot separators, BOM, CRLF, cue settings, NOTE blocks,
non-sequential numbering), stats arithmetic, and the fuzz contract
(any bytes → parse or ValueError, never a crash or hang).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bergloom_spark.operators.subtitles import (
    make_srt,
    make_vtt,
    parse_srt,
    parse_subtitles,
    parse_vtt,
    subtitle_stats,
)

CUES = [
    (0, 1500, "Hello there."),
    (1500, 3700, "Two lines\nof text"),
    (3600, 5000, "overlapping cue"),
    (3_600_000 + 61_000 + 1, 3_600_000 + 62_000, "past one hour"),
]


def test_srt_roundtrip():
    assert parse_srt(make_srt(CUES)) == CUES


def test_vtt_roundtrip_with_note():
    assert parse_vtt(make_vtt(CUES, note="generated")) == CUES


def test_dispatch_by_magic():
    assert parse_subtitles(make_srt(CUES)) == ("srt", CUES)
    assert parse_subtitles(make_vtt(CUES)) == ("vtt", CUES)
    # BOM before the WEBVTT magic still dispatches to vtt
    assert parse_subtitles(b"\xef\xbb\xbf" + make_vtt(CUES))[0] == "vtt"


def test_real_world_tolerances():
    # dot decimal separator in SRT, CRLF line endings, no numbering
    raw = b"00:00:01.000 --> 00:00:02.000\r\nhi\r\n\r\n"
    assert parse_srt(raw) == [(1000, 2000, "hi")]
    # VTT cue settings after the end timestamp; hourless timestamps
    raw = (b"WEBVTT\n\n01:02.500 --> 01:03.000 line:0 align:start\n"
           b"styled cue\n")
    assert parse_vtt(raw) == [(62500, 63000, "styled cue")]
    # VTT identifier line before the timing line
    raw = b"WEBVTT\n\nintro-cue\n00:00.000 --> 00:01.000\nnamed\n"
    assert parse_vtt(raw) == [(0, 1000, "named")]


def test_rejections():
    with pytest.raises(ValueError, match="WEBVTT"):
        parse_vtt(b"not a vtt file")
    with pytest.raises(ValueError, match="timing"):
        parse_srt(b"1\njust text no timing\n")
    with pytest.raises(ValueError, match="timestamp"):
        parse_srt(b"1\n00:99:00,000 --> 00:00:01,000\nx\n")
    with pytest.raises(ValueError, match="before"):
        parse_srt(b"1\n00:00:05,000 --> 00:00:01,000\nx\n")
    with pytest.raises(ValueError, match="UTF-8"):
        parse_srt(b"1\n00:00:01,000 --> 00:00:02,000\n\xff\xfe\n")


def test_stats_arithmetic():
    s = subtitle_stats(CUES)
    assert s["n_cues"] == 4
    assert s["total_ms"] == 1500 + 2200 + 1400 + 999
    assert s["span_ms"] == 3_600_000 + 62_000 - 0
    assert s["n_chars"] == sum(len(t) for _, _, t in CUES)
    assert s["overlap_ms"] == 100  # cues 2 and 3: 3600..3700
    assert subtitle_stats([]) == {
        "n_cues": 0, "total_ms": 0, "span_ms": 0, "n_chars": 0,
        "overlap_ms": 0,
    }


@given(data=st.binary(min_size=0, max_size=300))
@settings(max_examples=150, deadline=None)
def test_fuzz_random_bytes_never_crash(data):
    for fn in (parse_srt, parse_vtt, parse_subtitles):
        try:
            fn(data)
        except ValueError:
            pass


@given(pos=st.integers(0, 10**6), val=st.integers(0, 255))
@settings(max_examples=200, deadline=None)
def test_fuzz_point_mutations_never_crash(pos, val):
    payload = bytearray(make_srt(CUES))
    payload[pos % len(payload)] = val
    for fn in (parse_srt, parse_subtitles):
        try:
            fn(bytes(payload))
        except ValueError:
            pass


def test_srt_cue_number_validated_as_integer():
    """ADVICE r10: the docstring's 'validated as integers when
    present' claim is now implemented — a non-numeric identifier
    line rejects as not-SRT framing."""
    good = b"12\n00:00:00,000 --> 00:00:01,000\nhi\n"
    assert parse_srt(good) == [(0, 1000, "hi")]
    bad = b"chapter-one\n00:00:00,000 --> 00:00:01,000\nhi\n"
    with pytest.raises(ValueError, match="identifier"):
        parse_srt(bad)


def test_srt_identifier_rejects_int_grammar_lookalikes():
    """Review r10: int()'s lenient grammar admitted '1_0', signed,
    padded, and unicode-digit identifiers — none are SubRip
    framing."""
    for ident in (b"1_0", b"-5", b"+3", "١".encode()):
        bad = ident + b"\n00:00:00,000 --> 00:00:01,000\nhi\n"
        with pytest.raises(ValueError):
            parse_srt(bad)
    # surrounding whitespace IS tolerated (the identifier line is
    # stripped before validation, same stance as timestamp tokens)
    ok = b" 7 \n00:00:00,000 --> 00:00:01,000\nhi\n"
    assert parse_srt(ok) == [(0, 1000, "hi")]
