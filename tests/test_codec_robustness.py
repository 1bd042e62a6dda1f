"""Malformed-payload robustness across ALL image codecs (round 6).

The corpus-decode contract: any byte string either decodes or raises
ValueError — never IndexError / struct.error / KeyError /
StopIteration, which would escape a ``mapInPandas`` batch as a
confusing non-ValueError failure and can't be handled uniformly by a
skip-bad-records wrapper. Exercised three ways: pure random bytes,
random bytes behind each codec's REAL magic, and valid payloads with
point mutations / truncations (the shapes a damaged crawl actually
produces).
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bergloom_spark.operators.imagecodec import decode_image_array

_OK_ERRORS = (ValueError, zlib.error)
# zlib.error: PNG IDAT inflation of garbage — a stdlib error type with
# a clear message; everything else must be ValueError.

_MAGICS = [
    b"P6",
    b"BM",
    b"\xff\xd8",
    b"\x89PNG\r\n\x1a\n",
    b"GIF89a",
    b"GIF87a",
    b"II",
    b"MM",
    b"RIFF\x20\x00\x00\x00WEBPVP8L",
]


def _check(payload: bytes) -> None:
    try:
        out = decode_image_array(payload)
    except _OK_ERRORS:
        return
    assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3


@given(data=st.binary(min_size=0, max_size=400))
@settings(max_examples=120, deadline=None)
def test_random_bytes_never_crash(data):
    _check(data)


@given(
    magic=st.sampled_from(_MAGICS),
    data=st.binary(min_size=0, max_size=400),
)
@settings(max_examples=200, deadline=None)
def test_random_bytes_behind_real_magic_never_crash(magic, data):
    _check(magic + data)


def _valid_payloads():
    from bergloom_spark.operators.gifcodec import encode_gif
    from bergloom_spark.operators.imagecodec import encode_bmp, encode_ppm
    from bergloom_spark.operators.jpegcodec import encode_jpeg_baseline
    from bergloom_spark.operators.jpegprogressive import (
        encode_jpeg_progressive,
    )
    from bergloom_spark.operators.pngcodec import encode_png
    from bergloom_spark.operators.tiffcodec import encode_tiff
    from bergloom_spark.operators.webpcodec import encode_webp_lossless

    img = np.random.RandomState(5).randint(
        0, 4, size=(9, 11, 3)
    ).astype(np.uint8) * 80
    return [
        encode_ppm(img),
        encode_bmp(img),
        encode_jpeg_baseline(img, 90),
        encode_jpeg_progressive(img, 90),
        encode_png(img),
        encode_gif(img),
        encode_tiff(img, compression="packbits"),
        encode_tiff(img, compression="lzw"),
        encode_webp_lossless(img),
    ]


@pytest.mark.parametrize("pi", range(9))
def test_every_truncation_never_crashes(pi):
    payload = _valid_payloads()[pi]
    step = max(1, len(payload) // 150)
    for cut in range(0, len(payload), step):
        _check(payload[:cut])


@given(
    pi=st.integers(0, 8),
    pos=st.integers(0, 10**6),
    val=st.integers(0, 255),
)
@settings(max_examples=250, deadline=None)
def test_point_mutations_never_crash(pi, pos, val):
    payload = bytearray(_valid_payloads()[pi])
    payload[pos % len(payload)] = val
    _check(bytes(payload))


# ---- animated-GIF frame decode (round 7): same contract -------------
def _animated_gif() -> bytes:
    from bergloom_spark.operators.gifcodec import encode_gif_frames

    pal = np.stack(
        [np.arange(256)] * 3, axis=-1
    ).astype(np.uint8)
    base = (np.arange(6)[:, None] * 7 + np.arange(8)[None, :]) % 256
    patch = np.array([[9, 255], [255, 11]])
    return encode_gif_frames(
        (8, 6),
        pal,
        [
            (0, 0, base, 1, None),
            (0, 1, patch, 3, 255),
            (2, 2, patch, 2, 255),
        ],
    )


def _check_frames(payload: bytes) -> None:
    from bergloom_spark.operators.gifcodec import decode_gif_frames

    try:
        out = decode_gif_frames(payload)
    except _OK_ERRORS:
        return
    assert out.dtype == np.uint8 and out.ndim == 4 and out.shape[3] == 3


@given(data=st.binary(min_size=0, max_size=400))
@settings(max_examples=120, deadline=None)
def test_gif_frames_random_bytes_never_crash(data):
    _check_frames(b"GIF89a" + data)


@given(pos=st.integers(0, 10**6), val=st.integers(0, 255))
@settings(max_examples=200, deadline=None)
def test_gif_frames_point_mutations_never_crash(pos, val):
    payload = bytearray(_animated_gif())
    payload[pos % len(payload)] = val
    _check_frames(bytes(payload))


def test_gif_frames_truncations_never_crash():
    payload = _animated_gif()
    for cut in range(len(payload)):
        _check_frames(payload[:cut])


# ---- animated-WebP frame decode (round 9): same contract ------------
def _animated_webp() -> bytes:
    from bergloom_spark.operators.webpcodec import encode_webp_frames

    rng = np.random.RandomState(99)
    base = rng.randint(0, 256, (6, 8, 3)).astype(np.uint8)
    patch = rng.randint(0, 256, (2, 2, 4)).astype(np.uint8)
    patch[:, :, 3] = [[255, 0], [0, 255]]
    return encode_webp_frames(
        (8, 6),
        [
            (0, 0, base, True, False),
            (2, 2, patch, False, True),
            (4, 0, patch, True, False),
        ],
    )


def _check_webp_frames(payload: bytes) -> None:
    from bergloom_spark.operators.webpcodec import decode_webp_frames

    try:
        out = decode_webp_frames(payload)
    except _OK_ERRORS:
        return
    for f in out:
        assert f.dtype == np.uint8 and f.ndim == 3 and f.shape[2] == 3


@given(data=st.binary(min_size=0, max_size=400))
@settings(max_examples=120, deadline=None)
def test_webp_frames_random_bytes_never_crash(data):
    _check_webp_frames(b"RIFF\x20\x00\x00\x00WEBP" + data)


@given(pos=st.integers(0, 10**6), val=st.integers(0, 255))
@settings(max_examples=200, deadline=None)
def test_webp_frames_point_mutations_never_crash(pos, val):
    payload = bytearray(_animated_webp())
    payload[pos % len(payload)] = val
    _check_webp_frames(bytes(payload))


def test_webp_frames_truncations_never_crash():
    payload = _animated_webp()
    for cut in range(len(payload)):
        _check_webp_frames(payload[:cut])


# ---- audio metadata sniffers (round 9): same contract ---------------
def _check_flac(payload: bytes) -> None:
    from bergloom_spark.operators.avcodec import flac_meta

    try:
        flac_meta(payload)
    except ValueError:
        return


@given(data=st.binary(min_size=0, max_size=400))
@settings(max_examples=120, deadline=None)
def test_flac_meta_random_bytes_never_crash(data):
    _check_flac(b"fLaC" + data)


@given(pos=st.integers(0, 10**6), val=st.integers(0, 255))
@settings(max_examples=150, deadline=None)
def test_flac_meta_point_mutations_never_crash(pos, val):
    from bergloom_spark.operators.avcodec import make_flac_stream

    payload = bytearray(
        make_flac_stream(44100, 2, 16, 88200, extra_blocks=2,
                         audio_bytes=64)
    )
    payload[pos % len(payload)] = val
    _check_flac(bytes(payload))


def test_flac_meta_truncations_never_crash():
    from bergloom_spark.operators.avcodec import make_flac_stream

    payload = make_flac_stream(44100, 2, 16, 88200, extra_blocks=2)
    for cut in range(len(payload)):
        _check_flac(payload[:cut])


@given(data=st.binary(min_size=0, max_size=300))
@settings(max_examples=120, deadline=None)
def test_mp3_meta_with_tail_bytes_never_crash(data):
    from bergloom_spark.operators.avcodec import make_mp3_stream, mp3_meta

    payload = make_mp3_stream([64, 128], sample_rate=22050) + data
    try:
        mp3_meta(payload)
    except ValueError:
        pass


# ---- fuzz r9 finds: corrupt-DHT DC category and zero sampling ------
def test_corrupt_dc_category_raises_valueerror():
    """A DHT may define any byte symbol; a DC category > 15 must be
    rejected, not build a 255-bit int that overflows the int64 block
    (found by the r9 high-volume mutation fuzz)."""
    from bergloom_spark.operators.jpegcodec import encode_jpeg_baseline

    img = np.random.RandomState(9).randint(
        0, 256, (8, 8, 3)
    ).astype(np.uint8)
    payload = bytearray(encode_jpeg_baseline(img, 90))
    # rewrite the first DHT's symbol list to emit category 0xFF for
    # the shortest code: find the DHT marker and poke its first value
    i = bytes(payload).find(b"\xff\xc4")
    assert i > 0
    # DHT layout: marker(2) len(2) tc/th(1) bits(16) values...
    payload[i + 21] = 0xFF  # first symbol value
    _check(bytes(payload))  # decode or ValueError — never Overflow


def test_zero_sampling_factor_raises_valueerror():
    """SOF sampling factors are 1..4 per the spec; 0 must reject, not
    divide by zero in the upsample step (found by the r9 fuzz)."""
    from bergloom_spark.operators.jpegcodec import encode_jpeg_baseline
    from bergloom_spark.operators.jpegprogressive import (
        encode_jpeg_progressive,
    )

    img = np.random.RandomState(9).randint(
        0, 256, (8, 8, 3)
    ).astype(np.uint8)
    for enc, sof in ((encode_jpeg_baseline, b"\xff\xc0"),
                     (encode_jpeg_progressive, b"\xff\xc2")):
        payload = bytearray(enc(img, 90))
        i = bytes(payload).find(sof)
        assert i > 0
        # SOF layout: marker(2) len(2) prec(1) h(2) w(2) ncomp(1)
        # then per comp: id(1) hv(1) tq(1) — zero comp 0's hv
        payload[i + 11] = 0x00
        with pytest.raises(ValueError, match="sampling"):
            decode_image_array(bytes(payload))
