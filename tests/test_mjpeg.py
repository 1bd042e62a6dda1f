"""MJPEG-in-AVI (operators/avcodec.py, round 6): compressed video
decoded end-to-end by the in-repo JPEG codec. The q95 block recipe is
JPEG-lossless (see jpegcodec docs), so container + codec roundtrip is
exact equality."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bergloom_spark.operators.avcodec import (
    decode_mjpeg_frames,
    encode_mjpeg_avi,
)

_SIGN = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
_PAT = np.outer(_SIGN, _SIGN)


def _frame(fi, h, w):
    img = np.zeros((h, w), np.int64)
    b = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            c = 50 + (fi * 31 + b * 17) % 150
            m = ((fi + b) % 5) - 2
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                c + 7 * m * _PAT
            )
            b += 1
    return np.stack([img] * 3, axis=-1).astype(np.uint8)


def test_roundtrip_exact_q95_recipe():
    frames = [_frame(i, 16, 24) for i in range(7)]
    avi = encode_mjpeg_avi(frames, quality=95)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    out = decode_mjpeg_frames(avi)
    assert len(out) == 7
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_lossy_frames_still_decode_with_right_shape():
    rng = np.random.RandomState(0)
    frames = [
        rng.randint(0, 256, size=(24, 16, 3)).astype(np.uint8)
        for _ in range(3)
    ]
    out = decode_mjpeg_frames(encode_mjpeg_avi(frames, quality=75))
    assert len(out) == 3
    assert all(f.shape == (24, 16, 3) for f in out)


def test_junk_chunks_are_skipped():
    """An idx1 chunk and a JUNK chunk must not derail the walk."""
    frames = [_frame(0, 8, 8)]
    avi = bytearray(encode_mjpeg_avi(frames))
    junk = b"JUNK" + struct.pack("<I", 5) + b"abcde" + b"\x00"
    idx1 = b"idx1" + struct.pack("<I", 16) + bytes(16)
    patched = avi + junk + idx1
    struct.pack_into(
        "<I", patched, 4, len(patched) - 8
    )  # fix RIFF size
    out = decode_mjpeg_frames(bytes(patched))
    assert len(out) == 1 and np.array_equal(out[0], frames[0])


def test_truncated_avi_raises_valueerror():
    """Review r6: a payload cut mid-body (declared RIFF size intact)
    must raise ValueError, not struct.error."""
    avi = encode_mjpeg_avi([_frame(i, 16, 16) for i in range(4)])
    for cut in (len(avi) - 10, len(avi) // 2, 40):
        with pytest.raises(ValueError):
            decode_mjpeg_frames(avi[:cut])


def test_rejections_are_honest():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_mjpeg_frames(b"RIFF....WAVE" + bytes(8))
    with pytest.raises(ValueError, match="empty"):
        encode_mjpeg_avi([])
    with pytest.raises(ValueError, match="dimensions"):
        encode_mjpeg_avi([_frame(0, 8, 8), _frame(1, 16, 8)])
    # an AVI whose movi list is empty
    frames = [_frame(0, 8, 8)]
    avi = encode_mjpeg_avi(frames)
    movi = avi.index(b"movi")
    headless = avi[: movi + 4]
    trimmed = bytearray(headless)
    struct.pack_into("<I", trimmed, 4, len(trimmed) - 8)
    struct.pack_into("<I", trimmed, movi - 4, 4)
    with pytest.raises(ValueError, match="no video chunks"):
        decode_mjpeg_frames(bytes(trimmed))
