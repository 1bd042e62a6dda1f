"""Progressive JPEG codec (operators/jpegprogressive.py, round 6).

The load-bearing pin: for the SAME image and quality, the progressive
encode→decode output must be BYTE-IDENTICAL to the baseline
encode→decode output — both pipelines share the DCT/quantization
math, so any difference is a bug in the progressive entropy layer
(EOB runs, successive approximation, correction bits). On the lossless
q95 block recipe the roundtrip must reproduce the ORIGINAL pixels
exactly (same argument as the baseline oracle: DC and (4,4) are the
only nonzero coefficients and their q95 steps divide them).
"""

from __future__ import annotations

import numpy as np
import pytest

from bergloom_spark.operators.jpegcodec import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)
from bergloom_spark.operators.jpegprogressive import (
    decode_jpeg_progressive,
    encode_jpeg_progressive,
)


def _noise(h, w, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3)
    ).astype(np.uint8)


def _smooth(h, w):
    ys = np.arange(h).reshape(-1, 1)
    xs = np.arange(w).reshape(1, -1)
    r = (ys * 3 + xs * 2) % 256
    g = (ys * 5 + 40) % 256
    b = (xs * 7 + 100) % 256
    return np.stack(
        np.broadcast_arrays(r, g, b), axis=-1
    ).astype(np.uint8)


@pytest.mark.parametrize("quality", [50, 90, 95])
@pytest.mark.parametrize("maker,h,w", [
    (_noise, 16, 16),
    (_noise, 24, 40),
    (_smooth, 16, 16),
    (_smooth, 29, 37),  # non-multiple-of-8 edges
    (_noise, 8, 8),
    (_noise, 3, 5),  # single partial block
])
def test_progressive_equals_baseline(maker, h, w, quality):
    img = maker(h, w) if maker is _smooth else maker(h, w, seed=h * w)
    prog = encode_jpeg_progressive(img, quality=quality)
    base = encode_jpeg_baseline(img, quality=quality)
    out_p = decode_jpeg_progressive(prog)
    out_b = decode_jpeg_baseline(base)
    assert out_p.shape == out_b.shape == (h, w, 3)
    assert np.array_equal(out_p, out_b)


def test_progressive_stream_is_sof2():
    data = encode_jpeg_progressive(_noise(8, 8, seed=1))
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    # ten scans for a color image (standard script shape)
    assert data.count(b"\xff\xda") == 10


def test_lossless_recipe_roundtrips_exactly():
    """The baseline oracle's q95 recipe, through the progressive
    pipeline: c + 7m·(s⊗s) blocks must survive BIT-EXACTLY."""
    sign = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
    pat = np.outer(sign, sign)
    h, w = 24, 16
    img = np.zeros((h, w), dtype=np.int64)
    b = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            c = 50 + (b * 37) % 150
            m = (b % 5) - 2
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                c + 7 * m * pat
            )
            b += 1
    rgb = np.stack([img] * 3, axis=-1).astype(np.uint8)
    out = decode_jpeg_progressive(
        encode_jpeg_progressive(rgb, quality=95)
    )
    assert np.array_equal(out, rgb)


def test_grayscale_progressive():
    g = (np.arange(12 * 20).reshape(12, 20) * 7 % 256).astype(np.uint8)
    out = decode_jpeg_progressive(encode_jpeg_progressive(g, quality=90))
    base = decode_jpeg_baseline(encode_jpeg_baseline(g, quality=90))
    assert np.array_equal(out, base)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_magic_dispatch_handles_progressive():
    """decode_jpeg_baseline (and so decode_image_array) delegates SOF2
    streams to the progressive decoder instead of raising."""
    from bergloom_spark.operators.imagecodec import decode_image_array

    img = _smooth(16, 24)
    data = encode_jpeg_progressive(img, quality=90)
    via_baseline_entry = decode_jpeg_baseline(data)
    via_dispatch = decode_image_array(data)
    direct = decode_jpeg_progressive(data)
    assert np.array_equal(via_baseline_entry, direct)
    assert np.array_equal(via_dispatch, direct)


@pytest.mark.parametrize("interval", [1, 3, 7])
def test_restart_markers_roundtrip(interval):
    """DRI/RSTn in every scan: output must equal the marker-free
    encoding (predictor + EOB-run resets are pure re-sync), pinning
    the decoder's progressive restart path."""
    img = _noise(24, 40, seed=interval)
    plain = decode_jpeg_progressive(encode_jpeg_progressive(img, 90))
    with_rst = encode_jpeg_progressive(
        img, 90, restart_interval=interval
    )
    assert b"\xff\xdd" in with_rst
    assert any(
        bytes((0xFF, 0xD0 + i)) in with_rst for i in range(8)
    )
    assert np.array_equal(decode_jpeg_progressive(with_rst), plain)


def test_progressive_rejects_are_honest():
    img = _noise(8, 8, seed=2)
    base = encode_jpeg_baseline(img)
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg_progressive(base)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_progressive(b"\x00\x01")
    # truncated mid-scan: must raise, not return garbage silently
    prog = encode_jpeg_progressive(img)
    with pytest.raises(ValueError):
        decode_jpeg_progressive(prog[: len(prog) // 3])
    # SOS naming a component absent from SOF2 (review r6): ValueError,
    # not StopIteration (which generator-based stages rewrap weirdly)
    bad = bytearray(prog)
    sos = bad.index(b"\xff\xda")
    bad[sos + 5] = 99  # first scan component id
    with pytest.raises(ValueError, match="absent from SOF2"):
        decode_jpeg_progressive(bytes(bad))
