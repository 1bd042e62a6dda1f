"""Pure-numpy PNG codec (operators/pngcodec.py, round 6).

PNG is lossless, so the contract is exact roundtrip — and the
encoder's filter-cycling mode guarantees every filter reconstruction
path (None/Sub/Up/Average/Paeth) is exercised by any image ≥ 5 rows.
Foreign-stream shapes (gray, palette, RGBA, gray+alpha, ancillary
chunks) are hand-built against the spec. No PIL anywhere.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from bergloom_spark.operators.imagecodec import decode_image_array
from bergloom_spark.operators.pngcodec import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
)


def _rng_img(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _raw_png(w, h, color_type, channels, pixels, extra=b""):
    """Hand-rolled spec-conformant stream: filter-0 rows only."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y].tobytes() for y in range(h)
    )
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_all_filters():
    img = _rng_img(11, 7)  # ≥5 rows → every filter type used
    data = encode_png(img)
    assert data[:8] == PNG_SIGNATURE
    out = decode_png(data)
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert np.array_equal(out, img)
    # magic dispatch reaches the same decoder
    assert np.array_equal(decode_image_array(data), img)


def test_roundtrip_single_pixel_and_wide():
    for h, w in [(1, 1), (1, 300), (300, 1), (5, 5)]:
        img = _rng_img(h, w, seed=h * 31 + w)
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_filterless_encode_matches():
    img = _rng_img(6, 9, seed=3)
    assert np.array_equal(
        decode_png(encode_png(img, filters="none")), img
    )


def test_grayscale_and_alpha_color_types():
    gray = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = decode_png(_raw_png(6, 4, 0, 1, gray))
    assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))
    # gray+alpha: alpha dropped
    ga = np.dstack([gray, np.full((4, 6), 9, np.uint8)])
    out = decode_png(_raw_png(6, 4, 4, 2, ga.reshape(4, -1)))
    assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))
    # RGBA: alpha dropped
    rgb = _rng_img(4, 6, seed=1)
    rgba = np.dstack([rgb, np.full((4, 6), 200, np.uint8)])
    out = decode_png(_raw_png(6, 4, 6, 4, rgba.reshape(4, -1)))
    assert np.array_equal(out, rgb)


def test_palette_decode():
    plte = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], np.uint8
    )
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    data = _raw_png(
        4, 2, 3, 1, idx, extra=_chunk(b"PLTE", plte.tobytes())
    )
    assert np.array_equal(decode_png(data), plte[idx])
    # palette stream without PLTE must raise
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(_raw_png(4, 2, 3, 1, idx))


def test_ancillary_chunks_skipped():
    img = _rng_img(3, 3, seed=5)
    data = encode_png(img)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    spliced = (
        data[:ihdr_end]
        + _chunk(b"tEXt", b"Comment\x00hello")
        + data[ihdr_end:]
    )
    assert np.array_equal(decode_png(spliced), img)


def _raw_png_depth(w, h, color_type, depth, packed_rows, extra=b""):
    """Spec-conformant stream at an arbitrary bit depth: caller packs
    each row's sample bytes; filter-0 rows."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in packed_rows)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("depth,scale", [(1, 255), (2, 85), (4, 17)])
def test_subbyte_grayscale_depths(depth, scale):
    w, h = 11, 4  # odd width → padded final byte per row
    rng = np.random.RandomState(depth)
    vals = rng.randint(0, 1 << depth, size=(h, w))
    rows = []
    for y in range(h):
        bits = []
        for v in vals[y]:
            bits.extend(
                (int(v) >> (depth - 1 - i)) & 1 for i in range(depth)
            )
        bits += [0] * (-len(bits) % 8)
        rows.append(np.packbits(np.array(bits, np.uint8)).tobytes())
    out = decode_png(_raw_png_depth(w, h, 0, depth, rows))
    expect = (vals * scale).astype(np.uint8)
    assert np.array_equal(out, np.repeat(expect[:, :, None], 3, axis=2))


def test_subbyte_palette():
    plte = np.array(
        [[10, 20, 30], [200, 100, 0], [0, 0, 255], [9, 9, 9]], np.uint8
    )
    idx = np.array([[0, 1, 2, 3, 1], [3, 2, 1, 0, 2]], np.uint8)
    rows = []
    for y in range(2):  # 2-bit palette, 5 px → 10 bits → 2 bytes
        bits = []
        for v in idx[y]:
            bits.extend(((int(v) >> 1) & 1, int(v) & 1))
        bits += [0] * (-len(bits) % 8)
        rows.append(np.packbits(np.array(bits, np.uint8)).tobytes())
    data = _raw_png_depth(
        5, 2, 3, 2, rows, extra=_chunk(b"PLTE", plte.tobytes())
    )
    assert np.array_equal(decode_png(data), plte[idx])


def test_16bit_rgb_keeps_high_byte():
    w, h = 4, 3
    rng = np.random.RandomState(7)
    px16 = rng.randint(0, 1 << 16, size=(h, w, 3))
    rows = [
        px16[y].astype(">u2").tobytes() for y in range(h)
    ]
    out = decode_png(_raw_png_depth(w, h, 2, 16, rows))
    assert np.array_equal(out, (px16 >> 8).astype(np.uint8))


def test_illegal_depth_combos_raise():
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_raw_png_depth(4, 1, 2, 4, [b"\x00" * 6]))  # RGB@4
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_raw_png_depth(4, 1, 3, 16, [b"\x00" * 8]))  # plte@16


def _adam7_stream(img, filters=False):
    """Hand-built interlaced stream: slice the image into the seven
    passes per the spec's geometry; optionally filter pass rows with
    cycling types (via encode_png's own filter math on each pass)."""
    from bergloom_spark.operators.pngcodec import _ADAM7, encode_png

    h, w, _ = img.shape
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        if filters:
            # reuse the encoder's filter emission: strip its headers
            # and take just the filtered scanline bytes
            sub_png = encode_png(np.ascontiguousarray(sub))
            # sig(8) + IHDR chunk(25) + IDAT len/type(8) .. crc(4) + IEND(12)
            raw += zlib.decompress(sub_png[41:-16])
        else:
            for row in sub:
                raw += b"\x00" + row.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("h,w", [(16, 16), (13, 11), (3, 3), (1, 9)])
def test_adam7_interlaced_decode(h, w):
    img = _rng_img(h, w, seed=h * 17 + w)
    assert np.array_equal(decode_png(_adam7_stream(img)), img)


def test_adam7_with_filtered_passes():
    img = _rng_img(21, 19, seed=9)
    data = _adam7_stream(img, filters=True)
    assert np.array_equal(decode_png(data), img)


def test_adam7_truncated_raises():
    img = _rng_img(16, 16, seed=2)
    data = _adam7_stream(img)
    # rebuild with IDAT shortened pre-compression
    raw = zlib.decompress(data[41:-16])
    short = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 16, 8, 2, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(raw[: len(raw) // 2]))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="Adam7"):
        decode_png(short)


def test_rejections_are_honest():
    img = _rng_img(4, 4)
    data = bytearray(encode_png(img))
    # corrupt one IDAT byte → CRC mismatch
    bad = bytearray(data)
    bad[8 + 12 + 13 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # unknown interlace method (Adam7 itself decodes since round 6)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 2)
    stream = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 13))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlace"):
        decode_png(stream)
    # depth 3 is not a PNG bit depth (16-bit decodes since round 6)
    ihdr3 = struct.pack(">IIBBBBB", 4, 4, 3, 2, 0, 0, 0)
    stream3 = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr3)
        + _chunk(b"IDAT", zlib.compress(b"\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(stream3)
    # not a PNG at all
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + bytes(16))
    # truncated scanlines
    raw_short = zlib.compress(b"\x00" + bytes(5))
    short = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", raw_short)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="scanline"):
        decode_png(short)


def test_resize_preserves_png_format(spark):
    from bergloom_spark.operators.multimodal import resize_images

    img = _rng_img(8, 8, seed=11)
    payload = encode_png(img)
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, payload binary")
    out = resize_images(
        df, 4, 4, use_real_kernel=True, preserve_format=True
    ).collect()[0]
    resized = bytes(out["payload"])
    assert resized[:8] == PNG_SIGNATURE
    assert decode_png(resized).shape == (4, 4, 3)
