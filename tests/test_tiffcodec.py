"""TIFF codec (operators/tiffcodec.py, round 6).

All three compressions are lossless, so the contract is exact
roundtrip; foreign-stream shapes (big-endian, MinIsWhite, palette
ColorMap, horizontal predictor, multi-page) are hand-built against
the TIFF 6.0 spec. The LZW tests pin the EARLY-CHANGE width
convention by marching the table past the 511/1023 boundaries.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bergloom_spark.operators.imagecodec import decode_image_array
from bergloom_spark.operators.tiffcodec import (
    decode_tiff,
    encode_tiff,
    tiff_page_count,
)


def _img(h, w, seed=3):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3)
    ).astype(np.uint8)


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("h,w,rps", [
    (9, 13, None), (16, 16, 4), (7, 5, 3), (1, 1, None), (40, 60, 11),
])
def test_roundtrip(compression, h, w, rps):
    img = _img(h, w, seed=h * 31 + w)
    data = encode_tiff(img, compression=compression, rows_per_strip=rps)
    assert data[:2] == b"II"
    out = decode_tiff(data)
    assert np.array_equal(out, img)
    assert np.array_equal(decode_image_array(data), img)


def test_lzw_deep_table_past_width_boundaries():
    """Enough novel byte sequences to push the LZW table past 511 and
    1023 entries — an early-change slip corrupts everything after the
    first boundary."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(64, 64, 3)).astype(np.uint8)
    data = encode_tiff(img, compression="lzw")
    assert np.array_equal(decode_tiff(data), img)
    # long runs + structure (PackBits-friendly too)
    grad = (np.arange(4096, dtype=np.int64) % 251).astype(np.uint8)
    img2 = np.stack([grad] * 3, axis=-1).reshape(64, 64, 3)
    assert np.array_equal(
        decode_tiff(encode_tiff(img2, compression="lzw")), img2
    )


def test_grayscale_and_min_is_white():
    g = (np.arange(120, dtype=np.int64).reshape(10, 12) * 2 % 256).astype(
        np.uint8
    )
    data = encode_tiff(g, compression="packbits")
    out = decode_tiff(data)
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))
    # flip photometric to MinIsWhite (tag 262 value 1 -> 0)
    d = bytearray(data)
    ifd_off = struct.unpack_from("<I", d, 4)[0]
    n = struct.unpack_from("<H", d, ifd_off)[0]
    for i in range(n):
        p = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", d, p)[0] == 262:
            struct.pack_into("<H", d, p + 8, 0)
    out = decode_tiff(bytes(d))
    assert np.array_equal(out, np.repeat((255 - g)[:, :, None], 3, axis=2))


def test_big_endian_and_palette():
    """Hand-built MM (big-endian) palette TIFF: 4x3 indices through a
    16-bit ColorMap."""
    w, h = 4, 3
    idx = np.array(
        [[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], np.uint8
    )
    cmap16 = []
    for ch, mult in ((0, 257), (1, 513), (2, 771)):  # high byte varies
        cmap16 += [((i * mult) % 65536) for i in range(4)]
    pixel_off = 8
    data = bytearray(b"MM" + struct.pack(">HI", 42, 0))
    data += idx.tobytes()  # strip at offset 8
    ifd_off = len(data)
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, 3), (273, 4, 1, pixel_off),
        (277, 3, 1, 1), (278, 4, 1, h), (279, 4, 1, w * h),
    ]
    extra_off = ifd_off + 2 + 12 * (len(entries) + 1) + 4
    entries.append((320, 3, 12, extra_off))
    ifd = struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack(">HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            ifd += struct.pack(">HH", val, 0)
        else:
            ifd += struct.pack(">I", val)
    ifd += struct.pack(">I", 0)
    data += ifd + struct.pack(">12H", *cmap16)
    struct.pack_into(">I", data, 4, ifd_off)
    out = decode_tiff(bytes(data))
    expect = np.zeros((4, 3), np.uint8)
    for i in range(4):
        expect[i] = [
            ((i * 257) % 65536) >> 8,
            ((i * 513) % 65536) >> 8,
            ((i * 771) % 65536) >> 8,
        ]
    assert np.array_equal(out, expect[idx])


def test_multipage_first_and_count():
    a, b = _img(5, 5, seed=1), _img(5, 5, seed=2)
    da = bytearray(encode_tiff(a))
    db = encode_tiff(b)
    # append db's content after da and chain da's IFD next-ptr to it
    base = len(da)
    shifted = bytearray(db)
    ifd2 = struct.unpack_from("<I", db, 4)[0]
    # shift db's internal offsets by base: IFD offset, strip offsets
    n = struct.unpack_from("<H", db, ifd2)[0]
    for i in range(n):
        p = ifd2 + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", db, p)
        if tag == 273:  # single strip, inline offset
            off = struct.unpack_from("<I", db, p + 8)[0]
            struct.pack_into("<I", shifted, p + 8, off + base)
    # find da's IFD next pointer and point it at shifted IFD
    ifd1 = struct.unpack_from("<I", da, 4)[0]
    n1 = struct.unpack_from("<H", da, ifd1)[0]
    struct.pack_into("<I", da, ifd1 + 2 + 12 * n1, base + ifd2)
    combined = bytes(da) + bytes(shifted)
    assert tiff_page_count(combined) == 2
    assert np.array_equal(decode_tiff(combined), a)
    assert tiff_page_count(encode_tiff(a)) == 1


def test_predictor_horizontal_differencing():
    """Hand-built predictor-2 stream: encode differences, decoder
    must cumsum them back."""
    img = _img(6, 8, seed=4)
    diff = img.astype(np.int64).copy()
    diff[:, 1:] = (diff[:, 1:] - diff[:, :-1]) % 256
    raw = diff.astype(np.uint8).reshape(6, -1).tobytes()
    data = bytearray(encode_tiff(img))  # same geometry, then patch
    # replace pixel data (offset 8, uncompressed single strip)
    data[8 : 8 + len(raw)] = raw
    # append predictor tag by rebuilding is complex; instead build
    # fresh via the known layout: easier to hand-add tag 317=2 by
    # rewriting the IFD — rebuild from scratch:
    w, h = 8, 6
    out = bytearray(b"II" + struct.pack("<HI", 42, 0))
    out += raw
    ifd_off = len(out)
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (259, 3, 1, 1),
        (262, 3, 1, 2), (273, 4, 1, 8), (277, 3, 1, 3),
        (278, 4, 1, h), (279, 4, 1, len(raw)), (317, 3, 1, 2),
    ]
    extra_off = ifd_off + 2 + 12 * (len(entries) + 1) + 4
    entries.append((258, 3, 3, extra_off))
    entries.sort()
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            ifd += struct.pack("<HH", val, 0)
        else:
            ifd += struct.pack("<I", val)
    ifd += struct.pack("<I", 0)
    out += ifd + struct.pack("<3H", 8, 8, 8)
    struct.pack_into("<I", out, 4, ifd_off)
    assert np.array_equal(decode_tiff(bytes(out)), img)


def test_resize_preserves_tiff_format(spark):
    """Review r6: TIFF was missing from the preserve_format dispatch
    and silently came back as PPM."""
    from bergloom_spark.operators.multimodal import resize_images

    img = _img(8, 8, seed=12)
    df = spark.createDataFrame(
        [(1, bytearray(encode_tiff(img)))], "id long, payload binary"
    )
    out = resize_images(
        df, 4, 4, use_real_kernel=True, preserve_format=True
    ).collect()[0]
    resized = bytes(out["payload"])
    assert resized[:2] == b"II"
    assert decode_tiff(resized).shape == (4, 4, 3)


def test_rejections_are_honest():
    with pytest.raises(ValueError, match="II/MM"):
        decode_tiff(b"PK\x03\x04" + bytes(16))
    img = _img(4, 4)
    data = bytearray(encode_tiff(img))
    # flip compression tag to CCITT G4 (4)
    ifd_off = struct.unpack_from("<I", data, 4)[0]
    n = struct.unpack_from("<H", data, ifd_off)[0]
    for i in range(n):
        p = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", data, p)[0] == 259:
            struct.pack_into("<H", data, p + 8, 4)
    with pytest.raises(ValueError, match="compression 4"):
        decode_tiff(bytes(data))
    with pytest.raises(ValueError):
        decode_tiff(encode_tiff(img)[:30])  # truncated


def test_multipage_roundtrip_every_compression():
    """Round 7: decode_tiff_pages walks the next-IFD chain; pages may
    differ in size and gray/RGB shape; decode_tiff still returns
    page 1 byte-identically."""
    from bergloom_spark.operators.tiffcodec import (
        decode_tiff,
        decode_tiff_pages,
        encode_tiff_pages,
        tiff_page_count,
    )

    rng = np.random.default_rng(2)
    pages = [
        rng.integers(0, 256, (5, 8, 3), dtype=np.uint8),
        rng.integers(0, 256, (3, 4), dtype=np.uint8),  # gray page
        rng.integers(0, 256, (9, 2, 3), dtype=np.uint8),
    ]
    want = [
        pages[0],
        np.repeat(pages[1][:, :, None], 3, axis=2),
        pages[2],
    ]
    for comp in ("none", "packbits", "lzw"):
        for rps in (None, 2):
            pay = encode_tiff_pages(
                pages, compression=comp, rows_per_strip=rps
            )
            assert tiff_page_count(pay) == 3
            dec = decode_tiff_pages(pay)
            assert len(dec) == 3
            for got, exp in zip(dec, want):
                assert (got == exp).all()
            assert (decode_tiff(pay) == want[0]).all()


def test_multipage_cycle_guard_and_contract():
    """A next-IFD pointer looping back must terminate (same guard as
    tiff_page_count), and malformed multi-page bytes stay inside the
    decode-or-ValueError contract."""
    import struct as _struct

    from bergloom_spark.operators.tiffcodec import (
        decode_tiff_pages,
        encode_tiff_pages,
    )

    rng = np.random.default_rng(3)
    pages = [
        rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    pay = bytearray(encode_tiff_pages(pages))
    # point the LAST page's next-IFD pointer back at the first IFD
    (first_ifd,) = _struct.unpack_from("<I", pay, 4)
    pay[-4:] = _struct.pack("<I", first_ifd)
    dec = decode_tiff_pages(bytes(pay))
    # review r7: the guard seeds IFD0's offset, so the loop-back
    # terminates WITHOUT decoding page 0 twice
    assert len(dec) == 2
    # truncations stay ValueError
    good = bytes(encode_tiff_pages(pages, compression="lzw"))
    for cut in range(0, len(good), 7):
        try:
            decode_tiff_pages(good[:cut])
        except ValueError:
            pass


def test_multipage_decode_budget():
    """Review r7 4th pass: chained IFDs may legally alias ONE strip,
    so a KB-sized payload could otherwise decode to unbounded pages;
    the absolute output budget refuses it."""
    import struct as _struct

    from bergloom_spark.operators.tiffcodec import (
        _MAX_DECODED_BYTES,
        decode_tiff_pages,
        encode_tiff,
        tiff_page_count,
    )

    img = np.zeros((1024, 1024, 3), dtype=np.uint8)  # LZW-tiny strip
    one = bytearray(encode_tiff(img, compression="lzw"))
    # duplicate the IFD (it sits at the end) enough times that the
    # total decoded bytes exceed the budget, chaining next-pointers
    (ifd0,) = _struct.unpack_from("<I", one, 4)
    ifd_blob = bytes(one[ifd0:-4])  # entries without the next ptr
    n_extra = _MAX_DECODED_BYTES // img.nbytes + 1
    pay = bytearray(one)
    for k in range(n_extra):
        next_off = len(pay)
        pay[-4:] = _struct.pack("<I", next_off)
        pay += ifd_blob + _struct.pack("<I", 0)
    assert tiff_page_count(bytes(pay)) == n_extra + 1
    assert len(pay) < 200_000 + img.nbytes // 2  # amplification shape
    with pytest.raises(ValueError, match="budget"):
        decode_tiff_pages(bytes(pay))
