"""Pure-numpy PPM/BMP codecs + the REAL decode/resize path (no PIL)."""

from __future__ import annotations

import numpy as np
import pytest

from bergloom_spark.operators import imagecodec as IC
from bergloom_spark.operators import multimodal as MM


def _img(w: int, h: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (16, 16), (13, 7)])
def test_ppm_roundtrip(w, h):
    a = _img(w, h, seed=w * 100 + h)
    assert np.array_equal(IC.decode_ppm(IC.encode_ppm(a)), a)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (16, 16), (13, 7), (5, 4)])
def test_bmp_roundtrip(w, h):
    # odd widths exercise the 4-byte row padding
    a = _img(w, h, seed=w * 100 + h)
    assert np.array_equal(IC.decode_bmp(IC.encode_bmp(a)), a)


def test_ppm_header_comments():
    a = _img(4, 3)
    raw = IC.encode_ppm(a)
    body = raw.split(b"\n", 3)[3]
    with_comments = b"P6\n# made by a test\n4 3\n# maxval next\n255\n" + body
    assert np.array_equal(IC.decode_ppm(with_comments), a)


def test_dispatch_and_cross_format_equality():
    a = _img(9, 5, seed=7)
    via_ppm = IC.decode_image_array(IC.encode_ppm(a))
    via_bmp = IC.decode_image_array(IC.encode_bmp(a))
    assert np.array_equal(via_ppm, via_bmp)
    with pytest.raises(ValueError, match="magic"):
        IC.decode_image_array(b"\x89PNG\r\n")


def test_bmp_rejects_unsupported():
    a = _img(4, 4)
    raw = bytearray(IC.encode_bmp(a))
    raw[28] = 8  # bpp 24 -> 8
    with pytest.raises(ValueError, match="24-bit"):
        IC.decode_bmp(bytes(raw))


def test_truncated_payloads_raise():
    a = _img(6, 6)
    with pytest.raises(ValueError, match="truncated"):
        IC.decode_ppm(IC.encode_ppm(a)[:-5])
    with pytest.raises(ValueError, match="truncated"):
        IC.decode_bmp(IC.encode_bmp(a)[:-5])


def test_resize_nearest_matches_index_math():
    a = _img(10, 6, seed=3)
    out = IC.resize_nearest(a, 4, 3)
    assert out.shape == (3, 4, 3)
    for y in range(3):
        for x in range(4):
            assert np.array_equal(out[y, x], a[(y * 6) // 3, (x * 10) // 4])
    # upscale repeats pixels
    up = IC.resize_nearest(a, 20, 12)
    assert np.array_equal(up[::2, ::2], a)


# ---------------------------------------------------------------------------
# the Arrow seam, driven for real (no PIL anywhere in this path)
# ---------------------------------------------------------------------------
def _payload_df(spark, n=20):
    import pandas as pd

    rows = []
    for i in range(n):
        a = _img(4 + i % 5, 3 + i % 4, seed=i)
        payload = IC.encode_ppm(a) if i % 2 == 0 else IC.encode_bmp(a)
        rows.append((i, payload, a.reshape(-1, 3).sum(0, dtype="int64")))
    pdf = pd.DataFrame(
        {"img_id": [r[0] for r in rows], "payload": [r[1] for r in rows]}
    )
    return spark.createDataFrame(pdf), {r[0]: r[2] for r in rows}


def test_decode_images_real_sums(spark):
    df, expected = _payload_df(spark)
    got = {
        r.img_id: (r.sum_r, r.sum_g, r.sum_b)
        for r in MM.decode_images(df, "payload").collect()
    }
    assert got == {
        i: (int(s[0]), int(s[1]), int(s[2])) for i, s in expected.items()
    }


def test_resize_images_real_kernel_roundtrips(spark):
    df, _ = _payload_df(spark, n=8)
    out = MM.resize_images(df, 5, 4, use_real_kernel=True)
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        arr = IC.decode_ppm(bytes(r.payload))
        assert arr.shape == (4, 5, 3)


# ---------------------------------------------------------------------------
# baseline JPEG (round 5, jpegcodec.py)
# ---------------------------------------------------------------------------
from bergloom_spark.operators import jpegcodec as JC  # noqa: E402


@pytest.mark.parametrize("w,h", [(8, 8), (24, 16), (17, 23), (1, 1)])
def test_jpeg_roundtrip_smooth_content_is_near_exact(w, h):
    img = (
        (np.add.outer(np.arange(h) * 3, np.arange(w) * 2)[:, :, None] % 256)
        .astype(np.uint8)
        .repeat(3, axis=2)
    )
    dec = JC.decode_jpeg_baseline(JC.encode_jpeg_baseline(img, quality=95))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 2, err.max()


def test_jpeg_roundtrip_noise_bounded_and_lossy():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    dec = JC.decode_jpeg_baseline(JC.encode_jpeg_baseline(img, quality=95))
    err = np.abs(dec.astype(int) - img.astype(int))
    # lossy but sane: the mean error at q95 stays small even on noise
    assert err.mean() < 8, err.mean()


def test_jpeg_grayscale_single_component():
    g = (np.add.outer(np.arange(20) * 5, np.arange(30) * 4) % 256).astype(
        np.uint8
    )
    dec = JC.decode_jpeg_baseline(JC.encode_jpeg_baseline(g, quality=95))
    ref = np.stack([g] * 3, axis=-1)
    assert np.abs(dec.astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_exact_block_recipe():
    """The oracle's exactness argument (q_multimodal_decode_jpeg):
    c + 7m*(s x s) blocks survive quality-95 roundtrip bit-exactly."""
    s = np.array([1, -1, -1, 1, 1, -1, -1, 1])
    pat = np.outer(s, s)
    rng = np.random.default_rng(3)
    img = np.zeros((32, 24), np.int64)
    for by in range(4):
        for bx in range(3):
            c = int(rng.integers(50, 200))
            m = int(rng.integers(-2, 3))
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = c + 7 * m * pat
    rgb = np.stack([img] * 3, axis=-1).astype(np.uint8)
    dec = JC.decode_jpeg_baseline(JC.encode_jpeg_baseline(rgb, quality=95))
    assert np.array_equal(dec, rgb)


def test_jpeg_magic_dispatch():
    img = np.full((8, 8, 3), 99, np.uint8)
    enc = JC.encode_jpeg_baseline(img, 95)
    assert enc[:2] == b"\xff\xd8"
    assert np.array_equal(IC.decode_image_array(enc), img)


def test_jpeg_rejects_masquerade_and_garbage():
    """Round 6: SOF2 streams now DELEGATE to the progressive decoder
    (jpegprogressive.py) instead of raising — but a baseline stream
    merely relabeled as SOF2 is malformed under progressive rules
    (a full-band Ss=0..Se=63 scan is illegal there) and must still
    raise, not decode to garbage."""
    img = np.full((8, 8, 3), 99, np.uint8)
    enc = bytearray(JC.encode_jpeg_baseline(img, 95))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError, match="Se=0"):
        JC.decode_jpeg_baseline(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        JC.decode_jpeg_baseline(b"\x89PNG....")


def test_jpeg_rejects_non_interleaved_multi_scan():
    """Review r5: a legal baseline JPEG may split components across
    scans; decoding only the first would silently return color-shifted
    garbage — it must raise instead."""
    import struct

    img = np.full((8, 8, 3), 99, np.uint8)
    enc = JC.encode_jpeg_baseline(img, 95)
    sos = enc.find(b"\xff\xda")
    seglen = struct.unpack_from(">H", enc, sos + 2)[0]
    single = (
        b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
        + b"\x00\x3f\x00"
    )
    hacked = enc[:sos] + single + enc[sos + 2 + seglen:]
    with pytest.raises(ValueError, match="non-interleaved"):
        JC.decode_jpeg_baseline(hacked)


def test_jpeg_corrupt_dht_raises_valueerror():
    """Review r5: an overfull DHT must surface as ValueError (the
    malformed-payload contract), not IndexError from the LUT build."""
    from bergloom_spark.operators.jpegcodec import _prefix_table

    with pytest.raises(ValueError, match="corrupt Huffman table"):
        _prefix_table({(1, 0): 0, (1, 1): 1, (1, 2): 2})


def test_jpeg_decodes_with_stripped_eoi():
    """Review r5: a common real-world truncation (missing trailing
    EOI) must still decode — the entropy segment 1-pads at end of
    data like it does at a marker."""
    img = (np.add.outer(np.arange(16) * 3, np.arange(16) * 2)[:, :, None]
           % 256).astype(np.uint8).repeat(3, axis=2)
    enc = JC.encode_jpeg_baseline(img, 95)
    assert enc[-2:] == b"\xff\xd9"
    dec = JC.decode_jpeg_baseline(enc[:-2])
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_image_meta_header_sniff_every_format():
    """Round 7: header-only dims for every dispatchable format plus
    LOSSY and EXTENDED WebP (whose pixel decode stays gated — their
    dimensions don't)."""
    import struct

    from bergloom_spark.operators.gifcodec import encode_gif
    from bergloom_spark.operators.imagecodec import (
        encode_bmp,
        encode_ppm,
        image_meta,
    )
    from bergloom_spark.operators.jpegcodec import encode_jpeg_baseline
    from bergloom_spark.operators.jpegprogressive import (
        encode_jpeg_progressive,
    )
    from bergloom_spark.operators.pngcodec import encode_png
    from bergloom_spark.operators.tiffcodec import encode_tiff
    from bergloom_spark.operators.webpcodec import encode_webp_lossless

    img = (
        np.arange(11 * 13 * 3, dtype=np.int64).reshape(11, 13, 3) % 251
    ).astype(np.uint8)
    cases = [
        (encode_ppm(img), "ppm"),
        (encode_bmp(img), "bmp"),
        (encode_png(img), "png"),
        (encode_gif(img // 32 * 32), "gif"),
        (encode_tiff(img), "tiff"),
        (encode_jpeg_baseline(img, 90), "jpeg"),
        (encode_jpeg_progressive(img, 90), "jpeg"),
        (encode_webp_lossless(img), "webp-lossless"),
    ]
    for pay, fmt in cases:
        assert image_meta(pay) == {
            "format": fmt, "width": 13, "height": 11,
        }, fmt
    # hand-built VP8X canvas header (extended WebP)
    vp8x = (
        b"RIFF" + (22).to_bytes(4, "little") + b"WEBP"
        + b"VP8X" + (10).to_bytes(4, "little")
        + bytes(4)
        + (12).to_bytes(3, "little") + (10).to_bytes(3, "little")
    )
    assert image_meta(vp8x) == {
        "format": "webp-extended", "width": 13, "height": 11,
    }
    # hand-built lossy VP8 keyframe header
    tag = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 13, 11)
    vp8 = (
        b"RIFF" + (4 + 8 + len(tag)).to_bytes(4, "little") + b"WEBP"
        + b"VP8 " + len(tag).to_bytes(4, "little") + tag
    )
    assert image_meta(vp8) == {
        "format": "webp-lossy", "width": 13, "height": 11,
    }


def test_image_meta_contract_on_garbage():
    from bergloom_spark.operators.imagecodec import image_meta

    rng = np.random.RandomState(9)
    magics = [b"P6", b"BM", b"\xff\xd8", b"\x89PNG\r\n\x1a\n",
              b"GIF89a", b"II", b"MM", b"RIFF\x10\x00\x00\x00WEBP"]
    for t in range(400):
        blob = bytes(rng.randint(0, 256, rng.randint(0, 80)).astype(np.uint8))
        for pre in (b"", magics[t % len(magics)]):
            try:
                m = image_meta(pre + blob)
                assert set(m) == {"format", "width", "height"}
            except ValueError:
                pass
