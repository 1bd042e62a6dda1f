"""WebP-lossless (VP8L) codec tests (round 7, verdict r6 #5).

Three layers of pinning:
1. in-repo roundtrips over every encoder option / image shape;
2. CROSS-VALIDATION against the system's real libwebp via ctypes when
   present (gated skip otherwise): our decoder must reproduce
   libwebp-encoded streams byte-exactly — those streams exercise the
   predictor/cross-color transforms, color cache, meta-Huffman and 2D
   distance codes our own encoder deliberately does not emit — and
   libwebp must accept and exactly decode our encoder's output;
3. honest rejections (lossy VP8, bad signatures, truncations).
"""

from __future__ import annotations

import numpy as np
import pytest

from bergloom_spark.operators.webpcodec import (
    _prefix_decode,
    _prefix_encode,
    decode_webp,
    encode_webp_lossless,
)


def _libwebp():
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def _images():
    rng = np.random.default_rng(11)
    out = []
    for h, w in [(1, 1), (2, 3), (5, 8), (16, 16), (33, 17)]:
        out.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        out.append(
            (
                (
                    np.arange(h)[:, None, None] * 3
                    + np.arange(w)[None, :, None] * 5
                    + np.arange(3)[None, None, :] * 7
                )
                % 256
            ).astype(np.uint8)
        )
        runs = np.repeat(
            rng.integers(0, 256, (h, (w + 3) // 4, 3), dtype=np.uint8),
            4,
            axis=1,
        )[:, :w]
        out.append(runs)
    return out


@pytest.mark.parametrize("subtract_green", [True, False])
@pytest.mark.parametrize("use_backrefs", [True, False])
def test_roundtrip_every_option(subtract_green, use_backrefs):
    for img in _images():
        pay = encode_webp_lossless(
            img,
            subtract_green=subtract_green,
            use_backrefs=use_backrefs,
        )
        out = decode_webp(pay)
        assert out.shape == img.shape and (out == img).all()


def test_prefix_code_is_its_own_inverse():
    class _FakeBR:
        def __init__(self, v):
            self.v = v

        def read(self, n):
            out = self.v & ((1 << n) - 1)
            self.v >>= n
            return out

    for v in list(range(1, 200)) + [777, 4096, 100_000]:
        sym, extra, n = _prefix_encode(v)
        assert _prefix_decode(sym, _FakeBR(extra)) == v


def test_decoder_matches_real_libwebp_streams():
    """Golden cross-validation: libwebp's own lossless encoder output
    (predictor/cross-color transforms, color cache, meta-Huffman, 2D
    distances — everything our encoder skips) must decode exactly."""
    import ctypes

    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp not present")
    rng = np.random.default_rng(5)
    cases = []
    for h, w in [(4, 5), (16, 16), (31, 7), (64, 48), (128, 90)]:
        cases.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        cases.append(
            (
                (
                    np.arange(h)[:, None, None] * 2
                    + np.arange(w)[None, :, None] * 3
                    + np.arange(3) * 50
                )
                % 256
            ).astype(np.uint8)
        )
        cases.append(
            (rng.integers(0, 4, (h, w, 1), dtype=np.uint8) * 60).repeat(
                3, axis=2
            )
        )
    for img in cases:
        h, w = img.shape[:2]
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeLosslessRGB(
            img.tobytes(), w, h, w * 3, ctypes.byref(out)
        )
        assert n > 0
        payload = ctypes.string_at(out, n)
        dec = decode_webp(payload)
        assert dec.shape == img.shape and (dec == img).all()


def test_encoder_accepted_by_real_libwebp():
    import ctypes

    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp not present")
    rng = np.random.default_rng(9)
    for h, w in [(1, 1), (3, 5), (16, 16), (40, 64)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for sg in (True, False):
            for br in (True, False):
                pay = encode_webp_lossless(
                    img, subtract_green=sg, use_backrefs=br
                )
                W = ctypes.c_int()
                H = ctypes.c_int()
                p = lib.WebPDecodeRGB(
                    pay, len(pay), ctypes.byref(W), ctypes.byref(H)
                )
                assert p, "libwebp rejected our stream"
                dec = np.ctypeslib.as_array(
                    p, shape=(H.value, W.value, 3)
                ).copy()
                assert dec.shape == img.shape and (dec == img).all()


def test_rejections_are_honest():
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"NOTRIFF" + bytes(20))
    # lossy VP8 chunk: honest gate, not a crash
    lossy = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8 " \
        + (8).to_bytes(4, "little") + bytes(8)
    with pytest.raises(ValueError, match="lossless"):
        decode_webp(lossy)
    img = np.zeros((4, 4, 3), np.uint8)
    pay = encode_webp_lossless(img)
    for cut in range(len(pay)):
        try:
            decode_webp(pay[:cut])
        except ValueError:
            pass
    with pytest.raises(ValueError):
        encode_webp_lossless(np.zeros((4, 4), np.uint8))


def test_dispatch_by_magic():
    from bergloom_spark.operators.imagecodec import decode_image_array

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    pay = encode_webp_lossless(img)
    assert (decode_image_array(pay) == img).all()


def test_all_120_2d_distance_codes_match_libwebp():
    """Review r7: the 2D neighbor table's tail (codes 97-120) was
    generated from the wrong candidate box and silently corrupted
    pixels. Pin every code with hand-crafted streams: a backref with
    distance code k must decode exactly as libwebp decodes it."""
    import ctypes

    import bergloom_spark.operators.webpcodec as W

    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp not present")

    def craft(dist_code, width=16, height=12):
        n = width * height
        rng = np.random.default_rng(dist_code)
        px = rng.integers(0, 256, (n, 3), dtype=np.int64)
        bw = W._BitWriter()
        bw.write(width - 1, 14)
        bw.write(height - 1, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        green = W._write_flat_code(bw, [8] * 232 + [9] * 48)
        red = W._write_flat_code(bw, [8] * 256)
        blue = W._write_flat_code(bw, [8] * 256)
        W._write_simple_single(bw, 255)
        dsym, dextra, dn = W._prefix_encode(dist_code)
        W._write_simple_single(bw, dsym)
        cut, L = 9 * width + 2, 16
        for i in range(cut):
            r, g, b = px[i]
            for codes, v in ((green, g), (red, r), (blue, b)):
                c, ln = codes[v]
                bw.write_code(c, ln)
        ls, lx, lxn = W._prefix_encode(L)
        c, ln = green[256 + ls]
        bw.write_code(c, ln)
        if lxn:
            bw.write(lx, lxn)
        bw.write(dextra, dn)
        for i in range(cut + L, n):
            r, g, b = px[i]
            for codes, v in ((green, g), (red, r), (blue, b)):
                c, ln = codes[v]
                bw.write_code(c, ln)
        body = b"\x2f" + bw.finish()
        chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
        if len(body) & 1:
            chunk += b"\x00"
        return (
            b"RIFF" + (4 + len(chunk)).to_bytes(4, "little")
            + b"WEBP" + chunk
        )

    for code in range(1, 121):
        pay = craft(code)
        Wd = ctypes.c_int()
        Hd = ctypes.c_int()
        p = lib.WebPDecodeRGB(pay, len(pay), ctypes.byref(Wd), ctypes.byref(Hd))
        assert p, f"libwebp rejected crafted stream for code {code}"
        ref = np.ctypeslib.as_array(p, shape=(Hd.value, Wd.value, 3)).copy()
        mine = decode_webp(pay)
        assert (mine == ref).all(), f"2D distance code {code} mismatch"
