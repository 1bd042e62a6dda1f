"""EXIF sniff tests (round 9; driver rows in r10).

Pins: field roundtrips through the in-repo writer for both carriers,
decode-transparency (the injected APP1 must not change pixels),
orientation bounds, rejections, and the fuzz contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from bergloom_spark.operators.exif import (
    exif_meta,
    make_exif_jpeg,
    make_exif_tiff,
)
from bergloom_spark.operators.jpegcodec import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)


def _jpeg():
    img = np.random.RandomState(1).randint(
        0, 256, (8, 8, 3)
    ).astype(np.uint8)
    return encode_jpeg_baseline(img, 90)


def test_jpeg_roundtrip_and_decode_transparency():
    base = _jpeg()
    j = make_exif_jpeg(
        base, orientation=6, datetime="2021:05:04 10:11:12",
        datetime_original="2021:05:04 09:00:00", make="camX",
    )
    assert exif_meta(j) == {
        "container": "jpeg", "orientation": 6,
        "datetime": "2021:05:04 10:11:12",
        "datetime_original": "2021:05:04 09:00:00",
        "make": "camX", "model": None,
    }
    assert (decode_jpeg_baseline(j) == decode_jpeg_baseline(base)).all()


def test_tiff_carrier_and_all_orientations():
    for o in range(1, 9):
        m = exif_meta(make_exif_tiff(orientation=o, make=f"m{o}"))
        assert (m["container"], m["orientation"], m["make"]) == (
            "tiff", o, f"m{o}",
        )


def test_rejections():
    with pytest.raises(ValueError, match="no EXIF"):
        exif_meta(_jpeg())  # plain JPEG: absent EXIF is a rejection
    with pytest.raises(ValueError, match="magic"):
        exif_meta(b"GIF89a" + bytes(30))
    # PNG is a carrier since r10 — one without the chunk rejects
    # with the absent-metadata message, not unknown-magic
    with pytest.raises(ValueError, match="no eXIf|truncated"):
        exif_meta(b"\x89PNG\r\n\x1a\n" + bytes(30))
    bad = bytearray(make_exif_tiff(orientation=5))
    # poke orientation to the out-of-spec value 9 (inline SHORT)
    i = bytes(bad).find(b"\x12\x01\x03\x00\x01\x00\x00\x00\x05\x00")
    assert i > 0
    bad[i + 8] = 9
    with pytest.raises(ValueError, match="orientation"):
        exif_meta(bytes(bad))


def test_fuzz_contract():
    rng = np.random.RandomState(5)
    payloads = [
        make_exif_jpeg(_jpeg(), orientation=3),
        make_exif_tiff(orientation=2),
    ]
    for payload in payloads:
        for cut in range(0, len(payload), 3):
            try:
                exif_meta(payload[:cut])
            except ValueError:
                pass
        for _ in range(400):
            b = bytearray(payload)
            for _ in range(1 + rng.randint(3)):
                b[rng.randint(len(b))] = rng.randint(256)
            try:
                exif_meta(bytes(b))
            except ValueError:
                pass


def test_fill_bytes_and_eoi_are_spec_valid():
    """ADVICE r10: 0xFF fill padding before a marker is legal
    (ITU-T T.81 B.1.1.2) and EOI is standalone — neither may be
    misread as a length-prefixed segment."""
    base = _jpeg()
    exif = make_exif_jpeg(base, orientation=7)
    # inject 3 fill bytes between SOI and the APP1 marker
    padded = exif[:2] + b"\xff\xff\xff" + exif[2:]
    assert exif_meta(padded)["orientation"] == 7
    # a JPEG that ends in EOI before any APP1 must reject cleanly
    # (no EXIF), not read garbage length bytes past the EOI
    eoi_only = b"\xff\xd8\xff\xd9"
    with pytest.raises(ValueError, match="no EXIF"):
        exif_meta(eoi_only)
    # fill bytes then EOI: same clean rejection
    with pytest.raises(ValueError, match="no EXIF"):
        exif_meta(b"\xff\xd8\xff\xff\xff\xd9\x00\x00")


def test_png_exif_carrier_roundtrip_and_decode_transparency():
    """Round 10: PNG 1.5 eXIf chunk carrier — chunk walk, IDAT never
    inflated, injected chunk invisible to the pixel decoder."""
    import numpy as np

    from bergloom_spark.operators.exif import make_exif_png
    from bergloom_spark.operators.pngcodec import decode_png, encode_png

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3) * 5
    base = encode_png(img)
    p = make_exif_png(
        base, orientation=5, datetime="2022:03:04 05:06:07",
        make="pngcam",
    )
    m = exif_meta(p)
    assert (m["container"], m["orientation"], m["make"]) == (
        "png", 5, "pngcam",
    )
    assert (decode_png(p) == decode_png(base)).all()
    with pytest.raises(ValueError, match="no eXIf"):
        exif_meta(base)
    # fuzz contract over the PNG carrier
    rng = np.random.RandomState(15)
    for cut in range(0, len(p), 3):
        try:
            exif_meta(p[:cut])
        except ValueError:
            pass
    for _ in range(600):
        b = bytearray(p)
        for _ in range(1 + rng.randint(3)):
            b[rng.randint(len(b))] = rng.randint(256)
        try:
            exif_meta(bytes(b))
        except ValueError:
            pass
