"""Property tests over the image codecs (hypothesis, round 6).

The lossless codecs (PNG, GIF) must roundtrip ANY image exactly; the
two JPEG entropy layers (baseline vs progressive) must agree exactly
on ANY image since they package the same quantized coefficients.
Derandomized by the ci profile (tests/conftest.py); set
SPARK_GRAFT_HYPOTHESIS_EXPLORE=1 to hunt new examples.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bergloom_spark.operators.gifcodec import decode_gif, encode_gif
from bergloom_spark.operators.jpegcodec import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)
from bergloom_spark.operators.jpegprogressive import (
    decode_jpeg_progressive,
    encode_jpeg_progressive,
)
from bergloom_spark.operators.pngcodec import decode_png, encode_png

dims = st.tuples(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
)


@given(hw=dims, seed=st.integers(0, 10**6))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_any_image(hw, seed):
    h, w = hw
    img = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3)
    ).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@given(hw=dims, seed=st.integers(0, 10**6), ncolors=st.integers(1, 256))
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_any_palette_image(hw, seed, ncolors):
    h, w = hw
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, size=(ncolors, 3)).astype(np.uint8)
    img = palette[rng.randint(0, ncolors, size=(h, w))]
    interlace = bool(seed % 2)
    assert np.array_equal(
        decode_gif(encode_gif(img, interlace=interlace)), img
    )


@given(
    hw=dims,
    seed=st.integers(0, 10**6),
    compression=st.sampled_from(["none", "packbits", "lzw"]),
    rps=st.integers(1, 12),
)
@settings(max_examples=40, deadline=None)
def test_tiff_roundtrip_any_image(hw, seed, compression, rps):
    from bergloom_spark.operators.tiffcodec import (
        decode_tiff,
        encode_tiff,
    )

    h, w = hw
    img = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3)
    ).astype(np.uint8)
    data = encode_tiff(img, compression=compression, rows_per_strip=rps)
    assert np.array_equal(decode_tiff(data), img)


@given(
    hw=dims,
    seed=st.integers(0, 10**6),
    quality=st.sampled_from([35, 75, 90, 95]),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_progressive_agrees_with_baseline(hw, seed, quality):
    h, w = hw
    img = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3)
    ).astype(np.uint8)
    base = decode_jpeg_baseline(encode_jpeg_baseline(img, quality))
    prog = decode_jpeg_progressive(
        encode_jpeg_progressive(
            img, quality, restart_interval=seed % 4
        )
    )
    assert np.array_equal(base, prog)
