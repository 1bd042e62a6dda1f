"""Multimodal plumbing tests: binary payload schema, Arrow batch flow,
deterministic fake decode, frame-sampling row explosion."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from bergloom_spark.io import load_table
from bergloom_spark.operators import multimodal as MM


def test_attach_payload_schema_and_checksum(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    out = MM.attach_binary_payload(d, "text")
    assert dict(out.dtypes)["payload"] == "binary"
    row = out.select("text", "payload", "media_meta.*").first()
    assert bytes(row.payload) == row.text.encode("utf-8")
    assert row.n_bytes == len(row.text.encode("utf-8"))
    assert row.checksum == hashlib.md5(row.text.encode()).hexdigest()
    assert row.media_type == "text/plain"


def test_extract_media_meta_matches_fake_decode(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    out = MM.extract_media_meta(MM.attach_binary_payload(d, "text"))
    for row in out.select("text", "decoded_width", "decoded_height").collect():
        w, h = MM.fake_decode_meta(row.text.encode("utf-8"))
        assert (row.decoded_width, row.decoded_height) == (w, h)


def test_decode_image_stub_raises_without_pil():
    if MM.HAS_PIL:
        pytest.skip("PIL present in this environment")
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG...")


def test_sample_frames_explosion(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(10)
    media = MM.attach_binary_payload(d, "text")
    frames = MM.sample_frames(media, n_frames=4)
    assert frames.count() == 40
    one = frames.filter(F.col("doc_id") == frames.first().doc_id)
    idx = sorted(r.frame_index for r in one.collect())
    assert idx == [0, 1, 2, 3]
    r = frames.filter(F.col("frame_index") == 1).first()
    assert bytes(r.frame_payload) == bytes(r.payload)[16:32]


def test_resize_images_plumbing(spark, sf_dir):
    from bergloom_spark.operators.multimodal import (
        attach_binary_payload,
        fake_resize,
        resize_images,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    media = attach_binary_payload(d, "text")
    out = resize_images(media, 64, 48)
    rows = out.collect()
    assert len(rows) == 50
    want_len = max(16, (64 * 48) // 64)
    for r in rows:
        assert len(r.payload) == want_len
        assert (r.resized_width, r.resized_height) == (64, 48)
    # Deterministic: same payload + dims → same bytes.
    one = d.limit(1).collect()[0].text.encode()
    assert fake_resize(one, 64, 48) == fake_resize(one, 64, 48)
