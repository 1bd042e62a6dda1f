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


# ---------------------------------------------------------------------------
# fake_embed (round 2): deterministic payload embedding
# ---------------------------------------------------------------------------
def test_fake_embed_deterministic_and_bounded(spark):
    import pyspark.sql.functions as F

    from bergloom_spark.operators.multimodal import attach_binary_payload, fake_embed

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "world"), (3, "hello")],
        "doc_id: long, text: string",
    )
    media = attach_binary_payload(docs, "text")
    out = media.select("doc_id", fake_embed("payload", dim=16).alias("e"))
    rows = {r["doc_id"]: list(r["e"]) for r in out.collect()}
    assert len(rows[1]) == 16
    assert all(-1.0 <= v < 1.0 for v in rows[1])
    assert rows[1] == rows[3]       # same bytes -> same embedding
    assert rows[1] != rows[2]       # different bytes -> different
    # run-to-run determinism
    again = {r["doc_id"]: list(r["e"]) for r in out.collect()}
    assert again == rows


def test_fake_embed_matches_sql_twin(spark, tmp_path):
    import duckdb

    from bergloom_spark.operators.multimodal import (
        attach_binary_payload,
        fake_embed,
        fake_embed_sql,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id: long, text: string"
    )
    p = str(tmp_path / "d.parquet")
    docs.write.parquet(p)
    media = attach_binary_payload(spark.read.parquet(p), "text")
    sp = {
        r["doc_id"]: [round(v, 9) for v in r["e"]]
        for r in media.select(
            "doc_id", fake_embed("payload", dim=8).alias("e")
        ).collect()
    }
    con = duckdb.connect()
    ora = {
        r[0]: [round(v, 9) for v in r[1]]
        for r in con.sql(
            f"SELECT doc_id, {fake_embed_sql('text', 8)} "
            f"FROM '{p}/*.parquet'"
        ).fetchall()
    }
    assert sp == ora


def test_resize_preserves_format_including_jpeg(spark):
    """Round 5: with preserve_format=True the real resize kernel
    re-encodes each payload in its own format — JPEG in, JPEG out."""
    import numpy as np

    from bergloom_spark.operators.imagecodec import (
        decode_image_array,
        encode_bmp,
        encode_ppm,
    )
    from bergloom_spark.operators.jpegcodec import encode_jpeg_baseline
    from bergloom_spark.operators.multimodal import resize_images

    img = np.full((16, 16, 3), 120, np.uint8)
    rows = [
        (1, encode_ppm(img)),
        (2, encode_bmp(img)),
        (3, encode_jpeg_baseline(img, 95)),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {
        r["id"]: bytes(r["payload"])
        for r in resize_images(
            df, 8, 8, use_real_kernel=True, preserve_format=True
        ).collect()
    }
    assert out[1][:2] == b"P6"
    assert out[2][:2] == b"BM"
    assert out[3][:2] == b"\xff\xd8"
    for i in (1, 2, 3):
        arr = decode_image_array(out[i])
        assert arr.shape == (8, 8, 3)
        # flat image survives even the lossy path exactly at q90
        assert int(arr[0, 0, 0]) == 120 or abs(int(arr[0, 0, 0]) - 120) <= 1
