"""Spark-seam smoke tests for the round-10-built, round-11-registered
surfaces (mkv_meta, id3v2_tags, ogg_opus_meta).

The r9 verdict's standing warning: kernel-green code breaks at the
mapInPandas/Arrow seam (the r5 ``\\s`` Java-vs-RE2 divergence, the
tz-cast crash), so every surface gets a real executor-side drive on
real testdata doc_ids BEFORE its driver row lands — these pin the
schema, the batch shape, and the recipe arithmetic end-to-end, which
is exactly what the r11 oracles will replay.
"""

from __future__ import annotations

import pandas as pd


def _drive(spark, sf_dir, make_and_sniff, out_schema):
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .repartition(8)
    )

    def kernel(it):
        for pdf in it:
            yield make_and_sniff(pdf)

    return d.mapInPandas(kernel, out_schema).collect()


def test_mkv_meta_seam(spark, sf_dir):
    from bergloom_spark.operators.ebml import make_mkv_stream, mkv_meta

    def make_and_sniff(pdf):
        rows = []
        for doc_id in pdf["doc_id"]:
            i = int(doc_id)
            duration_ms = (i % 500) * 20
            p = make_mkv_stream(
                duration_ms,
                webm=i % 2 == 1,
                timestamp_scale=(100_000, 1_000_000)[i % 2],
                video=("V_VP9", 64 + (i % 4) * 16, 36 + (i % 4) * 9),
                audio=("A_OPUS", 48000, 1 + i % 8) if i % 3 else None,
                unknown_segment_size=i % 5 == 0,
            )
            m = mkv_meta(p)
            rows.append(
                (i, m["container"], m["duration_ms"], m["n_tracks"],
                 m["width"], m["height"], m["audio_channels"])
            )
        return pd.DataFrame(
            rows,
            columns=["doc_id", "container", "duration_ms", "n_tracks",
                     "width", "height", "audio_channels"],
        )

    rows = _drive(
        spark, sf_dir, make_and_sniff,
        "doc_id long, container string, duration_ms long, "
        "n_tracks long, width long, height long, audio_channels long",
    )
    assert rows
    for r in rows:
        i = r.doc_id
        assert r.container == ("webm" if i % 2 == 1 else "mkv")
        assert r.duration_ms == (i % 500) * 20  # exact float replay
        assert r.n_tracks == (2 if i % 3 else 1)
        assert r.width == 64 + (i % 4) * 16
        assert r.audio_channels == (1 + i % 8 if i % 3 else None)


def test_id3v2_tags_seam(spark, sf_dir):
    from bergloom_spark.operators.avcodec import (
        id3v2_tags,
        make_id3v2,
        make_mp3_stream,
    )

    def make_and_sniff(pdf):
        rows = []
        for doc_id in pdf["doc_id"]:
            i = int(doc_id)
            tag = make_id3v2(
                title=f"title {i}",
                artist=f"artist {i % 7}" if i % 3 else None,
                album=f"album {i % 5}",
                major=(2, 3, 4)[i % 3],
                encoding=(0, 1, 2, 3)[i % 4],
                padding=i % 17,
            )
            p = tag + make_mp3_stream(
                [128] * (1 + i % 3), sample_rate=44100
            )
            m = id3v2_tags(p)
            rows.append((i, m["version"], m["title"], m["artist"],
                         m["album"]))
        return pd.DataFrame(
            rows,
            columns=["doc_id", "version", "title", "artist", "album"],
        )

    rows = _drive(
        spark, sf_dir, make_and_sniff,
        "doc_id long, version string, title string, artist string, "
        "album string",
    )
    assert rows
    for r in rows:
        i = r.doc_id
        assert r.version == f"2.{(2, 3, 4)[i % 3]}"
        assert r.title == f"title {i}"
        assert r.artist == (f"artist {i % 7}" if i % 3 else None)
        assert r.album == f"album {i % 5}"


def test_ogg_opus_seam(spark, sf_dir):
    from bergloom_spark.operators.oggvorbis import (
        make_ogg_opus_stream,
        ogg_meta,
    )

    def make_and_sniff(pdf):
        rows = []
        for doc_id in pdf["doc_id"]:
            i = int(doc_id)
            playable = (i % 400) * 480
            p = make_ogg_opus_stream(
                1 + i % 8,
                playable_samples=playable,
                pre_skip=312 if i % 2 else 0,
                input_sample_rate=(0, 44100, 48000)[i % 3],
                n_audio_pages=1 + i % 3,
            )
            m = ogg_meta(p)
            rows.append(
                (i, m["codec"], m["sample_rate"], m["channels"],
                 m["duration_ms"])
            )
        return pd.DataFrame(
            rows,
            columns=["doc_id", "codec", "sample_rate", "channels",
                     "duration_ms"],
        )

    rows = _drive(
        spark, sf_dir, make_and_sniff,
        "doc_id long, codec string, sample_rate long, channels long, "
        "duration_ms long",
    )
    assert rows
    for r in rows:
        i = r.doc_id
        assert r.codec == "opus"
        assert r.sample_rate == (48000, 44100, 48000)[i % 3]
        assert r.channels == 1 + i % 8
        assert r.duration_ms == ((i % 400) * 480) * 1000 // 48000


def test_adts_meta_seam(spark, sf_dir):
    from bergloom_spark.operators.avcodec import (
        audio_meta,
        make_adts_stream,
    )

    def make_and_sniff(pdf):
        rows = []
        for doc_id in pdf["doc_id"]:
            i = int(doc_id)
            rate = (96000, 48000, 44100, 22050, 8000)[i % 5]
            p = make_adts_stream(
                1 + i % 50,
                sample_rate=rate,
                channels=1 + i % 7,
                crc=i % 2 == 0,
                blocks_per_frame=1 + i % 4,
            )
            m = audio_meta(p)
            rows.append((i, m["container"], m["sample_rate"],
                         m["channels"], m["duration_ms"]))
        return pd.DataFrame(
            rows,
            columns=["doc_id", "container", "sample_rate",
                     "channels", "duration_ms"],
        )

    rows = _drive(
        spark, sf_dir, make_and_sniff,
        "doc_id long, container string, sample_rate long, "
        "channels long, duration_ms long",
    )
    assert rows
    for r in rows:
        i = r.doc_id
        rate = (96000, 48000, 44100, 22050, 8000)[i % 5]
        samples = 1024 * (1 + i % 4)
        assert r.container == "aac"
        assert r.sample_rate == rate
        assert r.channels == 1 + i % 7
        # per-frame floor accumulation — the exact arithmetic the
        # r11 oracle must replay: n * (samples*1e6 // rate) // 1000
        assert r.duration_ms == (
            (1 + i % 50) * (samples * 1_000_000 // rate) // 1000
        )


def test_pdf_meta_seam(spark, sf_dir):
    from bergloom_spark.operators.pdfmeta import make_pdf, pdf_meta

    def make_and_sniff(pdf):
        rows = []
        for doc_id in pdf["doc_id"]:
            i = int(doc_id)
            p = make_pdf(
                i % 12,
                title=f"report {i}" if i % 3 else None,
                encrypted=i % 5 == 0,
                incremental_retitle=(
                    f"retitled {i}" if i % 4 == 1 else None
                ),
            )
            m = pdf_meta(p)
            rows.append((i, m["n_pages"], m["n_objects"],
                         m["encrypted"], m["title"], m["n_updates"]))
        return pd.DataFrame(
            rows,
            columns=["doc_id", "n_pages", "n_objects", "encrypted",
                     "title", "n_updates"],
        )

    rows = _drive(
        spark, sf_dir, make_and_sniff,
        "doc_id long, n_pages long, n_objects long, "
        "encrypted boolean, title string, n_updates long",
    )
    assert rows
    for r in rows:
        i = r.doc_id
        assert r.n_pages == i % 12
        # catalog + pages + 2/page + optional info/encrypt (+1
        # incremental retitle object counted via /Size)
        base = 2 + 2 * (i % 12)
        if i % 3:
            base += 1
        if i % 5 == 0:
            base += 1
        if i % 4 == 1:
            base += 1
        assert r.n_objects == base
        assert r.encrypted == (i % 5 == 0)
        if i % 5 == 0:
            assert r.title is None
        elif i % 4 == 1:
            assert r.title == f"retitled {i}"
        elif i % 3:
            assert r.title == f"report {i}"
        else:
            assert r.title is None
        assert r.n_updates == (1 if i % 4 == 1 else 0)
