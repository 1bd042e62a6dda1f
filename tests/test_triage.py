"""Unified corpus-triage tests (round 10): one dispatch across every
family in the repo, driven over a fully mixed payload battery plus
the Spark seam on real testdata doc_ids."""

from __future__ import annotations

import numpy as np
import pytest

from bergloom_spark.operators.triage import corpus_triage, triage_batch


def _battery() -> dict:
    """name → (payload, expected-row-subset)."""
    from bergloom_spark.operators.archive import (
        make_gzip,
        make_tar,
        make_zip,
        make_zstd_frame,
    )
    from bergloom_spark.operators.avcodec import (
        encode_wav,
        encode_y4m,
        make_adts_stream,
        make_flac_stream,
        make_mp3_stream,
    )
    from bergloom_spark.operators.ebml import make_mkv_stream
    from bergloom_spark.operators.gifcodec import encode_gif_frames
    from bergloom_spark.operators.imagecodec import encode_ppm
    from bergloom_spark.operators.isobmff import make_mp4_stream
    from bergloom_spark.operators.oggvorbis import make_ogg_opus_stream
    from bergloom_spark.operators.pdfmeta import make_pdf
    from bergloom_spark.operators.pngcodec import encode_png
    from bergloom_spark.operators.warc import make_warc

    rgb = np.zeros((8, 6, 3), np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx = np.zeros((8, 6), np.uint8)
    gif_frames = [(0, 0, idx, 0, None)] * 3
    luma = np.zeros((4, 8, 6), np.uint8)
    return {
        "png": (encode_png(rgb),
                ("image", "png", 1, 6, 8)),
        "ppm": (encode_ppm(rgb),
                ("image", "ppm", 1, 6, 8)),
        "gif_anim": (encode_gif_frames((6, 8), pal, gif_frames),
                     ("image", "gif", 3, 6, 8)),
        "wav": (encode_wav(np.zeros(16000, np.int16), 16000),
                ("audio", "wav", 1, None, None)),
        "flac": (make_flac_stream(44100, 2, 16, 88200),
                 ("audio", "flac", 1, None, None)),
        "opus": (make_ogg_opus_stream(2, playable_samples=48000),
                 ("audio", "ogg", 1, None, None)),
        "adts": (make_adts_stream(5, sample_rate=48000),
                 ("audio", "aac", 1, None, None)),
        "mp3": (make_mp3_stream([128, 128]),
                ("audio", "mp3", 1, None, None)),
        "y4m": (encode_y4m(luma),
                ("video", "y4m", 4, 6, 8)),
        "mp4": (make_mp4_stream(64, 48, 10, 20),
                ("video", "mp4", 20, 64, 48)),
        "m4a": (make_mp4_stream(0, 0, 10, 0, video_track=False,
                                audio_track=True),
                ("audio", "m4a", 1, None, None)),
        "mkv": (make_mkv_stream(4000, video=("V_VP9", 64, 48),
                                audio=None),
                ("video", "mkv", 1, 64, 48)),
        "zip": (make_zip([("a", b"xx"), ("b", b"yyy")]),
                ("archive", "zip", 2, None, None)),
        "tar": (make_tar([("a", b"x" * 600)]),
                ("archive", "tar", 1, None, None)),
        "gzip": (make_gzip(b"body " * 10),
                 ("archive", "gzip", 1, None, None)),
        "zstd": (make_zstd_frame(512),
                 ("archive", "zstd", 1, None, None)),
        "warc": (make_warc([{"url": "https://e.org/a", "text": "t"}]),
                 ("web", "warc", 2, None, None)),
        "pdf": (make_pdf(7),
                ("document", "pdf", 7, None, None)),
    }


def test_mixed_battery_routes_every_family():
    for name, (payload, want) in _battery().items():
        m = corpus_triage(payload)
        kind, container, n_items, width, height = want
        assert m["error"] is None, (name, m)
        assert m["kind"] == kind, name
        assert m["container"] == container, name
        assert m["n_items"] == n_items, (name, m)
        if width is not None:
            assert (m["width"], m["height"]) == (width, height), name


def test_unknown_magic_is_data_not_error():
    m = corpus_triage(b"\x00\x01completely novel format")
    assert m["kind"] == "unknown"
    assert m["error"] is None
    assert corpus_triage(b"")["kind"] == "unknown"


def test_recognized_family_malformed_reports_error_row():
    from bergloom_spark.operators.pdfmeta import make_pdf

    broken = make_pdf(2)[:-40]  # truncated xref/trailer
    m = corpus_triage(broken)
    assert m["kind"] == "unknown" or m["error"] is not None
    # a recognized-but-broken PDF must carry the error text
    assert m["error"] is not None


def test_triage_batch_spark_seam(spark, sf_dir):
    battery = list(_battery().items())
    ids = [
        int(r.doc_id)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").orderBy("doc_id").limit(60).collect()
    ]
    rows = [
        (i, battery[i % len(battery)][1][0]) for i in ids
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in triage_batch(df.repartition(8)).collect()}
    assert set(got) == set(ids)
    for i in ids:
        name, (_, want) = battery[i % len(battery)]
        r = got[i]
        assert r.error is None, (name, r)
        assert (r.kind, r.container, r.n_items) == want[:3], name


def test_tar_with_pk_prefixed_first_name_routes_to_tar():
    """ADVICE r10 (medium): bare ``d[:2] == b'PK'`` misrouted a TAR
    whose first entry name starts with 'PK' into the ZIP parser
    (error row 'no ZIP end-of-central-directory record'). The full
    4-byte APPNOTE signatures disambiguate; both archive_meta and
    corpus_triage must agree."""
    from bergloom_spark.operators.archive import (
        archive_meta,
        make_tar,
        make_zip,
    )
    from bergloom_spark.operators.triage import corpus_triage

    t = make_tar([("PKG/readme.txt", b"hello world"),
                  ("PK-notes.md", b"x" * 600)])
    assert archive_meta(t) == {
        "container": "tar", "n_entries": 2,
        "total_uncompressed": 611,
    }
    tr = corpus_triage(t)
    assert (tr["kind"], tr["container"], tr["n_items"],
            tr["error"]) == ("archive", "tar", 2, None)
    # ZIPs — including the empty archive, which starts at the EOCD
    # record (PK\x05\x06) — still route to the ZIP parser.
    for z in (make_zip([("a.txt", b"xy")]), make_zip([])):
        assert archive_meta(z)["container"] == "zip"
        assert corpus_triage(z)["container"] == "zip"
