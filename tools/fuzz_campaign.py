"""High-volume mutation-fuzz campaign over the corpus-contract
parsers (round 10, verdict r9 #4 — the r9 campaign's 180k payloads
found 2 latent JPEG bugs the 860-test suite missed, so this is now a
standing per-round tool).

Contract under test: ``bytes → result or ValueError`` — never any
other exception, never a hang. Every target gets a seed corpus built
by its own in-repo writer, then per seed: all truncations (stride),
point mutations, multi-byte mutations, random splices, and random
inserts. Findings are dumped as exact bytes under
``/tmp/fuzz_findings/`` so each becomes a regression test
(tests/test_codec_robustness.py style).

Usage: python tools/fuzz_campaign.py [n_mutations_per_seed] [target ...]
Defaults: 4000 mutations/seed, all targets, all CPUs.
"""

from __future__ import annotations

import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

FINDINGS_DIR = "/tmp/fuzz_findings"
# Adjudicated r10: a 10 s timer flagged a VP8X payload whose mutated
# canvas (14 x 4.19M px) times 3 frames sat just UNDER the absolute
# 512 MiB decode budget — the 11 s was materializing the budgeted
# output (memory traffic), terminating, not a hang. The timer must
# sit above the budget's worst-case wall time; true non-termination
# (the r9 Y4M class) hits any value.
HANG_SECONDS = 30.0


# ---------------------------------------------------------------------------
# Seed corpora — one builder per target, each returning (fn, [seeds]).
# Builders run inside the worker so seeds never cross process pipes.
# ---------------------------------------------------------------------------
def _seeds_ogg():
    from bergloom_spark.operators.oggvorbis import (
        make_ogg_opus_stream,
        make_ogg_vorbis_stream,
        ogg_meta,
    )

    return ogg_meta, [
        make_ogg_vorbis_stream(44100, 2, 44100, n_audio_pages=2),
        make_ogg_vorbis_stream(8000, 1, 0, n_audio_pages=1),
        make_ogg_vorbis_stream(48000, 8, 123457, n_audio_pages=3),
        make_ogg_opus_stream(2, 96000, pre_skip=312,
                             input_sample_rate=44100, n_audio_pages=2),
        make_ogg_opus_stream(1, 4800, input_sample_rate=0),
    ]


def _seeds_flac():
    from bergloom_spark.operators.avcodec import flac_meta, make_flac_stream

    return flac_meta, [
        make_flac_stream(44100, 2, 16, 44100),
        make_flac_stream(8000, 1, 8, 0, extra_blocks=3, audio_bytes=64),
        make_flac_stream(96000, 8, 24, (1 << 36) - 1),
    ]


def _seeds_exif():
    from bergloom_spark.operators.exif import (
        exif_meta,
        make_exif_jpeg,
        make_exif_png,
        make_exif_tiff,
    )
    from bergloom_spark.operators.jpegcodec import encode_jpeg_baseline
    from bergloom_spark.operators.pngcodec import encode_png

    img = (np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) * 3)
    j = encode_jpeg_baseline(img, 90)
    return exif_meta, [
        make_exif_jpeg(j, orientation=6, make="fuzzcam"),
        make_exif_tiff(orientation=3, make="ab"),
        j[:2] + b"\xff\xff" + make_exif_jpeg(j, orientation=8)[2:],
        make_exif_png(encode_png(img), orientation=5, make="pngcam"),
    ]


def _seeds_subtitles():
    from bergloom_spark.operators.subtitles import (
        make_srt,
        make_vtt,
        parse_subtitles,
    )

    cues = [(0, 1500, "one"), (1200, 3700, "two\nlines"),
            (3_661_001, 3_662_000, "hour mark")]
    return parse_subtitles, [
        make_srt(cues),
        make_vtt(cues, note="n"),
        b"\xef\xbb\xbf" + make_srt(cues),
    ]


def _seeds_webp_frames():
    from bergloom_spark.operators.webpcodec import (
        decode_webp_frames,
        encode_webp_frames,
    )

    rng = np.random.RandomState(3)
    canvas = rng.randint(0, 256, (12, 14, 4), np.uint8)
    f1 = rng.randint(0, 256, (4, 6, 4), np.uint8)
    f2 = rng.randint(0, 256, (5, 4, 4), np.uint8)
    return decode_webp_frames, [
        encode_webp_frames(
            (14, 12),
            [
                (0, 0, canvas, False, False),
                (2, 4, f1, True, False),
                (6, 0, f2, False, True),
            ],
        ),
    ]


def _seeds_mp4():
    from bergloom_spark.operators.isobmff import make_mp4_stream, mp4_meta

    return mp4_meta, [
        make_mp4_stream(640, 360, 25, 100, movie_timescale=600),
        make_mp4_stream(
            1920, 1080, 30, 7, movie_timescale=90000,
            audio_track=True, version1=True, mdat_bytes=32,
        ),
    ]


def _seeds_mkv():
    from bergloom_spark.operators.ebml import make_mkv_stream, mkv_meta

    return mkv_meta, [
        make_mkv_stream(90_061, cluster_bytes=16),
        make_mkv_stream(
            5_120, webm=True, timestamp_scale=100_000,
            unknown_segment_size=True,
        ),
        make_mkv_stream(None, video=None),
    ]


def _seeds_id3():
    from bergloom_spark.operators.avcodec import id3v2_tags, make_id3v2

    return id3v2_tags, [
        make_id3v2(title="t", artist="a", album="b", major=4,
                   encoding=3, padding=8),
        make_id3v2(title="tï", artist="aa", major=3, encoding=1),
        make_id3v2(album="zz", major=2, encoding=0),
    ]


def _seeds_mp3():
    from bergloom_spark.operators.avcodec import make_mp3_stream, mp3_meta

    return mp3_meta, [
        make_mp3_stream([128, 64, 128], sample_rate=44100,
                        id3_bytes=24, tail_tag="ape+id3v1"),
        make_mp3_stream([32] * 5, sample_rate=8000, tail_tag="id3v1"),
    ]


def _seeds_video_meta():
    from bergloom_spark.operators.avcodec import (
        encode_mjpeg_avi,
        encode_y4m,
        video_meta,
    )
    from bergloom_spark.operators.isobmff import make_mp4_stream

    return video_meta, [
        encode_mjpeg_avi([np.zeros((6, 8, 3), np.uint8)] * 3, fps=25),
        encode_y4m(np.zeros((2, 6, 8), np.uint8), fps=30),
        make_mp4_stream(320, 240, 24, 48),
    ]


def _seeds_media_frame_count():
    from bergloom_spark.operators.avcodec import media_frame_count
    from bergloom_spark.operators.gifcodec import encode_gif_frames
    from bergloom_spark.operators.tiffcodec import encode_tiff_pages
    from bergloom_spark.operators.isobmff import make_mp4_stream

    pal = np.stack([np.arange(256)] * 3, axis=-1).astype(np.uint8)
    base = (np.arange(30).reshape(5, 6) * 7 % 256)
    gif = encode_gif_frames(
        (6, 5), pal,
        [(0, 0, base, 1, None), (1, 1, base[:2, :2], 2, None)],
    )
    tif = encode_tiff_pages(
        [np.zeros((4, 5), np.uint8), np.ones((3, 3), np.uint8)]
    )
    return media_frame_count, [
        gif, tif, make_mp4_stream(64, 48, 10, 5),
    ]


def _seeds_audio_meta():
    from bergloom_spark.operators.avcodec import (
        audio_meta,
        encode_wav,
        make_adts_stream,
        make_aiff,
        make_flac_stream,
    )
    from bergloom_spark.operators.oggvorbis import make_ogg_vorbis_stream

    return audio_meta, [
        encode_wav(np.zeros(500, np.int16), 16000),
        make_flac_stream(44100, 2, 16, 44100),
        make_ogg_vorbis_stream(48000, 2, 4800, n_audio_pages=1),
        make_aiff(44100, 2, 16, 44100, audio_bytes=32),
        make_aiff(48000, 1, 24, 4800, compression="NONE"),
        _m4a_seed(),
        make_adts_stream(6, sample_rate=44100, channels=2),
        make_adts_stream(3, sample_rate=8000, channels=1, crc=True,
                         blocks_per_frame=2),
    ]


def _m4a_seed():
    from bergloom_spark.operators.isobmff import make_mp4_stream

    return make_mp4_stream(
        0, 0, 25, 0, video_track=False, audio_track=True,
        audio_rate=44100, audio_channels=2, mdat_bytes=48,
    )


def _seeds_warc():
    from bergloom_spark.operators.warc import make_warc, parse_warc

    pages = [
        {"url": f"https://ex.org/{i}", "text": f"body {i} " + "x" * i,
         "status": (200, 404, 301)[i % 3]}
        for i in range(4)
    ]
    wet = [{"url": "https://ex.org/wet", "text": "text", "conversion": True}]

    def parse_both(payload: bytes):
        # r11: the charset-detection path (script-range scorer +
        # density gate) must honor the same no-hang/no-crash
        # contract as the default decode
        parse_warc(payload)
        return parse_warc(payload, detect_charset=True)

    return parse_both, [
        make_warc(pages),
        make_warc(pages, gzip_records=True),
        make_warc(wet, warcinfo=False),
        make_warc(pages[:1], gzip_records=True, warcinfo=False),
        make_warc(
            [{"url": "https://ru.example/", "text": "Привет мир",
              "encoding": "cp1251", "content_type": "text/html"}]
        ),
    ]


def _seeds_archive():
    from bergloom_spark.operators.archive import (
        archive_meta,
        make_gzip,
        make_tar,
        make_zip,
        zip_extract,
    )

    entries = [
        ("d/", b""),
        ("d/a.txt", b"alpha " * 40),
        ("d/b.bin", bytes(range(256)) * 3),
    ]

    def meta_and_extract(payload: bytes):
        m = archive_meta(payload)
        if m["container"] == "zip":
            zip_extract(payload, max_output=1 << 22)
        return m

    from bergloom_spark.operators.archive import make_zstd_frame

    skippable = (0x184D2A53).to_bytes(4, "little") + (4).to_bytes(
        4, "little"
    ) + b"meta"
    return meta_and_extract, [
        make_zip(entries, method=0),
        make_zip(entries, method=8),
        make_tar(entries),
        make_gzip(b"text body " * 30, name="doc.txt"),
        make_gzip(b"a" * 64) + make_gzip(b"b" * 64, name="x"),
        make_zip(entries, method=8, zip64=True),
        make_tar([("n/" * 60 + "leaf.bin", b"xyz" * 30)],
                 longnames="gnu"),
        make_tar([("n/" * 60 + "leaf.bin", b"xyz" * 30)],
                 longnames="pax"),
        make_zstd_frame(5000, n_blocks=3, checksum=True),
        make_zstd_frame(100) + skippable + make_zstd_frame(None,
                                                          dict_id=7),
    ]


def _seeds_pdf():
    from bergloom_spark.operators.pdfmeta import make_pdf, pdf_meta

    return pdf_meta, [
        make_pdf(3, title="fuzz seed (one)"),
        make_pdf(0),
        make_pdf(2, title="enc", encrypted=True),
        make_pdf(4, title="old", incremental_retitle="new"),
        make_pdf(1, title=b"\xfe\xff" + "タイトル".encode("utf-16-be")),
        # r11: the modern layouts — xref streams, predictor rows,
        # object streams, incremental second stream
        make_pdf(3, title="xs", xref_stream=True),
        make_pdf(2, title="xsp", xref_stream=True, objstm=True,
                 predictor=True),
        make_pdf(1, title="a", incremental_retitle="b",
                 xref_stream=True, objstm=True),
    ]


def _seeds_mime():
    from bergloom_spark.operators.mime import make_eml, make_mbox, parse_mbox

    msgs = [
        make_eml("plain", "body one\nline"),
        make_eml("qp — unicode", "naïve café ✓", cte="quoted-printable",
                 encode_subject=True),
        make_eml("b64", "binaryish body", cte="base64",
                 html="<p>alt</p>"),
    ]
    return parse_mbox, [
        make_mbox(msgs),
        make_mbox(msgs[:1]),
        make_mbox([make_eml("nest", "From line stuffing test")]),
    ]


def _seeds_robots():
    from bergloom_spark.operators.robots import (
        make_robots,
        make_sitemap,
        robots_rules,
        sitemap_urls,
    )

    from bergloom_spark.operators.robots import robots_allowed

    # ADVICE r10 (high): the campaign never exercised the per-URL
    # hot path, so the '*'→'.*' ReDoS survived 1100 tests. Every
    # successfully-parsed mutant now also drives robots_allowed
    # against a fixed adversarial path battery — a slow (or
    # crashing) matcher becomes a finding, not a latent hang.
    _PATHS = ("/", "/a" * 150, "/" + "a" * 300,
              "/a/ok/x.pdf", "/%2F..", "/?" + "&x=1" * 40)

    def parse_either(payload: bytes):
        if payload[:5] == b"<?xml" or b"<urlset" in payload[:64]:
            return sitemap_urls(payload)
        rules = robots_rules(payload)
        for p in _PATHS:
            robots_allowed(rules, "fuzzbot", p)
        return rules

    return parse_either, [
        make_robots(
            [{"agents": ["*"], "disallow": ["/a/", "/*.pdf$"],
              "allow": ["/a/ok/"], "crawl_delay": 1.5},
             {"agents": ["bot", "crawler"], "disallow": ["/b"]}],
            sitemaps=("https://e.org/s.xml",),
        ),
        make_robots(
            [{"agents": ["*"],
              "disallow": ["/" + "a*" * 64 + "b", "/" + "*a" * 64],
              "allow": ["/" + "a*" * 64 + "b$"]}],
        ),
        make_sitemap(
            [{"loc": "https://e.org/a", "lastmod": "2025-01-01",
              "changefreq": "daily", "priority": 0.5},
             {"loc": "https://e.org/b&amp;c"}]
        ),
        make_sitemap([{"loc": "https://e.org/s1.xml"}], index=True),
    ]


def _seeds_csv():
    from bergloom_spark.operators.csvmeta import csv_meta, make_csv

    rows = [[str(r), f"name {r}", f"v,{r}"] for r in range(12)]
    return csv_meta, [
        make_csv(rows, header=["id", "name", "val"]),
        make_csv(rows, delimiter=";", quote_all=True, crlf=True),
        make_csv(rows, delimiter="\t"),
        make_csv(rows, delimiter="|") + b"short,row\n",
    ]


def _seeds_triage():
    import numpy as np

    from bergloom_spark.operators.archive import make_zip, make_zstd_frame
    from bergloom_spark.operators.avcodec import (
        encode_y4m,
        make_adts_stream,
        make_mp3_stream,
    )
    from bergloom_spark.operators.isobmff import make_mp4_stream
    from bergloom_spark.operators.pdfmeta import make_pdf
    from bergloom_spark.operators.pngcodec import encode_png
    from bergloom_spark.operators.triage import corpus_triage

    def never_raises(payload: bytes):
        # triage contract is stronger than the family parsers':
        # ANY bytes → dict (unknown/error rows), NEVER an exception.
        # A leaked ValueError must NOT ride the harness's
        # rejection-path amnesty — convert it to a finding.
        try:
            out = corpus_triage(payload)
        except ValueError as exc:
            raise RuntimeError(
                f"triage leaked ValueError: {exc}"
            ) from exc
        assert isinstance(out, dict)
        return out

    return never_raises, [
        encode_png(np.zeros((6, 5, 3), np.uint8)),
        make_adts_stream(4),
        make_mp3_stream([128, 128]),
        encode_y4m(np.zeros((2, 6, 4), np.uint8)),
        make_mp4_stream(32, 24, 10, 8),
        make_zip([("a", b"xy")]),
        make_zstd_frame(300),
        make_pdf(2),
    ]


def _seeds_avro():
    from bergloom_spark.lake.iceberg_export import (
        _MANIFEST_LIST_SCHEMA,
        _manifest_entry_schema,
        write_avro_ocf,
    )
    from bergloom_spark.operators.avrocodec import parse_avro

    entry_schema = _manifest_entry_schema(["cat"])
    entries = [
        {
            "status": 1,
            "snapshot_id": 7,
            "sequence_number": k,
            "file_sequence_number": k,
            "data_file": {
                "content": k % 3,
                "file_path": f"/t/data/f{k}.parquet",
                "file_format": "PARQUET",
                "partition": {"cat": f"c{k}"},
                "record_count": 100 + k,
                "file_size_in_bytes": 4096 * (k + 1),
                "equality_ids": [2] if k % 3 == 2 else None,
                # r13 surface: count maps + truncate-contract string
                # bounds ride in the seeds so mutations exercise them
                "value_counts": [
                    {"key": 1, "value": 100 + k},
                    {"key": 2, "value": 100 + k},
                ],
                "null_value_counts": [{"key": 2, "value": k}],
                "lower_bounds": [
                    {"key": 1, "value": b"\x01\x00\x00\x00\x00\x00\x00\x00"},
                    {"key": 2, "value": "appleappleapplea".encode()},
                ],
                "upper_bounds": [
                    {"key": 1, "value": b"\xff\x00\x00\x00\x00\x00\x00\x00"},
                    {"key": 2, "value": "zebrazebrazebraz".encode()},
                ],
            },
        }
        for k in range(4)
    ]
    mrows = [
        {
            "manifest_path": "/t/m1.avro",
            "manifest_length": 512,
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": 3,
            "min_sequence_number": 1,
            "added_snapshot_id": 7,
            "added_files_count": 4,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": 410,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }
    ]
    # r13: a day-transform spec's manifest (int partition field) —
    # the write_iceberg_tree shape the transform-pruning import reads
    day_schema = _manifest_entry_schema(
        ["ts_day"],
        partition_avro_fields=[
            {"name": "ts_day", "type": ["null", "int"],
             "default": None, "field-id": 1000}
        ],
    )
    day_entries = [
        {
            "status": 1,
            "snapshot_id": 9,
            "sequence_number": 1,
            "file_sequence_number": 1,
            "data_file": {
                "content": 0,
                "file_path": f"/t/data/d{k}.parquet",
                "file_format": "PARQUET",
                "partition": {"ts_day": 19783 + k},
                "record_count": 50,
                "file_size_in_bytes": 2048,
                "equality_ids": None,
            },
        }
        for k in range(3)
    ]
    return parse_avro, [
        write_avro_ocf(entry_schema, entries, codec="deflate"),
        write_avro_ocf(entry_schema, entries, codec="null"),
        write_avro_ocf(day_schema, day_entries, codec="deflate"),
        write_avro_ocf(_MANIFEST_LIST_SCHEMA, mrows, codec="deflate"),
        write_avro_ocf(_MANIFEST_LIST_SCHEMA, [], codec="null"),
    ]


def _seeds_puffin():
    """Puffin footer + deletion-vector blob parsing (r14): the whole
    file is attacker bytes — footer JSON, blob ranges, roaring
    container headers, run lengths, CRC framing. The harness parses
    the footer, then decodes every declared deletion-vector blob;
    contract is clean ValueError on anything structurally wrong."""
    from bergloom_spark.lake import puffin

    def parse_all(payload: bytes):
        meta = puffin.read_file_metadata(payload)
        for b in meta.get("blobs", []):
            if b.get("type") == puffin.DELETION_VECTOR_V1:
                puffin.decode_deletion_vector(
                    puffin.blob_bytes(
                        payload, b["offset"], b["length"]
                    )
                )

    f1, _ = puffin.write_puffin_dvs(
        {"/t/a.parquet": [1, 2, 3, 100, 65536],
         "/t/b.parquet": list(range(0, 9000))}  # run container
    )
    f2, _ = puffin.write_puffin_dvs(
        {"/t/c.parquet":
         sorted({(i * 2654435761) % (1 << 20) for i in range(5000)}),
         # >4096 distinct lows inside one 64 Ki range → a BITMAP
         # container rides in the seeds
         "/t/e.parquet":
         sorted({(i * 40503) % 65536 for i in range(6000)})}
    )
    f3, _ = puffin.write_puffin_dvs(
        {"/t/d.parquet": [2**33, 2**33 + 1, 2**34 + 7]}  # buckets
    )
    f4, _ = puffin.write_puffin_dvs({})
    return parse_all, [f1, f2, f3, f4]


def _seeds_theta_stats():
    """Statistics Puffin files: footer + theta blob parsing with the
    ndv-consistency check (r14). read_ndv_stats re-derives ndv from
    the payload, so mutations attack both the framing and the
    property/payload agreement; contract is clean ValueError."""
    import struct as _struct

    import numpy as np

    from bergloom_spark.lake import puffin
    from bergloom_spark.lake.statistics import (
        _MAX_HASH,
        THETA_BLOB_TYPE,
        deserialize_theta,
        serialize_theta,
        theta_estimate,
    )

    def build(sketches):
        parts = [puffin.MAGIC]
        offset = len(puffin.MAGIC)
        blobs = []
        for col, (hs, theta) in sketches.items():
            blob = serialize_theta(hs, theta)
            blobs.append({
                "type": THETA_BLOB_TYPE, "fields": [1],
                "snapshot-id": 1, "sequence-number": 1,
                "offset": offset, "length": len(blob),
                "properties": {
                    "ndv": str(int(round(
                        theta_estimate(len(hs), theta)))),
                    "column": col,
                    "hash-universe": "spark-xxhash64",
                },
            })
            parts.append(blob)
            offset += len(blob)
        import json as _json

        payload = _json.dumps(
            {"blobs": blobs, "properties": {}}
        ).encode()
        parts += [puffin.MAGIC, payload,
                  _struct.pack("<I", len(payload)),
                  b"\x00\x00\x00\x00", puffin.MAGIC]
        return b"".join(parts)

    def parse(payload: bytes):
        meta = puffin.read_file_metadata(payload)
        for b in meta.get("blobs", []):
            if b.get("type") == THETA_BLOB_TYPE:
                hs, theta = deserialize_theta(
                    puffin.blob_bytes(payload, b["offset"], b["length"])
                )
                props = b.get("properties") or {}
                claimed = props.get("ndv")
                derived = int(round(theta_estimate(len(hs), theta)))
                if claimed is not None:
                    try:
                        ok = int(claimed) == derived
                    except (TypeError, ValueError) as exc:
                        raise ValueError(
                            f"bad ndv property: {exc}"
                        ) from exc
                    if not ok:
                        raise ValueError("ndv disagrees with sketch")

    rng = np.random.default_rng(7)
    exact = np.sort(rng.integers(1, _MAX_HASH, 200, dtype=np.int64))
    big = np.sort(
        np.unique(rng.integers(1, _MAX_HASH, 5000, dtype=np.int64))
    )[:4096]
    return parse, [
        build({"a": (exact, _MAX_HASH)}),
        build({
            "a": (exact, _MAX_HASH),
            "b": (big, int(big[-1]) + 1),
        }),
        build({"empty": (np.empty(0, np.int64), _MAX_HASH)}),
    ]


TARGETS = {
    "avro": _seeds_avro,
    "puffin": _seeds_puffin,
    "theta_stats": _seeds_theta_stats,
    "ogg": _seeds_ogg,
    "warc": _seeds_warc,
    "triage": _seeds_triage,
    "archive": _seeds_archive,
    "pdf": _seeds_pdf,
    "mime": _seeds_mime,
    "robots": _seeds_robots,
    "csv": _seeds_csv,
    "flac": _seeds_flac,
    "exif": _seeds_exif,
    "subtitles": _seeds_subtitles,
    "webp_frames": _seeds_webp_frames,
    "mp4": _seeds_mp4,
    "mkv": _seeds_mkv,
    "id3": _seeds_id3,
    "mp3": _seeds_mp3,
    "video_meta": _seeds_video_meta,
    "media_frame_count": _seeds_media_frame_count,
    "audio_meta": _seeds_audio_meta,
}


def _alarm_handler(signum, frame):
    raise TimeoutError("parser exceeded the hang budget")


def _run_one(fn, payload: bytes):
    # Two-layer catch (review r10): the alarm can fire AFTER fn()
    # returned but BEFORE the finally clears the itimer — inside the
    # except/return machinery — where the inner TimeoutError clause
    # no longer applies. The outer except absorbs that late alarm as
    # "not a hang" instead of killing the pool worker (which would
    # abort the whole campaign) or mis-reporting a finding.
    try:
        signal.setitimer(signal.ITIMER_REAL, HANG_SECONDS)
        try:
            fn(payload)
            return None
        except ValueError:
            return None  # the contract's rejection path
        except TimeoutError:
            return "HANG"
        except BaseException as exc:  # noqa: BLE001 — the fuzz's point
            return f"{type(exc).__name__}: {exc}"
        finally:
            signal.setitimer(signal.ITIMER_REAL, 0)
    except TimeoutError:
        return None  # late alarm past fn() — the parse completed


def _mutations(seed: bytes, n: int, rng) -> list:
    out = []
    ln = len(seed)
    # all truncations at a stride that caps per-seed work
    stride = max(1, ln // 500)
    out.extend(seed[:c] for c in range(0, ln, stride))
    for _ in range(n):
        kind = rng.randint(5)
        b = bytearray(seed)
        if kind == 0:  # point mutations, 1..4 bytes
            for _ in range(1 + rng.randint(4)):
                b[rng.randint(ln)] = rng.randint(256)
        elif kind == 1:  # flip bits
            for _ in range(1 + rng.randint(8)):
                b[rng.randint(ln)] ^= 1 << rng.randint(8)
        elif kind == 2:  # splice a random window elsewhere
            w = 1 + rng.randint(min(64, ln))
            src = rng.randint(max(1, ln - w))
            dst = rng.randint(max(1, ln - w))
            b[dst : dst + w] = seed[src : src + w]
        elif kind == 3:  # insert random bytes
            at = rng.randint(ln + 1)
            ins = bytes(rng.randint(0, 256, 1 + rng.randint(16),
                                    dtype=np.uint8))
            b[at:at] = ins
        else:  # delete a window
            w = 1 + rng.randint(min(64, ln))
            at = rng.randint(max(1, ln - w))
            del b[at : at + w]
        out.append(bytes(b))
    return out


def _worker(args):
    target, n_per_seed, worker_seed = args
    signal.signal(signal.SIGALRM, _alarm_handler)
    fn, seeds = TARGETS[target]()
    rng = np.random.RandomState(worker_seed)
    tested = 0
    findings = []
    for si, seed in enumerate(seeds):
        for payload in _mutations(seed, n_per_seed, rng):
            res = _run_one(fn, payload)
            tested += 1
            if res is not None:
                os.makedirs(FINDINGS_DIR, exist_ok=True)
                path = os.path.join(
                    FINDINGS_DIR,
                    f"{target}_s{si}_w{worker_seed}_{len(findings)}.bin",
                )
                with open(path, "wb") as fh:
                    fh.write(payload)
                findings.append((res, path))
    return target, tested, findings


def main() -> None:
    import multiprocessing as mp

    args = sys.argv[1:]
    n_per_seed = 4000
    if args and args[0].isdigit():
        n_per_seed = int(args[0])
        args = args[1:]
    targets = args or list(TARGETS)
    for t in targets:
        if t not in TARGETS:
            sys.exit(f"unknown target {t!r}; known: {sorted(TARGETS)}")
    ncpu = os.cpu_count() or 8
    # spread each target across several differently-seeded workers
    per_target_workers = max(1, ncpu // max(1, len(targets)))
    jobs = [
        (t, n_per_seed, 1000 * ti + w)
        for ti, t in enumerate(targets)
        for w in range(per_target_workers)
    ]
    total = 0
    all_findings = []
    with mp.Pool(min(ncpu, len(jobs))) as pool:
        for target, tested, findings in pool.imap_unordered(_worker, jobs):
            total += tested
            all_findings.extend((target, *f) for f in findings)
            status = "clean" if not findings else f"{len(findings)} FINDINGS"
            print(f"{target}: {tested} payloads, {status}", flush=True)
    print(f"\nTOTAL: {total} payloads across {len(targets)} targets")
    if all_findings:
        print(f"{len(all_findings)} findings (exact bytes saved):")
        for target, res, path in all_findings:
            print(f"  [{target}] {res} -> {path}")
        sys.exit(1)
    print("campaign clean")


if __name__ == "__main__":
    main()
