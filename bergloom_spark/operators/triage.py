"""Unified corpus triage — ONE magic dispatch across every sniffer
in the repo, so a fully mixed 100 TB drop (images, audio, video,
archives, documents, web captures) triages in a single Arrow-batched
kernel with one output schema. This is the capstone of the
decide-before-work batteries: the first pass a real ingest runs, and
the pass whose output routes payloads to the explosion/decode/
extract stages each family provides.

Routing is structural (magic bytes, never extensions), reusing the
per-family dispatchers verbatim — their hardening, budgets, and fuzz
coverage apply unchanged:

- image → :func:`imagecodec.image_meta` (9 formats);
- audio → :func:`avcodec.audio_meta` (WAV/FLAC/Ogg-Vorbis+Opus/
  AIFF/m4a/ADTS-AAC/MP3);
- video → :func:`avcodec.video_meta` (AVI/Y4M/MP4) and
  :func:`ebml.mkv_meta` (Matroska/WebM);
- archive → :func:`archive.archive_meta` (ZIP incl. zip64 / ustar
  TAR incl. long names / gzip / zstd);
- web capture → :func:`warc.parse_warc` (record count only —
  header fields, bodies untouched);
- document → :func:`pdfmeta.pdf_meta`;
- the RIFF and ftyp families are disambiguated by form type /
  track shape BEFORE family dispatch (WAV vs AVI vs WebP share the
  RIFF magic; m4a vs mp4 share ftyp and split on video presence).

Unknown magic is DATA here, not an error: the triage row reports
``kind='unknown'`` so a corpus report can quantify the residue — a
kernel over a mixed drop must not die on the first novel format
(unlike the per-family sniffs, whose reject-with-ValueError contract
is for callers that already know the family)."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["corpus_triage", "triage_batch"]

_SCHEMA = (
    "doc_id long, kind string, container string, n_items long, "
    "width long, height long, duration_ms long, error string"
)


def corpus_triage(payload: bytes) -> dict:
    """ANY payload → ``{kind, container, n_items, width, height,
    duration_ms, error}``. ``n_items`` is the family's cardinality:
    frames (video/animation), archive entries, WARC records, PDF
    pages, audio=1. A payload whose family is recognized but whose
    structure is malformed reports the family's ValueError text
    under ``error`` (triage output is a corpus-health report;
    surfacing the breakage per row IS the report)."""
    d = payload
    out = {
        "kind": "unknown", "container": None, "n_items": None,
        "width": None, "height": None, "duration_ms": None,
        "error": None,
    }

    def fill(kind, container, n_items=None, width=None,
             height=None, duration_ms=None):
        out.update(
            kind=kind, container=container, n_items=n_items,
            width=width, height=height, duration_ms=duration_ms,
        )

    try:
        if d[:4] == b"RIFF":
            form = d[8:12]
            if form == b"WAVE":
                m = _audio(d)
            elif form == b"AVI ":
                m = _video(d)
            elif form == b"WEBP":
                m = _image(d)
            else:
                out["kind"] = "unknown"
                return out
            fill(**m)
            return out
        if len(d) >= 12 and d[4:8] == b"ftyp":
            from bergloom_spark.operators.isobmff import mp4_meta

            m = mp4_meta(d)
            if m["width"]:
                fill("video", "mp4", m["n_frames"], m["width"],
                     m["height"], m["duration_ms"])
            else:
                fill("audio", "m4a",
                     duration_ms=m["duration_ms"])
                out["n_items"] = 1
            return out
        if d[:4] == b"\x1a\x45\xdf\xa3":  # EBML
            from bergloom_spark.operators.ebml import mkv_meta

            m = mkv_meta(d)
            fill("video", m["container"], m["n_tracks"],
                 m["width"], m["height"], m["duration_ms"])
            return out
        if d[:6] in (b"GIF87a", b"GIF89a") or d[:2] in (
            b"II", b"MM", b"P6", b"BM"
        ) or d[:4] == b"\x89PNG" or d[:2] == b"\xff\xd8":
            fill(**_image(d))
            return out
        if (
            d[:4] in (b"fLaC", b"OggS")
            or (d[:4] == b"FORM" and d[8:12] in (b"AIFF", b"AIFC"))
            or d[:3] == b"ID3"
            or (len(d) >= 2 and d[0] == 0xFF
                and (d[1] & 0xE0) == 0xE0)
        ):
            fill(**_audio(d))
            return out
        if d[:9] == b"YUV4MPEG2":
            fill(**_video(d))
            return out
        if d[:4] in (
            # full ZIP signatures (APPNOTE 4.3.6) — ADVICE r10: a
            # bare b"PK" prefix misrouted TARs whose first entry
            # name starts with 'PK'
            b"PK\x03\x04", b"PK\x05\x06", b"PK\x07\x08",
        ) or d[:2] == b"\x1f\x8b" or (
            d[257:262] == b"ustar"
        ) or d[:4] == b"\x28\xb5\x2f\xfd" or (
            len(d) >= 4
            and 0x184D2A50
            <= int.from_bytes(d[:4], "little")
            <= 0x184D2A5F
        ):
            from bergloom_spark.operators.archive import archive_meta

            m = archive_meta(d)
            fill("archive", m["container"], m["n_entries"])
            return out
        if d[:5] == b"WARC/":
            from bergloom_spark.operators.warc import parse_warc

            recs = parse_warc(d)
            fill("web", "warc", len(recs))
            return out
        if d[:5] == b"%PDF-":
            from bergloom_spark.operators.pdfmeta import pdf_meta

            m = pdf_meta(d)
            fill("document", "pdf", m["n_pages"])
            return out
        return out  # unknown magic: data, not an error
    except ValueError as exc:
        out["error"] = str(exc)[:500]
        return out


def _image(d: bytes) -> dict:
    from bergloom_spark.operators.avcodec import media_frame_count
    from bergloom_spark.operators.imagecodec import image_meta

    m = image_meta(d)
    n = 1
    if m["format"] in ("gif", "webp", "tiff"):
        try:
            n = media_frame_count(d)["n_frames"]
        except ValueError:
            n = 1  # still-image metadata is valid even when the
            # frame battery gates the decode (lossy-VP8 stills)
    return {
        "kind": "image", "container": m["format"], "n_items": n,
        "width": m["width"], "height": m["height"],
    }


def _audio(d: bytes) -> dict:
    from bergloom_spark.operators.avcodec import audio_meta

    m = audio_meta(d)
    return {
        "kind": "audio", "container": m["container"], "n_items": 1,
        "duration_ms": m["duration_ms"],
    }


def _video(d: bytes) -> dict:
    from bergloom_spark.operators.avcodec import video_meta

    m = video_meta(d)
    return {
        "kind": "video", "container": m["container"],
        "n_items": m["n_frames"], "width": m["width"],
        "height": m["height"], "duration_ms": m["duration_ms"],
    }


def triage_batch(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """The one-kernel mixed-corpus pass: map-only Arrow-batched,
    bytes never shuffle, one short row out per payload."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                m = corpus_triage(bytes(payload))
                rows.append(
                    (int(doc_id), m["kind"], m["container"],
                     m["n_items"], m["width"], m["height"],
                     m["duration_ms"], m["error"])
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "container", "n_items",
                         "width", "height", "duration_ms", "error"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, _SCHEMA
    )
