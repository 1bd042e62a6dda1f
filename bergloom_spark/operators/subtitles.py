"""Subtitle/caption containers (SRT, WebVTT) — the video-TEXT side of
the multimodal corpus (round 9; register driver rows in round 10).

A video-captions training corpus is (frame, caption-span) pairs; the
captions arrive as SubRip (.srt) or WebVTT (.vtt) sidecar files. Both
are line-oriented text formats with exact integer timestamp
arithmetic, so parsing is oracle-able to the millisecond and needs no
library. The parse is the plumbing that turns a binary sidecar column
into one row per cue — after that, cue text flows through the
existing text operators (language-ID, quality, dedup) and cue spans
join against :func:`avcodec.sample_video_frames` output on time.

Scale shape: executor-side kernel for Arrow-batched ``mapInPandas``,
map-only over the scan partitioning; the cue explosion happens inside
the batch (same seam as every codec here). The corpus contract holds:
any bytes → parse or ValueError, never a crash or a hang (cursor
strictly advances per line).
"""

from __future__ import annotations

import re

__all__ = [
    "parse_srt",
    "parse_vtt",
    "parse_subtitles",
    "make_srt",
    "make_vtt",
    "subtitle_stats",
]

_SRT_TS = re.compile(
    r"^(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})$"
)
# WebVTT allows MM:SS.mmm (hours optional)
_VTT_TS = re.compile(
    r"^(?:(\d{1,4}):)?(\d{2}):(\d{2})\.(\d{3})$"
)


def _decode_text(payload: bytes) -> str:
    try:
        text = payload.decode("utf-8-sig")  # strip BOM if present
    except UnicodeDecodeError as exc:
        raise ValueError(f"subtitle payload is not UTF-8: {exc}") from exc
    return text.replace("\r\n", "\n").replace("\r", "\n")


def _ts_ms(token: str, pattern: re.Pattern, what: str) -> int:
    m = pattern.match(token)
    if not m:
        raise ValueError(f"bad {what} timestamp {token!r}")
    groups = [g or "0" for g in m.groups()]
    h, mnt, s, ms = (int(g) for g in groups)
    if mnt >= 60 or s >= 60:
        raise ValueError(f"bad {what} timestamp {token!r}: mm/ss >= 60")
    return ((h * 60 + mnt) * 60 + s) * 1000 + ms


def _parse_cue_blocks(
    lines: list, start_idx: int, ts_pattern: re.Pattern, what: str
) -> list:
    """Shared cue-block walk: blocks separated by blank lines, each
    with an optional identifier line, a ``start --> end`` timing line
    (settings after the arrow are tolerated, per WebVTT), then text
    lines until the next blank. Returns [(start_ms, end_ms, text)]."""
    cues = []
    i = start_idx
    n = len(lines)
    while i < n:
        while i < n and not lines[i].strip():
            i += 1
        if i >= n:
            break
        block = []
        while i < n and lines[i].strip():
            block.append(lines[i])
            i += 1
        # comment blocks (WebVTT NOTE / STYLE / REGION) are skipped
        head = block[0].strip()
        if what == "WebVTT" and head.split(" ")[0] in (
            "NOTE", "STYLE", "REGION",
        ):
            continue
        timing_idx = 0 if "-->" in block[0] else 1
        if timing_idx == 1 and what == "SRT":
            # SubRip cue numbers are integers when present (not
            # required to be sequential — renumbering tools break
            # that); a non-numeric identifier line means the payload
            # is not SRT framing (ADVICE r9: the docstring promised
            # this validation — now implemented, not just claimed)
            # ASCII-digits-only: int()'s grammar also admits
            # underscores, signs, whitespace, and unicode digits —
            # none of which are SubRip cue-number framing (review r10)
            if not (head.isascii() and head.isdigit()):
                raise ValueError(
                    f"SRT cue identifier is not an integer: "
                    f"{head[:40]!r}"
                )
        if timing_idx >= len(block) or "-->" not in block[timing_idx]:
            raise ValueError(
                f"{what} cue block has no '-->' timing line: "
                f"{head[:40]!r}"
            )
        timing = block[timing_idx]
        parts = timing.split("-->")
        if len(parts) != 2:
            raise ValueError(f"malformed {what} timing line {timing!r}")
        start = _ts_ms(parts[0].strip(), ts_pattern, what)
        # WebVTT puts cue settings after the end timestamp
        end_tok = parts[1].strip().split(" ")[0]
        end = _ts_ms(end_tok, ts_pattern, what)
        if end < start:
            raise ValueError(
                f"{what} cue ends before it starts: {timing!r}"
            )
        text = "\n".join(block[timing_idx + 1 :])
        cues.append((start, end, text))
    return cues


def parse_srt(payload: bytes) -> list:
    """SubRip bytes → ``[(start_ms, end_ms, text)]``. Timestamps are
    ``HH:MM:SS,mmm`` (a ``.`` decimal separator is tolerated — both
    appear in the wild); cue numbers are validated as integers when
    present but not required to be sequential (renumbering tools
    break that guarantee routinely)."""
    lines = _decode_text(payload).split("\n")
    return _parse_cue_blocks(lines, 0, _SRT_TS, "SRT")


def parse_vtt(payload: bytes) -> list:
    """WebVTT bytes → ``[(start_ms, end_ms, text)]``. Requires the
    ``WEBVTT`` magic line; skips NOTE/STYLE/REGION blocks; tolerates
    cue settings after the end timestamp and optional hour fields."""
    lines = _decode_text(payload).split("\n")
    if not lines or not lines[0].strip().startswith("WEBVTT"):
        raise ValueError("not a WebVTT payload (missing WEBVTT magic)")
    return _parse_cue_blocks(lines, 1, _VTT_TS, "WebVTT")


def parse_subtitles(payload: bytes) -> tuple:
    """ANY subtitle container → ``(format, [(start_ms, end_ms,
    text)])`` — magic-sniff dispatch, same stance as
    :func:`avcodec.audio_meta`. WebVTT by its magic line; otherwise
    SRT (SubRip has no magic — it starts directly with a cue)."""
    head = payload[:16]
    if head[:3] == b"\xef\xbb\xbf":
        head = head[3:]
    if head.startswith(b"WEBVTT"):
        return "vtt", parse_vtt(payload)
    return "srt", parse_srt(payload)


def _fmt_ts(ms: int, vtt: bool) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, milli = divmod(rem, 1000)
    sep = "." if vtt else ","
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{milli:03d}"


def make_srt(cues: list) -> bytes:
    """``[(start_ms, end_ms, text)]`` → SubRip bytes (for tests and
    oracles)."""
    out = []
    for k, (start, end, text) in enumerate(cues, 1):
        out.append(
            f"{k}\n{_fmt_ts(start, False)} --> {_fmt_ts(end, False)}"
            f"\n{text}\n"
        )
    return "\n".join(out).encode()


def make_vtt(cues: list, note: str | None = None) -> bytes:
    """``[(start_ms, end_ms, text)]`` → WebVTT bytes."""
    out = ["WEBVTT\n"]
    if note:
        out.append(f"NOTE {note}\n")
    for start, end, text in cues:
        out.append(
            f"{_fmt_ts(start, True)} --> {_fmt_ts(end, True)}"
            f"\n{text}\n"
        )
    return "\n".join(out).encode()


def subtitle_stats(cues: list) -> dict:
    """Per-file triage aggregates over parsed cues: ``{n_cues,
    total_ms, span_ms, n_chars, overlap_ms}`` — the quality gates a
    caption corpus filters on (coverage ratio = total/span; heavy
    overlap = karaoke/sign-dupes; empty text = timing-only files)."""
    if not cues:
        return {
            "n_cues": 0, "total_ms": 0, "span_ms": 0, "n_chars": 0,
            "overlap_ms": 0,
        }
    total = sum(e - s for s, e, _ in cues)
    span = max(e for _, e, _ in cues) - min(s for s, _, _ in cues)
    n_chars = sum(len(t) for _, _, t in cues)
    # overlap: sum of pairwise-adjacent overlaps in start order (the
    # common case — full O(n²) overlap is not a triage quantity)
    ordered = sorted(cues, key=lambda c: (c[0], c[1]))
    overlap = 0
    prev_end = None
    for s, e, _ in ordered:
        if prev_end is not None and s < prev_end:
            overlap += min(e, prev_end) - s
        prev_end = e if prev_end is None else max(prev_end, e)
    return {
        "n_cues": len(cues),
        "total_ms": total,
        "span_ms": span,
        "n_chars": n_chars,
        "overlap_ms": overlap,
    }
