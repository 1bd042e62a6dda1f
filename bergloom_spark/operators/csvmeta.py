"""CSV/TSV dialect sniffing — the delimited-text triage a corpus
ingest runs before handing files to ``spark.read.csv``: Spark's
reader is fast and distributed but must be TOLD the dialect, and a
100 TB drop of mixed exports (Excel ;-separated, TSV dumps, piped
logs) mis-parses silently if you guess comma.

``csv_meta`` detects the delimiter/quote/header against an RFC 4180
state machine (quoted fields may contain delimiters and newlines —
the part naive line-splitting gets wrong), reports column-count
consistency, and returns exactly the options to pass to
``spark.read.csv(..., sep=..., quote=..., header=...)``. DuckDB's
``sniff_csv`` is the interop oracle in tests.

Corpus contract: bytes → dict or ValueError; the state machine's
cursor strictly advances; sniffing reads at most ``sample_bytes``."""

from __future__ import annotations

__all__ = ["split_csv", "csv_meta", "make_csv"]

_DELIMS = (",", "\t", ";", "|")
_MAX_FIELDS = 100_000


def split_csv(
    text: str,
    delimiter: str = ",",
    quote: str = '"',
    discard_truncated_tail: bool = False,
) -> list[list[str]]:
    """RFC 4180 record split: quoted fields may contain delimiters,
    newlines, and doubled-quote escapes. CRLF and LF both terminate
    records; a trailing newline does not create an empty record.
    An unterminated quote raises ValueError — unless
    ``discard_truncated_tail`` is set (a sniffing sample cut
    mid-payload), in which case the in-progress record is dropped
    instead (the cut, not the data, is at fault). The field cap is
    PER RECORD (review r10: a cumulative cap silently disqualified
    the true delimiter on ordinary megabyte CSVs)."""
    records: list[list[str]] = []
    field: list[str] = []
    row: list[str] = []
    i, n = 0, len(text)
    in_quotes = False
    while i < n:
        c = text[i]
        if in_quotes:
            if c == quote:
                if text[i + 1 : i + 2] == quote:  # doubled escape
                    field.append(quote)
                    i += 2
                    continue
                in_quotes = False
                i += 1
            else:
                field.append(c)
                i += 1
            continue
        if c == quote and not field:
            in_quotes = True
            i += 1
        elif c == delimiter:
            row.append("".join(field))
            field = []
            if len(row) > _MAX_FIELDS:
                raise ValueError("CSV record exceeds the field cap")
            i += 1
        elif c == "\n" or c == "\r":
            if c == "\r" and text[i + 1 : i + 2] == "\n":
                i += 1
            row.append("".join(field))
            records.append(row)
            field, row = [], []
            i += 1
        else:
            field.append(c)
            i += 1
    if in_quotes:
        if discard_truncated_tail:
            return records
        raise ValueError("unterminated quoted CSV field")
    if field or row:
        row.append("".join(field))
        records.append(row)
    return records


def _looks_numeric(s: str) -> bool:
    s = s.strip()
    if not s:
        return False
    try:
        float(s)
        return True
    except ValueError:
        return False


def csv_meta(
    payload: bytes, sample_bytes: int = 1 << 20
) -> dict:
    """Dialect sniff → ``{delimiter, quote, has_header, n_cols,
    n_rows_sampled, ragged_frac_milli}``:

    - delimiter: the candidate (``, \\t ; |``) whose RFC 4180 parse
      yields the most CONSISTENT multi-column shape (max rows
      agreeing with the modal column count; ties break toward the
      higher modal count, then candidate order);
    - header: first row is all non-numeric non-empty while some
      data row has a numeric in a column whose header is not — the
      standard csv.Sniffer-style heuristic, deterministic here;
    - ragged_frac_milli: rows disagreeing with the modal column
      count, per-mille (the mis-parse alarm).

    A payload with no delimiter yielding ≥2 columns raises
    ValueError (single-column text is not delimited data — callers
    wanting that read it as text)."""
    sample = payload[:sample_bytes]
    if len(payload) > sample_bytes:
        # the cut can land mid-codepoint on a perfectly valid file:
        # trim trailing continuation bytes plus one lead byte before
        # the strict decode (review r10 — a false not-UTF-8 reject)
        drop = 0
        while drop < 3 and drop < len(sample) and (
            sample[-1 - drop] & 0xC0
        ) == 0x80:
            drop += 1
        if drop < len(sample) and sample[-1 - drop] >= 0xC0:
            drop += 1
        if drop:
            sample = sample[:-drop]
    try:
        text = sample.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise ValueError(f"CSV sample is not UTF-8: {exc}") from exc
    if not text.strip():
        raise ValueError("empty CSV payload")
    truncated = len(payload) > sample_bytes
    best = None  # (consistent_rows, modal_cols, -cand_idx, delim, recs)
    for idx, delim in enumerate(_DELIMS):
        try:
            recs = split_csv(
                text, delimiter=delim,
                discard_truncated_tail=truncated,
            )
        except ValueError:
            continue
        if truncated and len(recs) > 1:
            # the cut can land mid-record WITHOUT an open quote too
            # (half a line parses as a clean short record and skews
            # the shape) — the state machine already dropped an
            # open-quote tail; drop the suspect last record UNLESS
            # it is the only one (a first record longer than the
            # sample still deserves a best-effort sniff — review
            # r10 pass 3)
            recs = recs[:-1]
        if not recs:
            continue
        counts: dict[int, int] = {}
        for r in recs:
            counts[len(r)] = counts.get(len(r), 0) + 1
        modal_cols, consistent = max(
            counts.items(), key=lambda kv: (kv[1], kv[0])
        )
        if modal_cols < 2:
            continue
        key = (consistent, modal_cols, -idx)
        if best is None or key > best[0]:
            best = (key, delim, recs, modal_cols, consistent)
    if best is None:
        raise ValueError(
            "no candidate delimiter yields a multi-column shape"
        )
    _, delim, recs, n_cols, consistent = best
    ragged = len(recs) - consistent
    # header heuristic on rows matching the modal shape
    shaped = [r for r in recs if len(r) == n_cols]
    has_header = False
    if len(shaped) >= 2:
        head, body = shaped[0], shaped[1:]
        if all(f.strip() and not _looks_numeric(f) for f in head):
            has_header = any(
                _looks_numeric(r[c])
                for r in body
                for c in range(n_cols)
            )
    return {
        "delimiter": delim,
        "quote": '"',
        "has_header": has_header,
        "n_cols": n_cols,
        "n_rows_sampled": len(recs),
        "ragged_frac_milli": ragged * 1000 // len(recs),
    }


def make_csv(
    rows: list[list[str]],
    delimiter: str = ",",
    header: list[str] | None = None,
    quote_all: bool = False,
    crlf: bool = False,
) -> bytes:
    """RFC 4180 writer for fixtures: fields containing the
    delimiter, quotes, or newlines are quoted (with doubled-quote
    escapes); ``quote_all`` forces quoting everywhere."""
    eol = "\r\n" if crlf else "\n"

    def enc_field(f: str) -> str:
        must = quote_all or any(
            ch in f for ch in (delimiter, '"', "\n", "\r")
        )
        if must:
            return '"' + f.replace('"', '""') + '"'
        return f

    out = []
    for r in ([header] if header else []) + rows:
        out.append(delimiter.join(enc_field(f) for f in r))
    return (eol.join(out) + eol).encode("utf-8")
