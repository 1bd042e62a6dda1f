"""File-level min/max data skipping (Iceberg-style scan pruning).

Every data file's manifest entry records per-column [min, max] ranges
harvested from the parquet footer at write time (zero extra I/O — the
footer is already read for record counts). A filtered scan then drops
whole files whose range cannot satisfy the predicate BEFORE Spark ever
lists them — at 100 TB on time- or key-clustered tables this is the
difference between scanning a day and scanning the archive. Parquet's
own row-group pruning still applies inside the files that survive.

Semantics are conservative: a file is skipped only when its stats PROVE
no row can match. Columns without safe stats (strings — parquet
truncates binary min/max — or missing footers) simply never prune.
The row-level filter is always applied on top, so pruning can only
change cost, never results.

Reference context: the reference delegates this to iceberg-rs manifest
evaluation; here it is explicit because the lake/ substrate owns its
own manifests (metadata.py).
"""

from __future__ import annotations

import datetime
import hashlib
from typing import Any, Iterable

OPS = ("=", "<", "<=", ">", ">=")

# Per-file, per-column Bloom filter for EQUALITY pruning (round 3).
# Min/max ranges prune clustered keys; a hash-partitioned or
# unclustered high-cardinality key has every file spanning the whole
# range, so stats never prune point lookups — the workload Iceberg
# addresses with parquet bloom filters (write.parquet.bloom-filter-
# enabled.column.*). m=16384 bits / k=4 gives ~2% false positives at
# 2k distinct values per file for 2 KiB of manifest per column.
BLOOM_M = 16384
BLOOM_K = 4


def _bloom_positions(value: Any) -> list[int] | None:
    """Bit positions of ``value`` (double-hashing h1 + i·h2). Only
    exact-representation types participate — floats don't canonicalize
    reliably across writers, so they never build or probe a bloom."""
    if isinstance(value, bool) or not isinstance(value, (int, str)):
        return None
    s = str(value).encode()
    h1 = int.from_bytes(hashlib.md5(s).digest()[:8], "big")
    h2 = int.from_bytes(hashlib.md5(b"b:" + s).digest()[:8], "big") | 1
    return [(h1 + i * h2) % BLOOM_M for i in range(BLOOM_K)]


def build_bloom(values: Iterable[Any]) -> str | None:
    """Type-tagged hex Bloom bitset over ``values`` (``"i:<hex>"`` for
    int columns, ``"s:<hex>"`` for string columns); None if any value is
    a type blooms can't canonicalize — including a MIXED int/str column
    (the column then never prunes). The build-type tag exists because
    the read path's row filter uses Spark comparison semantics with
    numeric coercion: a string column holding "5.0" probed with the int
    literal 5 matches Spark's filter ('5.0' = 5 coerces true) but
    str(5) = "5" would miss the bloom — so a probe whose literal type
    differs from the build type must never prune."""
    bits = bytearray(BLOOM_M // 8)
    tag = None
    for v in values:
        if v is None:
            continue
        pos = _bloom_positions(v)
        if pos is None:
            return None
        vtag = "i" if isinstance(v, int) else "s"
        if tag is None:
            tag = vtag
        elif tag != vtag:
            return None  # mixed-type column: cross-coercion, no bloom
        for p in pos:
            bits[p >> 3] |= 1 << (p & 7)
    return f"{tag or 's'}:{bits.hex()}"


def bloom_may_contain(bloom_hex: str, value: Any) -> bool:
    """Conservative membership: False ONLY when the file provably does
    not contain ``value``. Untagged (legacy-format) blooms and probes
    whose literal type differs from the bloom's build type return True
    — they carry no safe evidence under Spark's coercing comparisons."""
    if ":" not in bloom_hex[:2]:
        return True  # legacy untyped bloom: cannot prune safely
    tag, _, hexbits = bloom_hex.partition(":")
    if isinstance(value, bool):
        return True
    vtag = "i" if isinstance(value, int) else "s" if isinstance(value, str) else None
    if vtag != tag:
        return True  # type mismatch: Spark may coerce-match, don't prune
    pos = _bloom_positions(value)
    if pos is None:
        return True
    bits = bytes.fromhex(hexbits)
    return all(bits[p >> 3] & (1 << (p & 7)) for p in pos)

# (col, op, literal) triples, ANDed.
Filters = Iterable[tuple[str, str, Any]]


def stat_value(v: Any) -> Any:
    """JSON-safe footer stat, or None when the type can't prune safely
    (notably strings/bytes: parquet writers may truncate them, and a
    truncated max understates the true range)."""
    if isinstance(v, bool) or isinstance(v, (int, float)):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return None


def footer_column_stats(meta) -> dict[str, list]:
    """Aggregate per-column [min, max] across all row groups of one
    parquet footer (``pyarrow.parquet.FileMetaData``). A column drops
    out entirely if ANY row group lacks usable min/max."""
    valid: dict[str, list] = {}
    invalid: set[str] = set()
    for rg in range(meta.num_row_groups):
        row = meta.row_group(rg)
        for ci in range(row.num_columns):
            col = row.column(ci)
            name = col.path_in_schema
            if "." in name or name in invalid:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                invalid.add(name)
                valid.pop(name, None)
                continue
            lo, hi = stat_value(st.min), stat_value(st.max)
            if lo is None or hi is None:
                invalid.add(name)
                valid.pop(name, None)
                continue
            if name in valid:
                plo, phi = valid[name]
                valid[name] = [min(plo, lo), max(phi, hi)]
            else:
                valid[name] = [lo, hi]
    return valid


def _align(value: Any, stored_lo: Any) -> Any:
    """Bring the predicate literal into the stats' comparison domain
    (ISO strings parse back to datetimes so comparison is temporal,
    never lexicographic)."""
    if isinstance(stored_lo, str):
        if isinstance(value, datetime.datetime):
            return value
        if isinstance(value, datetime.date):
            return datetime.datetime(value.year, value.month, value.day)
        if isinstance(value, str):
            return datetime.datetime.fromisoformat(value)
        raise TypeError(f"cannot compare {value!r} with temporal stats")
    return value


def entry_may_match(entry, col: str, op: str, value: Any) -> bool:
    """Conservative range check: False ONLY when no row in the file can
    satisfy ``col <op> value``. Equality predicates additionally probe
    the file's per-column Bloom filter when one was written — the prune
    path for point lookups on unclustered keys where [min, max] spans
    everything."""
    if op == "=":
        blooms = getattr(entry, "column_blooms", None) or {}
        bloom = blooms.get(col)
        if bloom and not bloom_may_contain(bloom, value):
            return False
    rng = getattr(entry, "column_stats", None) or {}
    stored = rng.get(col)
    if not stored:
        return True
    lo, hi = stored
    try:
        if isinstance(lo, str):
            lo = datetime.datetime.fromisoformat(lo)
            hi = datetime.datetime.fromisoformat(hi)
        value = _align(value, stored[0])
        if op == "=":
            return lo <= value <= hi
        if op == "<":
            return lo < value
        if op == "<=":
            return lo <= value
        if op == ">":
            return hi > value
        if op == ">=":
            return hi >= value
    except (TypeError, ValueError):
        return True
    raise ValueError(f"unknown op {op!r}; expected one of {OPS}")


def prune_entries(entries: list, filters: Filters) -> list:
    """Entries that may contain matching rows (AND over filters)."""
    filters = list(filters)
    for col, op, _ in filters:
        if op not in OPS:
            raise ValueError(f"unknown op {op!r}; expected one of {OPS}")
    return [
        e
        for e in entries
        if all(entry_may_match(e, c, o, v) for (c, o, v) in filters)
    ]
