"""Cross-engine deterministic 64-bit hashing.

Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are different
functions, so oracle-checked operators (minhash, simhash,
fingerprints) need a hash both engines compute identically. MD5 is
available and bit-identical in both; the first 15 hex chars parsed
big-endian give a deterministic positive 60-bit value:

- Spark:  ``conv(substr(md5(s), 1, 15), 16, 10)`` cast to long
- DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT``

MD5 costs more than xxhash64 but stays JVM-side / vectorized in both
engines; hot paths that do not need an oracle (e.g. shuffle salting)
should keep using ``F.xxhash64``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60
HASH_MAX = (1 << HASH_BITS) - 1


def hash64(col: Column | str, seed: int | None = None) -> Column:
    """Deterministic 60-bit hash of a string column (Spark side)."""
    col = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        col = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str, seed: int | None = None) -> str:
    """The same hash as a DuckDB SQL fragment."""
    if seed is not None:
        expr = f"('{seed}:' || {expr})"
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
