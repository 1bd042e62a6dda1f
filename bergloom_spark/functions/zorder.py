"""Z-order (Morton) interleaving for multi-column file clustering.

Single-column range clustering (SortCompaction) makes parquet min/max
pruning work for ONE column; queries filtering on a second column still
read everything. Interleaving the bits of several columns into one sort
key gives every interleaved column locality: each output file covers a
small hyper-rectangle of the key space, so min/max prunes files for
predicates on ANY of the z-ordered columns (the same layout strategy
Iceberg/Delta expose as ``rewrite_data_files(strategy => 'sort',
sort_order => 'zorder(...)')``).

Pure JVM expression — computed once per row at rewrite time, never in
the read path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_value(
    cols: list[Column | str],
    bits: int = 16,
    ranges: list[tuple[float, float]] | None = None,
) -> Column:
    """Morton-interleave the low ``bits`` of each column into one long.

    WITHOUT ``ranges``, raw values are masked to ``bits`` — correct
    only when every column already spans ~the full 2^bits domain.
    Mismatched domains silently break the interleave: a column whose
    values fit in 10 bits contributes constant zeros at the positions
    where its missing high bits interleave, so the sort degenerates to
    the wider column and the narrow column gets NO file locality.

    WITH ``ranges`` (per-column (min, max) — at rewrite time these come
    FREE from manifest column stats), each column min-max-normalizes
    onto the full ``bits`` grid first, which is what production
    z-ordering does with value histograms. ``bits × len(cols)`` must
    fit in 63 bits.
    """
    if not cols:
        raise ValueError("zorder_value needs at least one column")
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"{bits} bits × {n} cols exceeds a long")
    mask = (1 << bits) - 1
    raw = [F.col(c) if isinstance(c, str) else c for c in cols]
    if ranges is not None:
        if len(ranges) != n:
            raise ValueError("ranges must align with cols")
        masked = []
        for col, (lo, hi) in zip(raw, ranges):
            span = float(hi) - float(lo)
            if span <= 0:
                masked.append(F.lit(0).cast("long"))
            else:
                scaled = F.floor(
                    (col.cast("double") - F.lit(float(lo)))
                    / F.lit(span)
                    * F.lit(float(mask))
                ).cast("long")
                masked.append(
                    F.greatest(
                        F.lit(0).cast("long"),
                        F.least(F.lit(mask).cast("long"), scaled),
                    )
                )
    else:
        masked = [c.cast("long").bitwiseAND(F.lit(mask)) for c in raw]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, m in enumerate(masked):
            bit = F.shiftright(m, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z
