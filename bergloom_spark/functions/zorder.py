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


def zorder_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of each column into one long.

    Inputs must be non-negative integers; values are masked to ``bits``
    (callers with wider/skewed domains should rank- or bucket-normalize
    upstream — what production z-ordering does with value histograms).
    ``bits × len(cols)`` must fit in 63 bits.
    """
    if not cols:
        raise ValueError("zorder_value needs at least one column")
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"{bits} bits × {n} cols exceeds a long")
    mask = (1 << bits) - 1
    masked = [
        (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(F.lit(mask))
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, m in enumerate(masked):
            bit = F.shiftright(m, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z
