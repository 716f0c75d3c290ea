"""Z-order (Morton) keys for multi-dimensional data layout.

Partition pruning works on ONE column's sort order; queries that
filter on two or more columns (user AND time, region AND date) skip
nothing when files are laid out by either column alone. The lakehouse
answer (Delta OPTIMIZE ZORDER, Hudi/Iceberg clustering) is to sort
files by a space-filling curve: interleave the bits of the filter
columns so rows close in EVERY dimension land in the same files, and
min/max file statistics prune on all of them at once.

``zorder_key`` is the curve itself — pure integer bit arithmetic
(shift/mask/or as a codegen'd expression, no UDF): bit b of column i
lands at position ``b * n_cols + i``. Inputs must already be
non-negative ints < 2^bits; quantize however fits the data (the q60
oracle replays the same arithmetic in SQL, so quantization stays
engine-portable when it's exact integer math).

``layout_by_zorder`` applies it: range-repartition + in-partition
sort by the key, then write — every output file covers a compact
z-range, i.e. a small hyper-rectangle of the filter space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "layout_by_zorder"]


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton interleave of ``cols`` (each an integer in
    [0, 2^bits)): a single long usable for sorting, range
    partitioning, or bucket derivation. With n columns the result
    uses ``bits * n`` bits — keep ``bits * len(cols) <= 62``."""
    n = len(cols)
    if bits * n > 62:
        raise ValueError("bits * n_cols must be <= 62 for a long key")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + i)
    return key


def layout_by_zorder(
    df: DataFrame,
    cols: list[Column | str],
    bits: int = 16,
    n_files: int = 200,
) -> DataFrame:
    """Cluster ``df`` for writing: range-repartition on the z-key
    into ``n_files`` and sort within partitions, so each written file
    spans a compact z-range. Follow with ``.write.parquet(...)``;
    min/max stats on the original columns then prune multi-column
    filters."""
    k = zorder_key(cols, bits=bits).alias("_zkey")
    return (
        df.withColumn("_zkey", k)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
