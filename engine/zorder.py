"""Morton (Z-order) clustering key — multi-dimensional row-group skipping
for compaction rewrites (Iceberg's rewrite_data_files ZORDER strategy).

A linear sort by (conv_id, bucket_start) gives perfect footer-level skipping
for conv point lookups but none for time-range scans that cross
conversations: every row group spans the full time range. Z-ordering
interleaves the bits of BOTH dimensions' rank positions, so row groups
become rectangles in (conv, time) space — min/max stats prune on either
dimension (less sharply than a dedicated sort on that one dimension, which
is the standard z-order trade).

Mechanics (all JVM-side column expressions — no Python in the rewrite):
1. each dimension is rank-normalized to 16 bits: distinct values ->
   percent_rank -> floor(pr * 65535). Rank normalization is what makes
   z-locality mean VALUE-locality for arbitrary types (string conv_ids,
   timestamps) — raw-byte interleaving would cluster on hash-like prefixes.
   The rank table is dimension-sized and broadcast back. At 100 TB the
   exact rank becomes an approxQuantile boundary table (the z-value only
   needs a MONOTONE binning, not an exact rank), sampled like a range
   partitioner — same join shape, O(4096) boundaries instead of O(distinct).
2. the two 16-bit ranks are Morton-spread with the classic mask ladder
   (x |= x<<8 & 0x00FF00FF ... x<<1 & 0x55555555) and interleaved into one
   32-bit key; sortWithinPartitions on it clusters the file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SPREAD = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def _spread16(c: F.Column) -> F.Column:
    """Spread a 16-bit int's bits to the even positions of a 32-bit int."""
    # Column `|`/`&` are LOGICAL operators in PySpark — bitwise needs the
    # explicit methods.
    for sh, mask in _SPREAD:
        c = c.bitwiseOR(F.shiftleft(c, sh)).bitwiseAND(F.lit(mask))
    return c


def _rank16(df: DataFrame, col: str) -> DataFrame:
    """(value, 16-bit rank) table for one dimension. The global window is
    dimension-sized (distinct values), not data-sized — acceptable for a
    compaction job; see module docstring for the 100-TB variant."""
    w = Window.orderBy(col)
    return (
        df.select(col)
        .distinct()
        .select(
            col,
            F.floor(F.percent_rank().over(w) * 65535)
            .cast("long")
            .alias(f"__zr_{col}"),
        )
    )


def with_zorder_key(df: DataFrame, cols: tuple[str, str]) -> DataFrame:
    """Add a `__z` Morton key over two columns (rank-normalized, bit
    interleaved). Rows and all original columns are preserved."""
    c1, c2 = cols
    orig = df.columns
    out = (
        df.join(F.broadcast(_rank16(df, c1)), c1)
        .join(F.broadcast(_rank16(df, c2)), c2)
    )
    z = _spread16(F.col(f"__zr_{c1}")).bitwiseOR(
        F.shiftleft(_spread16(F.col(f"__zr_{c2}")), 1)
    )
    return out.select(*orig, z.alias("__z"))
