"""Z-order (Morton) clustering keys: multi-dimensional data layout.

Lakehouse engines (Delta OPTIMIZE ZORDER, Iceberg sort orders) cluster
files by a bit-interleaved key over several columns so parquet
row-group min/max stats prune on EVERY interleaved dimension, not just
the leading sort column. The reference TSDB clusters on one dimension
(series, via compaction — `src/core/tsdb.cpp:3431-3658`); this is the
beyond-reference multi-dimensional generalization for the
documents/embeddings side of the house.

The key is pure integer bit math (the classic "spread bits" masks), so
it is engine-exact and SQL-oracle-checkable; normalization to 16 bits
is linear min/max scaling (two driver-collected numbers per dimension,
the corpus_stats pattern) or any caller-provided 0..65535 integer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    """Spread a 16-bit int's bits into the even positions of 32 bits."""
    x = c.cast("long")
    for shift, mask in _MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(dim_a: Column, dim_b: Column) -> Column:
    """Interleave two 0..65535 integer dimensions into one 32-bit
    Morton key (dim_a gets the even bit positions). Sorting/writing by
    this key gives locality in BOTH dimensions at once."""
    return _spread16(dim_a).bitwiseOR(F.shiftleft(_spread16(dim_b), 1))


def zorder_key_n(dims: list[Column], bits: int | None = None) -> Column:
    """N-dimensional Morton key: interleave ``len(dims)`` integer
    dimensions (each already scaled to ``bits`` bits; ``dims[0]`` gets
    the lowest bit position). The default width is the largest that
    keeps the key inside a POSITIVE signed 64-bit long — 16 bits
    through 3 dims, 15 at 4 dims — so range-partitioning and parquet
    min/max stats order the key correctly.

    Built from explicit per-bit shift/OR expressions (b·n integer ops
    per row, JVM-side, engine-exact and SQL-oracle-expressible); for
    n=2, bits=16 it equals ``zorder_key`` bit-for-bit (pinned by test —
    that path keeps the cheaper mask-spread form)."""
    n = len(dims)
    if n < 1:
        raise ValueError("zorder_key_n needs at least one dimension")
    if bits is None:
        bits = min(16, 62 // n)
    key = F.lit(0).cast("long")
    for d, c in enumerate(dims):
        x = c.cast("long")
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(x, i).bitwiseAND(F.lit(1)), i * n + d
                )
            )
    return key


def scale_to_bits(c: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Linear min/max scaling of a numeric column to 0..2**bits-1
    (lo/hi are two driver-side numbers, e.g. from df.agg(min, max))."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi - lo)
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(float(top))
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit(top)
    )


def scale_to_16bit(c: Column, lo: float, hi: float) -> Column:
    """Linear min/max scaling of a numeric column to 0..65535 (lo/hi
    are two driver-side numbers, e.g. from df.agg(min, max))."""
    return scale_to_bits(c, lo, hi, 16)


def write_zordered(
    df: DataFrame, path: str, key: Column, partitions: int = 8
) -> None:
    """Materialize the layout: range-repartition by the Morton key and
    sort within partitions before writing, so every output file covers
    a compact Z-curve segment and row-group min/max stats prune on both
    interleaved dimensions."""
    (
        df.withColumn("__zk", key)
        .repartitionByRange(partitions, "__zk")
        .sortWithinPartitions("__zk")
        .drop("__zk")
        .write.mode("overwrite")
        .parquet(path)
    )
