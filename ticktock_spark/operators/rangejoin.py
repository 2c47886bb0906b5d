"""Point-in-interval range join, bucketed for scale.

Spark compiles a bare ``l.ts BETWEEN r.start AND r.end`` join to a
(broadcast) nested-loop — O(points × intervals) per key and a driver OOM
once the interval side outgrows broadcast. The standard scale shape
instead turns it into an equi-join:

    points:    bucket = floor(ts / bucket_width)
    intervals: EXPLODE one row per bucket the interval overlaps
    equi-join on (key..., bucket), then refine ts BETWEEN start AND end

Cost: the interval side is replicated ceil(len/width)+1 times — pick
``bucket_width`` near the typical interval length so the blow-up is ~2×
— and the join becomes a plain shuffled (or AQE-broadcast) hash join on
(key, bucket) that partitions evenly at any corpus size. A point landing
in the same bucket as an interval it doesn't overlap is discarded by the
refine filter; a pair can never match twice because a point has exactly
one bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    bucket_width: int,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Inner-join each point row to every same-key interval row with
    ``start <= ts <= end`` (inclusive both ends, matching the engine's
    time-range semantics). Output: all point columns + all interval
    columns except the keys; column names must not collide."""
    overlap = set(points.columns) & set(intervals.columns) - set(key_cols)
    if overlap:
        raise ValueError(f"column collision outside keys: {sorted(overlap)}")
    b = F.lit(bucket_width)
    pt = points.withColumn("__b", F.floor(F.col(ts_col) / b))
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(F.floor(F.col(start_col) / b), F.floor(F.col(end_col) / b))
        ),
    )
    return (
        pt.join(iv, [*key_cols, "__b"])
        .filter(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("__b")
    )
