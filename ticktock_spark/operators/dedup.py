"""Duplicate-timestamp resolution: last write wins.

Reference: at query time pages are k-way merged by timestamp and duplicate
timestamps keep the LAST value in merge order (out-of-order pages / later
pages win — `src/core/query.cpp:722-803`, ties 732-739, last-wins 771-787;
pinned by `test/int_test3.py:1608-1652`). We carry an ingest sequence
number `seq` and resolve duplicates with ``max_by(value, seq)``.

This is a plain hash aggregation on (series, ts) — partial aggregation
makes it map-side cheap, and at 100 TB it rides the same shuffle as the
downsample that always follows (Catalyst collapses adjacent aggregations
on compatible keys into one exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_last_wins(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    keep = [c for c in df.columns if c not in (*series_cols, ts_col, value_col, seq_col)]
    aggs = [F.max_by(value_col, seq_col).alias(value_col), F.max(seq_col).alias(seq_col)]
    aggs += [F.max_by(c, seq_col).alias(c) for c in keep]
    return df.groupBy(*series_cols, ts_col).agg(*aggs)
