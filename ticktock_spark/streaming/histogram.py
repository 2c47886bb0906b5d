"""Streaming value histogram + live quantile estimates: the streaming
twin of q174 (fixed-width histogram) feeding q194's
histogram-quantile interpolation.

Why this shape: a histogram is the canonical STREAMABLE distribution
summary — per-(metric, bin) counts are a plain streaming aggregation
(update mode, map-side combinable, state = |metrics| × |bins| rows,
bounded by the value domain / width), and any quantile is then an
O(bins) read over the latest state. That is the live path to "p99
right now" dashboards: the exact R-6 percentile machinery
(operators/percentile.py) needs the values themselves and is the
nightly/batch tool; this keeps a constant-size sketch-free state that
is EXACT for the quantized-bin semantics q174/q194 define.

Parity: per-(metric, bin) counts equal the batch histogram over the
same points (same groupBy — pinned in tests); quantile reads reuse the
exact q194 arithmetic via ``histogram_quantiles`` below, so live and
batch estimates agree bit-for-bit on the same state.

Optional event-time windowing (``window_length``) turns it into a
per-window histogram (watermarked, late data revises its window) —
"p99 per 5-minute window" — at state |windows in horizon| × |bins|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ticktock_spark.operators.summary import (  # noqa: F401 — re-export
    histogram_quantiles,
    value_histogram,
)


def streaming_histogram(
    dps: DataFrame,
    width: float = 10.0,
    window_length: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-(metric, bin) counts over a datapoint stream (update mode).

    Without ``window_length``: all-time bins (metric, bin, n) — the
    q174 aggregation running live. With it: (metric, window_start,
    window_end, bin, n) per event-time window.
    """
    b = F.floor(F.col("value") / F.lit(float(width))).cast("long").alias("bin")
    if window_length is None:
        return value_histogram(dps, ["metric"], width=width)
    with_ts = dps.withColumn(
        "event_time", F.timestamp_millis(F.col("ts"))
    ).withWatermark("event_time", watermark)
    return (
        with_ts.groupBy("metric", F.window("event_time", window_length).alias("w"), b)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "metric",
            F.unix_millis(F.col("w.start")).alias("window_start"),
            F.unix_millis(F.col("w.end")).alias("window_end"),
            "bin",
            "n",
        )
    )
