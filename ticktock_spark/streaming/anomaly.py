"""Live anomaly-score stream: streaming EWMA × static seasonal profile.

The streaming twin of the q157 batch anomaly ensemble
(`queries.py q157_anomaly_ensemble`): per point,
``score = |v − same-hour-of-day mean| + |v − EWMA baseline|`` —
seasonal-aware AND level-aware alerting, live.

Composition (all existing machinery):
  * the recency baseline comes from ``streaming/ewma.py`` —
    applyInPandasWithState, O(1) state per series, recursive form (the
    batch operator's bounded window converges to it; the difference is
    documented there and in the parity test);
  * the seasonal side is a STATIC broadcast profile — 24 × |series|
    rows of hour-of-day means, computed offline from history (e.g.
    ``api/analytics.seasonal_profile`` / q155's aggregation) and
    refreshed on whatever cadence the caller re-plans the stream. A
    stream-static broadcast hash join adds no shuffle and no state.

Rows whose series lacks a profile row for that hour are DROPPED (inner
join): a series with no history has no seasonal baseline — emitting a
half-score would alert on the wrong scale. Use a left join + coalesce
upstream if partial scores are wanted.

Scale shape: the stateful stage is the measured streaming_ewma
(SCALE.md sustains 400k lines/s ingest on this host); the profile join
is broadcast (model-scale right side), so the added cost per row is one
hash probe + two abs/adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ticktock_spark.streaming.ewma import streaming_ewma

US_PER_HOUR = 3_600_000_000


def streaming_anomaly(
    points: DataFrame,
    profile: DataFrame,
    alpha: float = 0.5,
    series_col: str = "series",
    ts_col: str = "us",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """points stream (``ts_col`` = epoch µs long) → one scored row per
    point after its series' first, for series-hours present in
    ``profile`` (static frame: series, hour_utc, hour_avg).

    Output: (series, us, value, ewma, hour_avg, score) with
    ``ewma`` the PRIOR recursive baseline (current point excluded,
    matching the batch operator) and the q157 score combination."""
    ew = streaming_ewma(
        points,
        alpha=alpha,
        series_col=series_col,
        ts_col=ts_col,
        value_col=value_col,
        seq_col=seq_col,
    )
    hour = (F.expr(f"us div {US_PER_HOUR}") % 24).cast("int")
    prof = F.broadcast(
        profile.select(
            F.col("series").cast("string").alias("series"),
            F.col("hour_utc").cast("int").alias("hour_utc"),
            F.col("hour_avg").cast("double").alias("hour_avg"),
        )
    )
    return (
        ew.withColumn("hour_utc", hour)
        .join(prof, ["series", "hour_utc"])
        .select(
            "series",
            "us",
            "value",
            "ewma",
            "hour_avg",
            (
                F.abs(F.col("value") - F.col("hour_avg"))
                + F.abs(F.col("value") - F.col("ewma"))
            ).alias("score"),
        )
    )
