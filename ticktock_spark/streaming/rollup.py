"""Streaming hourly rollup maintenance.

Replaces the reference's ingest-time RollupManager accumulators + rollup
WAL (`src/agg/rollup.cpp:110-286`): a watermarked streaming aggregation
over 1-hour event-time windows maintains per-series (cnt,min,max,sum).
Late data within the watermark updates the open bucket (strictly better
than the reference, which marks the hour invalid and falls back to raw —
`rollup.cpp:237-243`); later-than-watermark data is handled by the
query-time raw fallback exactly like the reference's
ROLLUP_FALLBACK_RAW.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ticktock_spark.plans.planner import canonical_series_key


def streaming_rollup_1h(dps: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """datapoints stream → streaming (metric, series, hour) rollup rows."""
    with_ts = dps.withColumns(
        {
            "event_time": F.timestamp_millis(F.col("ts")),
            "__series": canonical_series_key(F.col("tags")),
        }
    ).withWatermark("event_time", watermark)
    win = F.window("event_time", "1 hour")
    return (
        with_ts.groupBy("metric", "__series", win.alias("w"))
        .agg(
            F.count("value").alias("cnt"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.sum("value").alias("sum"),
            F.first("tags").alias("tags"),
        )
        .select(
            "metric",
            "__series",
            "tags",
            F.unix_millis(F.col("w.start")).alias("bucket_ts"),
            "cnt",
            "min",
            "max",
            "sum",
        )
    )
