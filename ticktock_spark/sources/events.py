"""Map the driver's `events` table onto the canonical datapoints schema.

events(event_id, ts timestamp, user_id, event_type, value, props) becomes
(metric=event_type, ts=epoch-ms, value, tags={user:user_id}, seq=event_id,
dt=day) — each (event_type, user_id) pair is one time series, exactly the
reference's (metric, tag-set) identity (`include/ts.h:42-101`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def events_to_datapoints(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("event_type").alias("metric"),
        F.unix_millis("ts").alias("ts"),
        F.col("value").cast("double").alias("value"),
        F.create_map(F.lit("user"), F.col("user_id").cast("string")).alias("tags"),
        F.col("event_id").cast("long").alias("seq"),
        F.to_date("ts").alias("dt"),
    )
