"""Streaming sessionization: the Structured-Streaming twin of
pipeline/sessions.py.

Uses the built-in ``F.session_window`` (dynamic-gap session windows in
the state store) + a watermark for late data, instead of the batch
lag/running-sum formulation — the idiomatic Spark mapping: state is
per-(user, open-session), merged as events arrive, emitted when the
watermark passes the session's close (gap after the last event).

State size is O(open sessions), bounded by user cardinality × the gap,
not stream length. The shuffle key is the grouping key (user), the same
partitioning downstream per-user aggregations reuse.

Semantics vs the batch operator: identical event-to-session assignment
(same gap rule); the streaming output keys sessions by their
(session_start, session_end) window rather than a per-user ordinal —
an ordinal would require total per-user history, which is exactly what
a watermarked stream discards. The batch operator remains the authority
for retroactive recomputation (the repo-wide raw-replay philosophy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_session_stats(
    events: DataFrame,
    gap_ms: int = 1_800_000,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """events stream (ts must be a timestamp column) → per-session stats.

    Output: user, session start/end (epoch µs), n_events, sum_value
    (decimal-exact accumulation, cast back to double). Append-mode
    emission once the watermark closes the session.
    """
    gap = f"{gap_ms} milliseconds"
    win = F.session_window(F.col(ts_col), gap)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            user_col,
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("end_us"),
            "n_events",
            "sum_value",
        )
    )
