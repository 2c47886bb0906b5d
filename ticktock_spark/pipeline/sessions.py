"""Gap-based sessionization over event streams (batch form).

Splits each user's event sequence into sessions wherever the gap between
consecutive events exceeds ``gap_ms``, then aggregates per-session stats.
The classic web/telemetry preprocessing step before behavioral features.

Scale shape: ONE shuffle, keyed by user_id — the lag() window, the
running-sum session index, and the per-session aggregation all share that
partitioning, so Catalyst plans a single Exchange and the window sort is
reused by the groupBy (partial agg happens within already-sorted runs).
Per-user data must fit a task's sort spill budget, which holds for any
realistic per-user event count; there is no per-user collect.

Skew note: a bot user with 10^8 events lands in one task's sort — at that
point pre-split such users by (user_id, ts-day) first; the session index
is then only day-local, which is usually acceptable for bot traffic.

The streaming twin of this operator is
``F.session_window(ts, gap)`` in streaming/; this batch form matches the
reference's replay-from-raw philosophy (recompute from the raw table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    gap_ms: int = 1_800_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Attach ``session_idx`` (1-based per user, in time order) to events.

    Ordering is (ts, event_id) so ties are deterministic. ts may be a
    timestamp or epoch-ms long; comparisons run on epoch microseconds.
    """
    us = (
        F.unix_micros(F.col(ts_col))
        if dict(events.dtypes)[ts_col].startswith("timestamp")
        else F.col(ts_col).cast("long") * 1000
    )
    w = Window.partitionBy(user_col).orderBy(us, F.col(id_col))
    new_sess = F.when(
        (us - F.lag(us).over(w)) > F.lit(gap_ms * 1000), F.lit(1)
    ).otherwise(F.lit(0))
    # first event of a user: lag is NULL -> new_sess 0; start index at 1
    return events.withColumn("__us", us).withColumn(
        "session_idx",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        + 1,
    )


def session_stats(
    events: DataFrame,
    gap_ms: int = 1_800_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-session aggregates: event count, span, value sum.

    Output: user_id, session_idx, n_events, start_us, end_us,
    duration_us, sum_value — sorted-friendly scalar columns only.
    sum_value accumulates in DECIMAL(18,2) (exact, fold-order-free) and
    is cast back to double, the repo-wide bit-exactness convention for
    sums over 2-decimal values.
    """
    s = sessionize(events, gap_ms, user_col, ts_col, id_col)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("__us").alias("start_us"),
        F.max("__us").alias("end_us"),
        (F.max("__us") - F.min("__us")).alias("duration_us"),
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )
