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


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "us",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: for each user who performed
    ``stages[0]``, the earliest time of each subsequent stage STRICTLY
    AFTER the previous stage's time (the classic signup → view → click →
    purchase analysis). Users missing a stage get NULL there and for all
    later stages; ``stage`` is the deepest stage index reached (1-based).

    Scale shape: ONE scan and ONE shuffle regardless of stage count —
    per user, each stage's event times aggregate into a sorted array
    (one row per user, arrays bounded by that user's event count), then
    the strictly-after chain resolves as successive array_min-over-
    filter expressions on those attributes. (The natural per-stage
    join-accumulator shape re-executes the growing accumulated plan at
    every stage: measured 13 parquet scans for this 4-stage funnel.)
    For bot-grade users whose per-stage arrays are themselves the
    hazard, the streaming twin (`streaming.funnel.streaming_funnel`)
    computes the same chain with O(stages) state per user and is
    parity-tested against this operator on in-order streams.
    """
    t0 = F.col(ts_col)
    out = (
        events.filter(F.col(type_col).isin(stages))
        .groupBy(user_col)
        .agg(
            *[
                F.collect_list(F.when(F.col(type_col) == s, t0)).alias(f"a_{s}")
                for s in stages
            ]
        )
        .filter(F.size(f"a_{stages[0]}") > 0)
    )
    out = out.withColumn(f"t_{stages[0]}", F.array_min(f"a_{stages[0]}"))
    prev = f"t_{stages[0]}"
    for s in stages[1:]:
        # prev is a projected attribute, so the lambda reference is a
        # cheap row-value read, not a re-evaluated subtree; array_min of
        # the empty filter result is NULL (stage not reached)
        after = F.filter(F.col(f"a_{s}"), lambda x: x > F.col(prev))
        out = out.withColumn(f"t_{s}", F.array_min(after))
        prev = f"t_{s}"
    out = out.drop(*[f"a_{s}" for s in stages])
    stage = None
    for i, s in enumerate(reversed(stages)):
        cond = F.col(f"t_{s}").isNotNull()
        lvl = F.lit(len(stages) - i)
        stage = F.when(cond, lvl) if stage is None else stage.when(cond, lvl)
    return out.withColumn("stage", stage.otherwise(F.lit(0)).cast("int"))


def cohort_retention(
    events: DataFrame,
    period_us: int = 7 * 86_400 * 1_000_000,
    user_col: str = "user_id",
    ts_col: str = "us",
) -> DataFrame:
    """Cohort retention: users grouped by first-activity date, counted
    once per (cohort, period offset) they were active in. Offsets are
    integer µs arithmetic (floor((t - first)/period)) — engine-exact.

    Scale shape: first-activity agg (one shuffle on user), broadcast-or-
    shuffle join back, then distinct + count keyed on (cohort, offset,
    user) — the distinct carries one row per user-period, far smaller
    than the event stream.
    """
    t = F.col(ts_col)
    first = events.groupBy(user_col).agg(F.min(t).alias("__first_us"))
    joined = events.select(user_col, t.alias("__us")).join(first, user_col)
    per = joined.select(
        user_col,
        F.date_format(F.timestamp_micros(F.col("__first_us")), "yyyy-MM-dd").alias(
            "cohort_date"
        ),
        F.floor((F.col("__us") - F.col("__first_us")) / F.lit(period_us))
        .cast("int")
        .alias("week_offset"),
    ).distinct()
    return per.groupBy("cohort_date", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order event-transition matrix: for each ordered pair of
    event types, how often one immediately follows the other within a
    user's stream, and the conditional probability p(next | current) —
    the Markov-chain view behind funnel discovery ("what do users do
    after X"), anomalous-flow detection, and synthetic-session
    generators. Ordering is (ts, id) per user, the q46 tiebreak.

    Output: (event_type, next_type, n, p) with n an exact count and p a
    single division of exact counts (engine-identical).

    Scale shape: one scan; the lead() window shuffles once on user_id
    (bounded per-user partitions), the pair aggregation map-side
    combines into |types|^2 rows, and the denominator comes from an
    unordered window over the current type — no self-joins.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        df.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(id_col),
            F.col(type_col).alias("event_type"),
        )
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy("event_type"))
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / total.cast("double")).alias("p"),
    )


def session_transitions(
    df: DataFrame,
    gap_ms: int = 1_800_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Event-transition matrix WITHIN sessions: like event_transitions,
    but a pair only counts when both events fall in the same
    gap-bounded session — cross-session "transitions" (last click
    tonight → first view next week) are noise for funnel discovery, and
    this is the variant an analyst usually means.

    Scale shape: sessionize's window and the lead() share the SAME
    (user, time) partitioning and ordering, so Catalyst runs both in
    one exchange + one sort; the pair aggregation is |types|^2-bounded
    as in event_transitions.
    """
    s = sessionize(df, gap_ms=gap_ms, user_col=user_col, ts_col=ts_col, id_col=id_col)
    w = Window.partitionBy(user_col).orderBy("__us", F.col(id_col))
    pairs = (
        s.select(
            F.col(user_col),
            F.col("__us"),
            F.col(id_col),
            F.col("session_idx"),
            F.col(type_col).alias("event_type"),
        )
        .withColumn("next_type", F.lead("event_type").over(w))
        .withColumn("next_sess", F.lead("session_idx").over(w))
        .filter(
            F.col("next_type").isNotNull()
            & (F.col("next_sess") == F.col("session_idx"))
        )
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy("event_type"))
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / total.cast("double")).alias("p"),
    )


def cohort_funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "us",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion BY COHORT: users grouped by the ISO week of
    their stage-0 event, each cohort reporting how many reached every
    funnel depth — the growth-analytics view ("is this week's signup
    class converting better than last week's?") that joins the cohort
    and funnel primitives this module already pins separately.

    Week = epoch-µs integer division by a 7-day span (epoch-aligned
    like every bucket in this engine — no calendar/tz logic), so the
    cohort key is exact integer math. Output: (cohort_week, n_users,
    n_stage1..n_stageK) with exact counts; conversion ratios are one
    division away and deliberately left to the caller (they'd be
    rationals of these exact integers).

    Scale shape: funnel_stages' one scan + one user shuffle, then a
    cohort-bounded aggregation over one row per user.
    """
    WEEK_US = 7 * 24 * 3600 * 1_000_000
    f = funnel_stages(
        events, stages, user_col=user_col, ts_col=ts_col, type_col=type_col
    )
    agg = [F.count(F.lit(1)).alias("n_users")] + [
        F.sum((F.col("stage") >= i + 1).cast("long")).alias(f"n_{s}")
        for i, s in enumerate(stages)
    ]
    return (
        f.withColumn("cohort_week", F.expr(f"t_{stages[0]} div {WEEK_US}"))
        .groupBy("cohort_week")
        .agg(*agg)
    )
