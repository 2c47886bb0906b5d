"""Stateful streaming liveness + flatline monitor — the LIVE twin of
q197 (gap_report) and q196 (flatline_runs).

A batch gap report tells you yesterday's silences; the on-call question
is "which metric went quiet / froze JUST NOW". Per series this keeps
O(1) state — (last event-time, last seq, last value in micro-units,
whether that value was finite, current identical-value run length,
longest run seen) — and emits one row per point carrying:

- ``gap_ms``: distance to the PREVIOUS point of the same series (NULL
  for the first point) — the live inter-arrival reading whose batch
  distribution is q195; a downstream alert on ``gap_ms >
  k × native_interval`` is the reference's dead-man-switch pattern.
- ``run_len`` / ``flatline``: length of the current exactly-identical
  value run on the 1e-6 grid, and the alarm flag once it reaches
  ``min_run`` — q196's stuck-sensor signal, evaluated causally (the
  batch operator needs the whole day; this fires on the Nth frozen
  point as it arrives).

Module conventions match streaming/cusum.py: rows process in
(event-time, seq) order within each micro-batch; a replayed row at or
before the stored (us, seq) is dropped (forward-only, INCLUSIVE — the
double-apply guard). Parity with the sequential reference fold and
with the batch operators is pinned by test.

Scale shape: one series-hash exchange into the state store, constant
state per key — the applyInPandasWithState placement of the other
streaming twins (70k+ rows/s single-host, SCALE.md).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# STATE SCHEMA VERSION NOTE: v2 (adds `v_finite` between `v_micro` and
# `run_len`, replacing the NaN-sentinel encoding). Spark's state-store
# schema compatibility check REJECTS a restart of this query from a v1
# (pre-`v_finite`) checkpoint — on upgrade, discard the old checkpoint
# directory and let the monitor rebuild state from the replayed source;
# there is no in-place state migration for applyInPandasWithState.
# Callers that derive checkpointLocation via liveness_checkpoint_dir()
# get this for free: a version bump lands in a fresh directory, so the
# old checkpoint is orphaned instead of crashed into.
LIVENESS_STATE_VERSION = 2


def liveness_checkpoint_dir(base: str) -> str:
    """checkpointLocation for a streaming_liveness query, scoped to the
    current LIVENESS_STATE schema version. applyInPandasWithState has no
    in-place state migration, and restarting on an old checkpoint after
    a schema change fails deep inside the state store; versioning the
    directory turns that failure mode into a clean cold start."""
    import os

    return os.path.join(base, f"liveness-state-v{LIVENESS_STATE_VERSION}")
LIVENESS_STATE = StructType(
    [
        StructField("us", LongType()),
        StructField("seq", LongType()),
        StructField("v_micro", LongType()),
        StructField("v_finite", BooleanType()),
        StructField("run_len", LongType()),
        StructField("longest_run", LongType()),
    ]
)

LIVENESS_OUT = StructType(
    [
        StructField("series", StringType()),
        StructField("us", LongType()),
        StructField("value", DoubleType()),
        StructField("gap_ms", LongType()),
        StructField("run_len", LongType()),
        StructField("longest_run", LongType()),
        StructField("flatline", BooleanType()),
    ]
)


def _make_fn(min_run: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (series,) = key
        if state.exists:
            last_us, last_seq, v_micro, v_finite, run_len, longest = state.get
            last_us, last_seq = int(last_us), int(last_seq)
            v_micro, v_finite = int(v_micro), bool(v_finite)
            run_len, longest = int(run_len), int(longest)
        else:
            last_us = last_seq = v_micro = None
            v_finite = False
            run_len = longest = 0
        out: list[tuple] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["us", "seq"])
            import math

            for us, seq, v in zip(pdf["us"], pdf["seq"], pdf["value"]):
                us, seq, v = int(us), int(seq), float(v)
                if last_us is not None and (us, seq) <= (last_us, last_seq):
                    continue  # forward-only, inclusive (replay guard)
                gap_ms = None if last_us is None else (us - last_us) // 1000
                # a NULL/NaN/Inf value still proves LIVENESS (the gap
                # resets) but carries no value identity: it never
                # extends a run and never starts one another value can
                # extend — and it must not poison the query (int(NaN)
                # raises, the task dies, and the checkpoint replays the
                # poison record forever). Finiteness is a SEPARATE state
                # flag (v_finite), not a sentinel inside the micro-value
                # domain: every finite double round-trips, including the
                # values near -9.22e12 whose micro form equals i64 min.
                finite = math.isfinite(v)
                vm = int(math.floor(v * 1_000_000.0 + 0.5)) if finite else 0
                run_len = (
                    run_len + 1
                    if (finite and v_finite and vm == v_micro)
                    else 1
                )
                longest = max(longest, run_len)
                last_us, last_seq = us, seq
                v_micro, v_finite = vm, finite
                out.append(
                    (
                        series,
                        us,
                        v,
                        gap_ms,
                        run_len,
                        longest,
                        run_len >= min_run,
                    )
                )
            state.update(
                (last_us, last_seq, v_micro, v_finite, run_len, longest)
            )
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "series",
                    "us",
                    "value",
                    "gap_ms",
                    "run_len",
                    "longest_run",
                    "flatline",
                ],
            )

    return fn


def streaming_liveness(
    points: DataFrame,
    min_run: int = 10,
    series_col: str = "series",
    ts_col: str = "us",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """points stream (``ts_col`` = epoch µs long) → one row per point
    with the live gap to the previous point, the current identical-value
    run length, the longest run seen, and the ``flatline`` alarm flag
    (run_len ≥ ``min_run``)."""
    prepped = points.select(
        F.col(series_col).cast("string").alias("series"),
        F.col(ts_col).alias("us"),
        F.col(seq_col).alias("seq"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepped.groupBy("series").applyInPandasWithState(
        _make_fn(int(min_run)),
        LIVENESS_OUT,
        LIVENESS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def streaming_presence(
    dps: DataFrame,
    bucket_ms: int = 60_000,
    watermark: str = "10 minutes",
    series_col: str = "metric",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked per-(series, bucket) presence counts — the REVISING
    complement to ``streaming_liveness``: the stateful monitor above is
    causal and forward-only (a replayed or late (us, seq) is dropped —
    alarms must never un-fire), so a late point that lands INSIDE an
    already-reported gap cannot update it there. This stream gives late
    data its batch semantics (SURVEY §1.3: a point belongs to its
    TIMESTAMP's bucket, not its arrival's): a point arriving within the
    watermark lands in its event-time bucket, the bucket becomes
    present, and the next ``gap_report_reads`` over the live state
    shows the gap SPLIT — bit-identical to the batch q197 answer.

    State is |series| × |buckets in watermark horizon| rows (the
    streaming_histogram bound), evicted by the watermark; ``ts_col`` is
    epoch ms. Output: (series, b, n) in update mode.
    """
    with_ts = dps.withColumn(
        "event_time", F.timestamp_millis(F.col(ts_col))
    ).withWatermark("event_time", watermark)
    return (
        with_ts.groupBy(
            F.col(series_col).cast("string").alias("series"),
            F.window("event_time", f"{int(bucket_ms)} milliseconds").alias(
                "w"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "series",
            F.unix_millis(F.col("w.start")).alias("b"),
            "n",
        )
    )


def gap_report_reads(presence: DataFrame, bucket_ms: int = 60_000) -> DataFrame:
    """Gap report over the live presence state — reuses the EXACT batch
    arithmetic (operators/summary.gap_report_over_buckets), so the live
    read can never drift from the q197 oracle-pinned spec. Output:
    (series, n_expected, n_present, n_missing, longest_gap_ms)."""
    from ticktock_spark.operators.summary import gap_report_over_buckets

    return gap_report_over_buckets(
        presence.select("series", "b").distinct(),
        ["series"],
        bucket_ms=bucket_ms,
    )
