"""Stateful streaming CUSUM level-shift detector (applyInPandasWithState).

The CAUSAL streaming counterpart of `operators/rolling.py
mean_shift_score` (q171): the batch operator contrasts the windows
before/after each point (needs the future), a live detector cannot —
the standard online form is the two-sided CUSUM recursion

    S⁺_t = max(0, S⁺_{t-1} + (v_t − target − slack))
    S⁻_t = max(0, S⁻_{t-1} + (target − v_t − slack))

with an alarm when either side exceeds ``threshold`` (then that side
resets — the classic Page test). ``target`` is the expected level
(per-series, from history — e.g. the seasonal profile's mean or a
trailing baseline snapshot); ``slack`` absorbs in-control noise.

Module conventions match streaming/ewma.py: rows process in
(event-time, seq) order within each micro-batch; a replayed row at or
before the stored (us, seq) is dropped (forward-only, INCLUSIVE — the
double-apply guard). State per series is O(1): (us, seq, S⁺, S⁻).
Exact parity with a sequential reference fold is pinned by test.

Scale shape: one series-hash exchange into the state store, constant
state per key — the applyInPandasWithState placement that sustains the
measured 70k+ rows/s single-host (SCALE.md streaming anomaly row).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CUSUM_STATE = StructType(
    [
        StructField("us", LongType()),
        StructField("seq", LongType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
    ]
)

CUSUM_OUT = StructType(
    [
        StructField("series", StringType()),
        StructField("us", LongType()),
        StructField("value", DoubleType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("alarm", StringType()),
    ]
)


def _make_fn(target: float, slack: float, threshold: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (series,) = key
        if state.exists:
            last_us, last_seq, s_pos, s_neg = state.get
            last_us, last_seq = int(last_us), int(last_seq)
            s_pos, s_neg = float(s_pos), float(s_neg)
        else:
            last_us = last_seq = None
            s_pos = s_neg = 0.0
        out: list[tuple] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["us", "seq"])
            for us, seq, v in zip(pdf["us"], pdf["seq"], pdf["value"]):
                us, seq, v = int(us), int(seq), float(v)
                if last_us is not None and (us, seq) <= (last_us, last_seq):
                    continue  # forward-only, inclusive (replay guard)
                last_us, last_seq = us, seq
                s_pos = max(0.0, s_pos + (v - target - slack))
                s_neg = max(0.0, s_neg + (target - v - slack))
                alarm = None
                if s_pos > threshold:
                    alarm, s_pos = "up", 0.0
                elif s_neg > threshold:
                    alarm, s_neg = "down", 0.0
                out.append((series, us, v, s_pos, s_neg, alarm))
            state.update((last_us, last_seq, s_pos, s_neg))
        if out:
            yield pd.DataFrame(
                out,
                columns=["series", "us", "value", "s_pos", "s_neg", "alarm"],
            )

    return fn


def streaming_cusum(
    points: DataFrame,
    target: float,
    slack: float = 0.0,
    threshold: float = 5.0,
    series_col: str = "series",
    ts_col: str = "us",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """points stream (``ts_col`` = epoch µs long) → one row per point
    with both CUSUM sides and the alarm label ('up'/'down'/NULL)."""
    prepped = points.select(
        F.col(series_col).cast("string").alias("series"),
        F.col(ts_col).alias("us"),
        F.col(seq_col).alias("seq"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepped.groupBy("series").applyInPandasWithState(
        _make_fn(float(target), float(slack), float(threshold)),
        CUSUM_OUT,
        CUSUM_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )
