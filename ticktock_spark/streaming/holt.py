"""Stateful streaming Holt-linear (double exponential) forecaster.

Extends `streaming/ewma.py`'s recursive level baseline with a TREND
component — the standard Holt recursion:

    forecast_t = level + trend                (emitted BEFORE updating)
    level_t    = α·v_t + (1−α)·(level + trend)
    trend_t    = β·(level_t − level) + (1−β)·trend

A plain EWMA lags a steadily-ramping metric by a constant offset (its
residual never converges); Holt's trend term absorbs the ramp, so the
residual is the right alert signal for metrics with drift (queue
depth, disk usage — exactly the q175 trend-fit cases, live).

Seeding: the first point sets level = v, trend = 0 and emits nothing
(matching streaming_ewma's silent seed). Conventions are the module
standard: (event-time, seq) order within a batch, inclusive
forward-only replay guard, O(1) state per series
(us, seq, level, trend). Exact parity with a sequential reference
fold is pinned by test.
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

HOLT_STATE = StructType(
    [
        StructField("us", LongType()),
        StructField("seq", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
    ]
)

HOLT_OUT = StructType(
    [
        StructField("series", StringType()),
        StructField("us", LongType()),
        StructField("value", DoubleType()),
        StructField("forecast", DoubleType()),
        StructField("resid", DoubleType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
    ]
)


def _make_fn(alpha: float, beta: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (series,) = key
        if state.exists:
            last_us, last_seq, level, trend = state.get
            last_us, last_seq = int(last_us), int(last_seq)
            level, trend = float(level), float(trend)
            seeded = True
        else:
            last_us = last_seq = None
            level = trend = 0.0
            seeded = False
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
                if not seeded:
                    level, trend, seeded = v, 0.0, True
                    continue
                forecast = level + trend
                new_level = alpha * v + (1.0 - alpha) * forecast
                trend = beta * (new_level - level) + (1.0 - beta) * trend
                level = new_level
                out.append((series, us, v, forecast, v - forecast, level, trend))
            state.update((last_us, last_seq, level, trend))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "series", "us", "value", "forecast", "resid",
                    "level", "trend",
                ],
            )

    return fn


def streaming_holt(
    points: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.25,
    series_col: str = "series",
    ts_col: str = "us",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """points stream (``ts_col`` = epoch µs long) → one row per point
    after its series' seed, carrying the PRIOR (level + trend) forecast
    and the residual against it."""
    prepped = points.select(
        F.col(series_col).cast("string").alias("series"),
        F.col(ts_col).alias("us"),
        F.col(seq_col).alias("seq"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepped.groupBy("series").applyInPandasWithState(
        _make_fn(float(alpha), float(beta)),
        HOLT_OUT,
        HOLT_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )
