"""Stateful streaming EWMA baseline (applyInPandasWithState).

The streaming twin of ``operators.rolling.ewma_baseline`` — with the
state-shape change streaming makes natural: instead of carrying the
last N raw values (the batch operator's bounded ROWS frame), each
series carries ONE number, the running recursive average
``ewma_t = alpha * v_t + (1 - alpha) * ewma_{t-1}`` — the classic
infinite-memory form. The first point seeds the average and emits no
residual. For a trailing window of W >> 1/alpha the two forms converge;
the recursive form is what a monitor actually wants on a stream
(O(1) state, no window buffer).

Module conventions match streaming/rate.py / streaming/transitions.py:
rows are processed in (event-time, seq) order WITHIN each micro-batch;
stragglers older than the stored last timestamp are dropped
(forward-only; batch replay is the authority for corrections). Exact
recursive parity with a single-process reference fold is pinned by
test (sequential float ops in arrival order — no parallel reordering,
because the state walk is inherently serial per series).
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

_STATE = StructType(
    [
        StructField("us", LongType()),
        StructField("seq", LongType()),
        StructField("ewma", DoubleType()),
    ]
)
_OUT = StructType(
    [
        StructField("series", StringType()),
        StructField("us", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("resid", DoubleType()),
    ]
)


def _make_fn(alpha: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (series,) = key
        st = state.get if state.exists else None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out_us, out_v, out_e, out_r = [], [], [], []
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["us", "seq"])
            for us, seq, v in zip(pdf["us"], pdf["seq"], pdf["value"]):
                us, seq, v = int(us), int(seq), float(v)
                if st is not None and (us, seq) <= (int(st[0]), int(st[1])):
                    # forward-only, INCLUSIVE: a cross-batch replay of the
                    # exact stored (us, seq) must be dropped, not re-applied
                    # (it would double-update the EWMA and emit a duplicate
                    # residual row)
                    continue
                if st is None:
                    st = (us, seq, v)  # seed, no residual emitted
                    continue
                prev = float(st[2])
                ew = alpha * v + (1.0 - alpha) * prev
                st = (us, seq, ew)
                out_us.append(us)
                out_v.append(v)
                out_e.append(prev)  # baseline EXCLUDES the current point
                out_r.append(v - prev)
            state.update(tuple(st))
        if out_us:
            yield pd.DataFrame(
                {
                    "series": [series] * len(out_us),
                    "us": out_us,
                    "value": out_v,
                    "ewma": out_e,
                    "resid": out_r,
                }
            )

    return fn


def streaming_ewma(
    points: DataFrame,
    alpha: float = 0.5,
    series_col: str = "series",
    ts_col: str = "us",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """points stream (``ts_col`` = epoch µs long) → one row per point
    after its series' first, carrying the PRIOR recursive EWMA as the
    baseline and the residual against it. O(1) state per series."""
    prepped = points.select(
        F.col(series_col).cast("string").alias("series"),
        F.col(ts_col).alias("us"),
        F.col(seq_col).alias("seq"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepped.groupBy("series").applyInPandasWithState(
        _make_fn(float(alpha)), _OUT, _STATE, "update", GroupStateTimeout.NoTimeout
    )
