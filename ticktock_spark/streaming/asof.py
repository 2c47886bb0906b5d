"""Stateful streaming as-of enrichment (applyInPandasWithState).

The streaming twin of operators/asof.py: a left event stream is enriched
with the latest value from a right reference stream at or before each
event — the stream-dimension pattern (attach the newest price / config /
label snapshot to every event). True as-of ("latest PRIOR") is not
expressible as a stream-stream join (those match on a time RANGE and
multi-match); it is exactly a one-row-per-key running state:

state per key = the newest right (ts, value) seen so far — O(#keys),
independent of stream length, checkpointed in the state store.

Ordering, matching the module conventions of streaming/rate.py: rows are
processed in event-time order WITHIN a micro-batch (right rows sort
before left rows at equal ts, so the match is inclusive); across batches
the state only moves forward — a left event older than the retained
right snapshot cannot see superseded snapshots (bounded state) and
emits an unmatched row; the batch operator remains the authority for
late data.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("last_ts", LongType()), StructField("last_value", DoubleType())]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("right_ts", LongType()),
    ]
)


def _make_asof_fn(tolerance: int | None):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        last_ts, last_value = state.get if state.exists else (None, None)
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "side", "seq"])
            for ts, side, seq, rv in zip(
                pdf["ts"], pdf["side"], pdf["seq"], pdf["rv"]
            ):
                ts = int(ts)
                if side == 0:  # right: advance the snapshot (forward-only)
                    if last_ts is None or ts >= last_ts:
                        last_ts, last_value = ts, float(rv)
                elif (
                    last_ts is not None
                    and last_ts <= ts
                    and (tolerance is None or ts - last_ts <= tolerance)
                ):
                    out.append((k, int(seq), ts, last_value, last_ts))
                else:
                    out.append((k, int(seq), ts, None, None))
        if last_ts is not None:
            state.update((last_ts, last_value))
        if out:
            yield pd.DataFrame(
                out, columns=["key", "event_id", "ts", "value", "right_ts"]
            )

    return fn


def streaming_asof(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    tolerance: int | None = None,
) -> DataFrame:
    """left (key, event_id, ts) enriched with the latest prior right
    (key, ts, value); unmatched / out-of-tolerance events emit null
    value and right_ts. Both inputs are streaming DataFrames with long
    key/ts columns; the shuffle key is ``key_col`` — the same exchange
    any per-key stateful op pays."""
    lhs = left.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(ts_col).cast("long").alias("ts"),
        F.lit(1).alias("side"),
        F.col(id_col).cast("long").alias("seq"),
        F.lit(None).cast("double").alias("rv"),
    )
    rhs = right.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(ts_col).cast("long").alias("ts"),
        F.lit(0).alias("side"),
        F.lit(0).cast("long").alias("seq"),
        F.col(value_col).cast("double").alias("rv"),
    )
    return lhs.unionByName(rhs).groupBy("key").applyInPandasWithState(
        _make_asof_fn(tolerance),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
