"""Stateful streaming event-transition pairs (applyInPandasWithState).

The streaming twin of ``pipeline.sessions.event_transitions``: the batch
operator computes consecutive-event pairs per user with a lead() window
over the full history, which a stream cannot replay — instead each user
carries O(1) state (the last event's (µs, event_id, type)) and every
arriving event emits exactly one (prev_type, next_type) pair row. The
downstream transition MATRIX is then an ordinary streaming aggregation
over the emitted pairs (or a batch groupBy on their sink).

Module conventions match streaming/funnel.py / streaming/rate.py: rows
are processed in (event-time, event_id) order WITHIN each micro-batch,
and state only moves FORWARD — an out-of-order straggler older than the
stored last event is dropped (the batch operator stays the authority
for retroactive replays, the repo-wide raw-replay philosophy). On an
in-order stream the emitted pair multiset equals the batch operator's
pre-aggregation pairs exactly (pinned by parity test).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

_STATE = StructType(
    [
        StructField("us", LongType()),
        StructField("eid", LongType()),
        StructField("typ", StringType()),
    ]
)
_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("next_type", StringType()),
        StructField("us", LongType()),
    ]
)


def _fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user,) = key
    last = state.get if state.exists else None
    # Concatenate ALL Arrow chunks before sorting (funnel.py rationale:
    # a multi-chunk user must be walked in global event-time order).
    chunks = [pdf for pdf in pdfs if len(pdf)]
    users, prevs, nexts, uss = [], [], [], []
    if chunks:
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["us", "eid"])
        for us, eid, typ in zip(pdf["us"], pdf["eid"], pdf["typ"]):
            us, eid = int(us), int(eid)
            if last is not None and (us, eid) <= (int(last[0]), int(last[1])):
                # forward-only, INCLUSIVE: a replayed duplicate of the exact
                # stored (us, eid) would otherwise emit a spurious self-pair
                continue
            if last is not None:
                users.append(user)
                prevs.append(last[2])
                nexts.append(typ)
                uss.append(us)
            last = (us, eid, typ)
        state.update(tuple(last))
    if users:
        yield pd.DataFrame(
            {"user_id": users, "event_type": prevs, "next_type": nexts, "us": uss}
        )


def streaming_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "us",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """events stream (``ts_col`` = epoch µs long) → one
    (user_id, event_type, next_type, us) row per consecutive-event pair,
    with O(1) state per user."""
    prepped = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("us"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("typ"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _fn, _OUT, _STATE, "update", GroupStateTimeout.NoTimeout
    )
