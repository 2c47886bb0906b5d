"""Stateful streaming conversion funnel (applyInPandasWithState).

The streaming twin of ``pipeline.sessions.funnel_stages`` — and the
bounded-state answer to that operator's one documented scale hazard:
the batch formulation collects each user's per-stage event-time arrays
(bounded by that user's event count, so a bot-grade user is a fat row),
while the streaming state machine keeps exactly K epoch-µs slots per
user (K = number of stages), independent of how many events the user
ever produced.

Semantics, matching the module conventions of streaming/asof.py and
streaming/rate.py: rows are processed in event-time order WITHIN each
micro-batch, and the funnel chain only moves FORWARD — a stage slot is
set once, by the first qualifying event (stage i fires iff stage i-1 is
already set, the event is strictly later, and slot i is still empty).
On an in-timestamp-order stream this reproduces the batch operator
exactly (pinned by parity test); an out-of-order straggler that would
rewrite an already-set slot is ignored, and the batch operator remains
the authority for retroactive recomputation (the repo-wide raw-replay
philosophy).

Emission: update mode — one row per user per micro-batch in which the
user's funnel state changed, carrying the per-stage times and the
deepest stage reached; the latest row per user is the current funnel
position.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def _schemas(stages: list[str]) -> tuple[StructType, StructType]:
    state = StructType(
        [StructField(f"t{i}", LongType()) for i in range(len(stages))]
    )
    out = StructType(
        [StructField("user_id", LongType())]
        + [StructField(f"t_{s}", LongType()) for s in stages]
        + [StructField("stage", IntegerType())]
    )
    return state, out


def _make_funnel_fn(n_stages: int, stage_names: list[str]):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        slots: list = list(state.get) if state.exists else [None] * n_stages
        changed = False
        # Concatenate ALL Arrow chunks before sorting: a user whose
        # micro-batch spans multiple chunks (>~10k rows at default
        # maxRecordsPerBatch) must still be processed in global
        # event-time order or the forward-only slot logic could set a
        # later timestamp / skip a stage. Memory is bounded by that
        # user's per-micro-batch volume; state stays O(stages).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values("us")
            for us, si in zip(pdf["us"], pdf["si"]):
                si = int(si)
                us = int(us)
                if slots[si] is not None:
                    continue  # slot already set: forward-only
                if si == 0 or (slots[si - 1] is not None and us > slots[si - 1]):
                    slots[si] = us
                    changed = True
        if changed:
            state.update(tuple(slots))
            deepest = 0
            for i in range(n_stages - 1, -1, -1):
                if slots[i] is not None:
                    deepest = i + 1
                    break
            yield pd.DataFrame(
                [[user, *slots, deepest]],
                columns=["user_id", *[f"t_{s}" for s in stage_names], "stage"],
            )

    return fn


def streaming_funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "us",
    type_col: str = "event_type",
) -> DataFrame:
    """events stream (``ts_col`` = epoch µs long) → per-user funnel
    state updates. Only users who eventually perform ``stages[0]``
    produce state (stage-i events before stage i-1 completes are
    no-ops), mirroring the batch operator's stage-0 filter."""
    state_schema, out_schema = _schemas(stages)
    si = None
    for i, s in enumerate(stages):
        cond = F.col(type_col) == s
        si = F.when(cond, i) if si is None else si.when(cond, i)
    prepped = (
        events.filter(F.col(type_col).isin(stages))
        .select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("us"),
            si.cast("int").alias("si"),
        )
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _make_funnel_fn(len(stages), stages),
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
