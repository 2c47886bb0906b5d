"""Rate conversion — per-series derivative.

Reference: `src/agg/rate.cpp:38-92`. Semantics:

- output point emitted AT t1 (the later timestamp) with value
  ``(v1 - v0) / Δt_seconds``; the first point of each series is dropped;
- ``counter``: if v decreased, treat as counter wrap:
  ``(counterMax - v0 + v1) / Δt``; if ``resetValue`` set and that wrap-rate
  exceeds it, emit 0 instead;
- ``dropResets``: decreased points are skipped entirely, BUT the previous
  point still advances (the C++ `goto cont` updates t0/v0) — the next
  delta is taken against the dropped point, not the one before it.

Spark: a lag window per series. One shuffle on the series key; the window
itself is whole-stage-codegen'd. Applied AFTER cross-series aggregation,
matching `src/core/query.cpp:470-491`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rate(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    counter: bool = False,
    counter_max: int = 18446744073709551615,  # UINT64_MAX (query.cpp:119)
    reset_value: int = 0,  # 0 = disabled (rate.cpp:68, m_reset_value != 0)
    drop_resets: bool = False,
    ts_in_ms: bool = True,
) -> DataFrame:
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_col).over(w)
    dt = (F.col(ts_col) - prev_t).cast("double")
    if ts_in_ms:
        dt = dt / F.lit(1000.0)
    delta = F.col(value_col) - prev_v

    plain = delta / dt
    if counter:
        wrap = (F.lit(float(counter_max)) - prev_v + F.col(value_col)) / dt
        if reset_value:
            wrap = F.when(wrap > F.lit(float(reset_value)), F.lit(0.0)).otherwise(wrap)
        value = F.when(delta < 0, wrap).otherwise(plain)
    else:
        value = plain

    # materialize all windowed expressions BEFORE filtering: lag must see
    # the original row sequence (dropResets advances prev past dropped rows)
    out = df.withColumns({"__prev_t": prev_t, "__delta": delta, "__rate": value})
    out = out.filter(F.col("__prev_t").isNotNull())  # first point dropped
    if counter and drop_resets:
        out = out.filter(F.col("__delta") >= 0)
    return out.withColumn(value_col, F.col("__rate")).drop("__prev_t", "__delta", "__rate")
