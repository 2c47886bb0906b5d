"""Downsampling: per-series time-bucket aggregation.

Reference: `src/agg/down.cpp` — spec ``<interval><unit>-<func>[-<fill>]``,
bucket = ``ts - ts % interval`` (`step_down`, down.cpp:242-246), i.e. epoch
aligned, NO calendar/timezone alignment. We therefore bucket with integer
math (not ``window()``) so semantics are identical in every session
timezone and the whole expression stays inside whole-stage codegen.

Supported functions (down.cpp:314-699): avg count dev first last max min
p50 p75 p90 p95 p99 p999 (any pNN) sum. ``dev`` is the POPULATION stddev
(Welford m2/n, down.cpp:151-155,430-468). ``first``/``last`` order by
timestamp. Percentiles use OpenTSDB's R-6 style index rule
``idx = q*(n+1)`` with linear interpolation — NOT Spark's default
``percentile`` (R-7); see :func:`percentile_r6_on_array`, pinned by the
golden fixture from `test/agg_test.cpp:29-76`.

Scale notes: a downsample is one hash aggregation keyed on
(series, bucket); Spark performs partial (map-side) aggregation before the
shuffle, so the shuffle volume is #distinct (series, bucket) not #rows.
Percentile/first/last use collect_list/min_by/max_by whose state is bounded
by the bucket population — at 100 TB keep intervals such that one
(series, bucket) group fits an executor (always true for metric data).
"""

from __future__ import annotations

import re
from pyspark.sql import Column, DataFrame, functions as F

_PCT_RE = re.compile(r"^p(\d+)$")


def bucket_expr(ts_col: str | Column, interval_ms: int) -> Column:
    """Epoch-aligned bucket start: ``ts - ts % interval`` (down.cpp:242-246)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (c - c % F.lit(interval_ms)).cast("long")


def parse_quantile(func: str) -> float | None:
    """``p50``→50.0, ``p999``→99.9 (scaled ≤100 per aggregate.cpp:331-339)."""
    m = _PCT_RE.match(func)
    if not m:
        return None
    q = float(m.group(1))
    while q > 100.0:
        q /= 10.0
    return q


def percentile_r6_on_array(sorted_vals: Column, quantile: float) -> Column:
    """OpenTSDB percentile on a pre-sorted array column.

    Implements `src/agg/aggregate.cpp:341-387`: with n values and
    p = quantile/100, idx = 0 if p==0, n if p==1, else p*(n+1);
    result = v[0] if idx<1; v[n-1] if idx>=n; else
    v[i-1] + (idx - floor(idx)) * (v[i] - v[i-1]) with i = int(idx)
    (1-based element_at below). n==1 → the single value; n==0 → NaN.
    NaN/Inf inputs must already be filtered (add_data_point skips them).
    """
    p = quantile / 100.0
    n = F.size(sorted_vals)
    if p <= 0.0:
        idx = F.lit(0.0)
    elif p >= 1.0:
        idx = n.cast("double")
    else:
        idx = F.lit(p) * (n + F.lit(1)).cast("double")
    iidx = F.floor(idx).cast("int")
    lower = F.element_at(sorted_vals, iidx)
    upper = F.element_at(sorted_vals, iidx + F.lit(1))
    interp = lower + (idx - F.floor(idx)) * (upper - lower)
    return (
        F.when(n == 0, F.lit(float("nan")))
        .when(n == 1, F.element_at(sorted_vals, 1))
        .when(idx < 1.0, F.element_at(sorted_vals, 1))
        .when(idx >= n.cast("double"), F.element_at(sorted_vals, n))
        .otherwise(interp)
    )


def _finite(value: Column) -> Column:
    return F.when(~F.isnan(value) & (F.abs(value) != float("inf")), value)


def downsample_agg_expr(func: str, value_col: str = "value", ts_col: str = "ts") -> Column:
    """The aggregation expression for one downsample function."""
    v = F.col(value_col)
    q = parse_quantile(func)
    if q is not None:
        return percentile_r6_on_array(F.sort_array(F.collect_list(_finite(v))), q)
    if func == "avg":
        return F.avg(v)
    if func == "sum":
        return F.sum(v)
    if func == "min":
        return F.min(v)
    if func == "max":
        return F.max(v)
    if func == "count":
        return F.count(v).cast("double")
    if func == "dev":
        # population stddev (√(m2/n), down.cpp:151-155); n==1 → 0.0
        return F.coalesce(F.stddev_pop(v), F.lit(0.0))
    if func == "first":
        return F.min_by(v, F.col(ts_col))
    if func == "last":
        return F.max_by(v, F.col(ts_col))
    raise ValueError(f"unknown downsample function: {func!r}")


def downsample(
    df: DataFrame,
    series_cols: list[str],
    interval_ms: int,
    func: str,
    value_col: str = "value",
    ts_col: str = "ts",
    out_col: str = "value",
) -> DataFrame:
    """Per-series bucket aggregation.

    interval_ms == 0 means ``0all``: the whole query range is one bucket
    (down.cpp:82,96-99) — this standalone operator emits bucket_ts =
    min ts of the series (no query-range context here); the planner's
    0all path emits the reference-exact original query start
    (down.cpp:51,245). Output columns: series_cols + [ts_col, out_col].
    """
    agg = downsample_agg_expr(func, value_col, ts_col).alias(out_col)
    if interval_ms == 0:
        return df.groupBy(*series_cols).agg(F.min(ts_col).alias(ts_col), agg)
    bucket = bucket_expr(ts_col, interval_ms).alias(ts_col)
    return df.groupBy(*series_cols, bucket).agg(agg)
