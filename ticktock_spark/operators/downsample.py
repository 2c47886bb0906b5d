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


def percentile_r6_distributed(
    df: DataFrame,
    group_cols: list[str],
    quantile: float,
    interval_ms: int = 0,
    value_col: str = "value",
    ts_col: str = "ts",
    out_col: str = "value",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """The mega-bucket-safe twin of the ``collect_list`` percentile
    path: identical R-6 semantics (`aggregate.cpp:341-387`), but the
    group's values are never materialized in one aggregation buffer.

    The array path is the right default — one hash aggregation, and the
    values per (series, bucket) are small for real downsample
    intervals. It stops being viable when a single group holds tens of
    millions of points (``0all`` over years of 1 s data: a
    multi-hundred-MB array in ONE agg buffer). Here the group is SORTED
    instead — ONE window pass (non-finite values rank LAST so no
    pre-filter splits the lineage; Spark's sort spills to disk), the
    R-6 index comes from a count window sharing the same exchange, and
    only the one or two rank-matched rows per group (plus one sentinel
    row for all-non-finite groups, which must still emit NaN) survive
    to a final tiny aggregation. Memory per task is bounded by the
    sort's spill budget regardless of group size, and the input is
    scanned exactly once.

    ``carry_cols`` ride through to the output via first-per-group (the
    planner passes the series tag map so result assembly needs no
    second scan). Output schema, ts conventions (bucket start / min-ts
    for 0all), and float arithmetic are expression-for-expression the
    same as ``downsample(func='pNN')`` — pinned by an equivalence test
    and by q102 sharing q05's oracle.
    """
    from pyspark.sql import Window

    carry = carry_cols or []
    if interval_ms == 0:
        base = df.select(
            *group_cols, F.col(ts_col), _finite(F.col(value_col)).alias("__v"), *carry
        )
        rank_keys = list(group_cols)
        out_cols = [*group_cols, ts_col]
    else:
        base = df.select(
            *group_cols,
            bucket_expr(ts_col, interval_ms).alias(ts_col),
            _finite(F.col(value_col)).alias("__v"),
            *carry,
        )
        rank_keys = [*group_cols, ts_col]
        out_cols = rank_keys

    p = quantile / 100.0

    def r6_idx(n_col):
        if p <= 0.0:
            return F.lit(0.0)
        if p >= 1.0:
            return n_col
        return F.lit(p) * (n_col + F.lit(1.0))

    w = Window.partitionBy(*rank_keys).orderBy(F.col("__v").asc_nulls_last())
    wn = Window.partitionBy(*rank_keys)
    extra = {"__rn": F.row_number().over(w), "__nf": F.count("__v").over(wn)}
    if interval_ms == 0:
        extra["__mints"] = F.min(ts_col).over(wn)
    ranked = base.withColumns(extra)

    nf = F.col("__nf").cast("double")
    idx = r6_idx(nf)
    lo = (
        F.when(F.col("__nf") <= 1, F.lit(1))
        .when(idx < 1.0, F.lit(1))
        .when(idx >= nf, F.col("__nf"))
        .otherwise(F.floor(idx).cast("int"))
    )
    hi = (
        F.when(F.col("__nf") <= 1, F.lit(1))
        .when(idx < 1.0, F.lit(1))
        .when(idx >= nf, F.col("__nf"))
        .otherwise(F.floor(idx).cast("int") + F.lit(1))
    )
    sel = ranked.filter(
        ((F.col("__nf") == 0) & (F.col("__rn") == 1))
        | (F.col("__rn") == lo)
        | (F.col("__rn") == hi)
    ).withColumns({"__lo": lo, "__hi": hi})
    aggs = [
        F.min(F.when(F.col("__rn") == F.col("__lo"), F.col("__v"))).alias("__vlo"),
        F.min(F.when(F.col("__rn") == F.col("__hi"), F.col("__v"))).alias("__vhi"),
        F.first("__nf").alias("__n"),
        *[F.first(c).alias(c) for c in carry],
    ]
    if interval_ms == 0:
        aggs.append(F.first("__mints").alias(ts_col))
    out = sel.groupBy(*rank_keys).agg(*aggs)

    n = F.col("__n").cast("double")
    idx2 = r6_idx(n)
    interp = F.col("__vlo") + (idx2 - F.floor(idx2)) * (F.col("__vhi") - F.col("__vlo"))
    result = (
        F.when(F.col("__n") == 0, F.lit(float("nan")))
        .when(F.col("__n") == 1, F.col("__vlo"))
        .when(idx2 < 1.0, F.col("__vlo"))
        .when(idx2 >= n, F.col("__vlo"))
        .otherwise(interp)
    )
    return out.select(*out_cols, result.alias(out_col), *carry)


def percentile_approx_downsample(
    df: DataFrame,
    group_cols: list[str],
    quantile: float,
    interval_ms: int = 0,
    accuracy: int = 10_000,
    value_col: str = "value",
    ts_col: str = "ts",
    out_col: str = "value",
) -> DataFrame:
    """Third tier of the percentile story: a Greenwald-Khanna sketch
    (`percentile_approx`, built-in partial+final aggregation) for
    exploratory sweeps where the exact paths are overkill — constant
    memory per group (O(accuracy)), one hash aggregation, rank error
    bounded by n/accuracy. NOT R-6: a sketch returns an actual data
    value at a rank within the error bound, never interpolates, so its
    result differs from the exact paths by at most the local value gap
    around the target rank (asserted by test). Use
    ``percentile_r6_on_array`` (default) or
    ``percentile_r6_distributed`` (mega-buckets) when answers must
    match the reference bit-for-bit."""
    agg = F.percentile_approx(
        _finite(F.col(value_col)), F.lit(quantile / 100.0), F.lit(accuracy)
    ).alias(out_col)
    if interval_ms == 0:
        return df.groupBy(*group_cols).agg(F.min(ts_col).alias(ts_col), agg)
    return df.groupBy(*group_cols, bucket_expr(ts_col, interval_ms).alias(ts_col)).agg(agg)
