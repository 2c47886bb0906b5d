"""Rolling (sliding) time-window aggregates per series.

The reference's downsampler emits one row per fixed bucket; a rolling
window emits one row PER POINT covering the trailing ``window_ms`` — the
moving-average / trailing-rate shape OpenTSDB users build client-side.
Spark-first: a RANGE-framed window over the numeric timestamp, which is
a single partition-by-series sort — the exact same shuffle the
downsample agg pays, no self-join, no explode.

Determinism: the frame is range-based (every row whose ts falls in
[ts - window_ms, ts] is in scope), so duplicate timestamps see identical
frames and the result does not depend on their relative order — no
pre-dedup required. Sums accumulate in DECIMAL(18,2) (the canonical
2-decimal value domain, see queries.py module doc) so the result is
bit-exact under any accumulation order; the average is a single double
division at the end.

Scale: state per frame is O(points in window) inside one sorted
partition pass; skew = one series' day of points in one task, same bound
as sessionization — pre-split monster series by (series, dt) if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rolling_agg(
    df: DataFrame,
    series_cols: list[str],
    window_ms: int,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Attach trailing-window aggregates to every point: ``roll_n``
    (points in [ts - window_ms, ts]), ``roll_sum`` (decimal-exact, as
    double) and ``roll_avg``. ``ts_col`` must be numeric (epoch ms)."""
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(ts_col)
        .rangeBetween(-window_ms, Window.currentRow)
    )
    dec = F.col(value_col).cast("decimal(18,2)")
    s = F.sum(dec).over(w)
    n = F.count(F.lit(1)).over(w)
    return df.withColumns(
        {
            "roll_n": n,
            "roll_sum": s.cast("double"),
            "roll_avg": s.cast("double") / n.cast("double"),
        }
    )


def rolling_zscore(
    df: DataFrame,
    series_cols: list[str],
    window_ms: int,
    ts_col: str = "ts",
    value_col: str = "value",
    min_points: int = 2,
) -> DataFrame:
    """Trailing-window z-score per point — the classic streaming-metrics
    anomaly signal (how many sigmas is this point from its own series'
    recent behavior). Same single series-sort shuffle as rolling_agg.

    Numerics, engine-exactly: sum and sum-of-squares accumulate in
    DECIMAL (order-free, no float accumulation drift), then ONE cast to
    double each; variance = (sumsq - sum²/n)/n (population) computed in
    IEEE doubles — identical operation order in the SQL twin, so results
    are bit-identical. Catastrophic-cancellation can leave a tiny
    negative variance for near-constant frames: clamped with greatest(0)
    BEFORE sqrt on both sides (sqrt of negative is NaN in Spark but an
    error in some engines). Frames with fewer than ``min_points`` points
    (or zero variance) yield NULL z.

    Cross-engine bit-identity holds while the scaled sum of squares stays
    inside double's exact-integer range (2^53): |value| up to ~3e4 with 2
    decimals. Beyond that the DECIMAL→double cast itself rounds, engines
    may differ by an ulp, and the E[x²]−E[x]² cancellation amplifies that
    ulp into the std (found by tools/fuzz_testdata.py at |value|≈1e9).
    """
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(ts_col)
        .rangeBetween(-window_ms, Window.currentRow)
    )
    dec = F.col(value_col).cast("decimal(18,2)")
    s = F.sum(dec).over(w).cast("double")
    ss = F.sum(dec * dec).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    mean = s / n
    var = F.greatest((ss - s * s / n) / n, F.lit(0.0))
    std = F.sqrt(var)
    z = F.when(
        (F.count(F.lit(1)).over(w) >= min_points) & (std > 0),
        (F.col(value_col) - mean) / std,
    )
    return df.withColumns(
        {
            "roll_n": F.count(F.lit(1)).over(w),
            "roll_mean": mean,
            "roll_std": std,
            "zscore": z,
        }
    )


def ewma_baseline(
    df: DataFrame,
    series_cols: list[str],
    alpha: float = 0.5,
    lookback: int = 16,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Trailing exponentially-weighted moving-average baseline per
    series: baseline_t = sum over the previous ``lookback`` points of
    w_k * v_k / sum(w_k) with w_k = (1-alpha)^age — the classic
    smoothed-forecast anomaly baseline (resid = value - baseline feeds
    an alerting threshold; complements rolling_zscore's variance-based
    signal with a recency-weighted one). The current point is EXCLUDED
    from its own baseline; rows with no prior point are dropped.

    Engine exactness: with the default alpha = 0.5 the decay 0.5^k is
    an exact binary double for any k, the weighted sum is a
    left-to-right fold (F.aggregate, mirroring DuckDB's list fold), and
    the final division is one double op — bit-identical across engines.
    (Other alphas work; exactness then rests on pow() agreeing to the
    last ulp, which is not guaranteed across libms.)

    Scale shape: one exchange on the series key, a bounded
    ROWS-between window (<= lookback values carried per row), and
    per-row O(lookback) expression work — no self-joins, no state
    beyond the frame.

    Determinism: the ROWS frame order is defined by ``ts_col``; with
    duplicate timestamps inside one series the frame contents become
    engine/partitioning-dependent. Either feed unique-ts rows (the
    registry callers feed 1m buckets) or pass ``tiebreak_cols`` (e.g. an
    ingest seq/id column) to pin a total order.
    """
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(ts_col, *(tiebreak_cols or []))
        .rowsBetween(-int(lookback), -1)
    )
    decay = 1.0 - float(alpha)
    base = df.select(
        *series_cols,
        F.col(ts_col),
        F.col(value_col).alias("__v"),
        F.collect_list(value_col).over(w).alias("__arr"),
    ).filter(F.size("__arr") > 0)
    n = F.size(F.col("__arr"))
    wts = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.pow(F.lit(decay), (n - i).cast("double")),
    )

    def _fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    raw = _fold(F.zip_with(F.col("__arr"), wts, lambda v, wt: v * wt)) / _fold(wts)
    return base.select(
        *series_cols,
        ts_col,
        F.col("__v").alias(value_col),
        raw.alias("__raw"),
    ).select(
        *series_cols,
        ts_col,
        value_col,
        (F.floor(F.col("__raw") * F.lit(1_000_000.0) + F.lit(0.5)) / F.lit(1_000_000.0)).alias("ewma"),
        (
            F.floor(
                (F.col(value_col) - F.col("__raw")) * F.lit(1_000_000.0) + F.lit(0.5)
            )
            / F.lit(1_000_000.0)
        ).alias("resid"),
    )


def rolling_percentile_r6(
    df: DataFrame,
    series_cols: list[str],
    quantile: float,
    lookback: int = 16,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Trailing-window exact percentile per series — "rolling p95
    latency", the SRE staple — with OpenTSDB's R-6 ``q*(n+1)``
    interpolation (operators/percentile.py semantics) so a rolling p95
    agrees with the downsample/aggregation percentiles everywhere else
    in the engine. The window INCLUDES the current point and covers the
    trailing ``lookback`` rows.

    Scale shape: one exchange on the series key; each row carries a
    sorted array bounded by ``lookback`` (constant), so memory per row
    is fixed — no per-group collection of unbounded history.

    Determinism: as with ``ewma_baseline``, duplicate timestamps make
    the ROWS frame engine-dependent — feed unique-ts rows or pass
    ``tiebreak_cols`` to pin a total order. (The sort_array inside the
    frame makes the PCT itself order-free, but n_window membership at
    the frame edge still depends on row order.)
    """
    from ticktock_spark.operators.downsample import percentile_r6_on_array

    w = (
        Window.partitionBy(*series_cols)
        .orderBy(ts_col, *(tiebreak_cols or []))
        .rowsBetween(-(int(lookback) - 1), 0)
    )
    arr = F.sort_array(F.collect_list(value_col).over(w))
    base = df.select(
        *series_cols, F.col(ts_col), F.col(value_col), arr.alias("__arr")
    )
    pct = percentile_r6_on_array(F.col("__arr"), float(quantile))
    return base.select(
        *series_cols,
        ts_col,
        value_col,
        F.size("__arr").alias("n_window"),
        (F.floor(pct * F.lit(1_000_000.0) + F.lit(0.5)) / F.lit(1_000_000.0)).alias(
            "pct"
        ),
    )


def mean_shift_score(
    df: DataFrame,
    series_cols: list[str],
    window: int = 8,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Window-contrast changepoint score per point: |mean of the next
    ``window`` points − mean of the previous ``window`` points| — the
    two-sided sliding mean-shift signal (the non-recursive core of
    CUSUM-style level-change detection: a step change of height h makes
    the score ramp to h exactly at the change point). Emitted only
    where BOTH sides are full (``window`` points each), so every score
    compares equal-sized samples; rank the output by score to shortlist
    change points.

    Numerics: each side's sum accumulates in DECIMAL(18,2) (order-free),
    one cast to double, one division by the constant window — identical
    op order in the SQL twin, bit-identical results.

    Scale shape: ONE series-sorted window pass (two bounded ROWS frames
    over the same sort — a single exchange + sort, no self-join); state
    per row is 2·window values. Same duplicate-timestamp caveat as
    ewma_baseline — pass ``tiebreak_cols`` if bucket keys can repeat.
    """
    order = [ts_col, *(tiebreak_cols or [])]
    left = (
        Window.partitionBy(*series_cols)
        .orderBy(*order)
        .rowsBetween(-int(window), -1)
    )
    right = (
        Window.partitionBy(*series_cols)
        .orderBy(*order)
        .rowsBetween(0, int(window) - 1)
    )
    dec = F.col(value_col).cast("decimal(18,2)")
    w = float(window)
    lmean = F.sum(dec).over(left).cast("double") / F.lit(w)
    rmean = F.sum(dec).over(right).cast("double") / F.lit(w)
    out = df.select(
        *series_cols,
        F.col(ts_col),
        F.col(value_col),
        F.count(F.lit(1)).over(left).alias("__ln"),
        F.count(F.lit(1)).over(right).alias("__rn"),
        lmean.alias("mean_before"),
        rmean.alias("mean_after"),
    ).filter((F.col("__ln") == int(window)) & (F.col("__rn") == int(window)))
    return out.select(
        *series_cols,
        ts_col,
        value_col,
        "mean_before",
        "mean_after",
        (
            F.floor(
                F.abs(F.col("mean_after") - F.col("mean_before"))
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            )
            / F.lit(1_000_000.0)
        ).alias("shift_score"),
    )
