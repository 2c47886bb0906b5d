"""Robust statistics over bucketed series: median/MAD outliers,
Theil–Sen trend, and seasonal-strength scoring.

These are the alerting-side complements of `operators/correlate.py`:
where trend/ACF/Pearson are moment-based (and an outlier drags every
moment), the operators here are ORDER-STATISTIC based — a single bad
datapoint moves a median by at most one rank, so scores stay meaningful
exactly when the data is at its worst.

Cross-engine exactness discipline (the q167/q170 contract):

- values enter as rounded integer micro-units (``floor(v*1e6 + 0.5)``);
- medians run on those integers — both Spark's exact ``percentile`` and
  DuckDB's ``quantile_cont`` interpolate the same rank ``(n+1)/2`` at
  p=0.5, and the midpoint of two integers is an exact IEEE double — so
  group medians are bit-identical across engines and across Spark's
  partial-aggregation orders;
- sums of squares accumulate in DECIMAL(38,0) (order-free);
- the final score is a handful of IEEE ops in pinned order, then the
  6-decimal canonicalization.

All three operators assume a BUCKETED input frame (one row per
(series, bucket), e.g. a downsample/bucket-mean result), so their cost
is bucket-scale: the quadratic Theil–Sen pair fan-out is bounded by
(time-range / bucket_ms)², never by raw-datapoint count — the same
bound-the-expensive-thing-by-buckets shape as `acf`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _q6(c):
    return F.floor(c * F.lit(1_000_000.0) + F.lit(0.5)) / F.lit(1_000_000.0)


def _micro(value_col: str):
    return F.floor(F.col(value_col) * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")


def mad_outliers(
    df: DataFrame,
    series_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-series outliers via the modified z-score
    0.6745·(v − median)/MAD (Iglewicz–Hoaglin), |score| ≥ ``threshold``
    (3.5 is the published cutoff). Unlike mean/stddev z-scores (q84),
    the baseline itself is outlier-proof: one wild datapoint cannot
    inflate the deviation scale and mask itself.

    Output: (series..., ts, value, score) — only the flagged buckets.
    Zero-MAD series (constant, or >50% one value) yield NULL scores and
    are dropped (no finite robust scale exists).

    Scale shape: ONE scan — both medians are unordered-frame window
    aggregates over the same per-series partitioning (no orderBy → no
    sort; two Window nodes share one exchange), so the input subtree is
    never re-executed the way a groupBy + join-back would re-scan it.
    The window partition is a series' BUCKETS (bounded by
    time-range / bucket_ms), never its raw datapoints.
    """
    w = Window.partitionBy(*series_cols)
    base = df.select(
        *series_cols,
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
        _micro(value_col).alias("y"),
    )
    dev = base.withColumn(
        "med", F.percentile("y", F.lit(0.5)).over(w)
    ).withColumn("dev", F.abs(F.col("y") - F.col("med")))
    scored = dev.withColumn("mad", F.percentile("dev", F.lit(0.5)).over(w))
    score = F.lit(0.6745) * (F.col("y") - F.col("med")) / F.col("mad")
    return (
        scored.filter(F.col("mad") > 0)
        .filter(F.abs(score) >= F.lit(threshold))
        .select(
            *series_cols,
            "ts",
            _q6(F.col("value")).alias("value"),
            _q6(score).alias("score"),
        )
    )


def theil_sen(
    df: DataFrame,
    series_cols: list[str],
    bucket_ms: int,
    value_col: str = "value",
    ts_col: str = "ts",
    max_buckets: int = 5_000,
    engine: str = "arrow",
) -> DataFrame:
    """Theil–Sen slope per series: the MEDIAN of all pairwise slopes
    (y_j − y_i)/(x_j − x_i) over bucket indices — the robust twin of
    `correlate.trend`'s least-squares slope (breakdown point ~29%: up
    to a third of the buckets can be garbage before the estimate
    moves, where one spike already bends an OLS line).

    Output: (series..., n [buckets], n_pairs, slope) — slope in
    value-units per bucket, 6-decimal. Series with a single bucket have
    no pairwise slope and are dropped.

    ``engine`` picks where the O(buckets²) pair fan-out runs; both
    produce IDENTICAL rows (parity-pinned by test):

    * ``'arrow'`` (default) — groupBy(series).applyInPandas, pairs and
      median in numpy. Same shuffle as the collect_list path (bucket
      rows keyed by series), but the quadratic inner loop is vectorized
      C instead of interpreted HOF lambda evaluation — measured ~40×
      on the month-of-hours bench shape. Slopes are the same
      integer-ratio float64 divisions, np.sort orders doubles exactly
      like array_sort (NaN/NULL last), and the median interpolation and
      6-decimal canonicalization replicate the JVM ops bit-for-bit.
    * ``'hof'`` — the pure-expression spec: per-series sorted struct
      array, pair fan-out inside transform/flatten/array_sort, no
      Python workers. Kept as the engine for deployments without
      Python and as the readable specification of the pair set.

    Scale shape (both engines): ONE scan, one series-keyed exchange at
    bucket scale (bounded by time-range / bucket_ms, e.g. 744 buckets
    for a month of hourly buckets); the quadratic fan-out happens
    inside a single task per series. Per-series memory is
    (span/bucket_ms)²·8 bytes — ~2 MB for a month of hours; for longer
    horizons coarsen ``bucket_ms`` (the estimator's resolution knob,
    which is exactly what bounds the quadratic). Pair slopes are
    integer-ratio doubles (micro-unit Δy over integer Δx — identical in
    any engine); the median interpolates at most
    lower + (upper − lower)·0.5, also pinned IEEE.
    """
    if engine == "arrow":
        return _theil_sen_arrow(
            df, series_cols, bucket_ms, value_col, ts_col, max_buckets
        )
    if engine != "hof":
        raise ValueError(f"unknown theil_sen engine: {engine!r}")
    b = df.select(
        *series_cols,
        F.struct(
            F.col(ts_col).alias("ts"), _micro(value_col).alias("y")
        ).alias("p"),
    )
    g = (
        b.groupBy(*series_cols)
        .agg(F.array_sort(F.collect_list("p")).alias("arr"))
        .filter(F.size("arr") >= 2)
        # x is monotone in ts (arr is ts-sorted), so at least one valid
        # x_j > x_i pair exists iff the LAST row's bucket differs from
        # the FIRST's — an O(1) precondition that drops a series whose
        # rows all share one bucket (un-bucketed input would otherwise
        # hit an empty slope set: the oracle's `b.x > a.x` pair join
        # yields no group for it either). Deliberately pinned HERE, on
        # the cheap `arr` column: a filter on the O(B²) slope array
        # downstream gets predicate-pushed below the projection and
        # re-evaluates the whole pair fan-out per row (measured ~100×
        # on q181 before this was moved).
        .filter(
            F.element_at(F.col("arr"), -1)["ts"]
            - F.element_at(F.col("arr"), 1)["ts"]
            >= F.lit(int(bucket_ms))
        )
    )
    # runtime guard, lazily in the plan (no extra job): B buckets fan
    # out to B²/2 slopes inside ONE array value — beyond ``max_buckets``
    # that is a multi-GB unsplittable row heading for an executor OOM,
    # and the correct move is a coarser ``bucket_ms`` (the estimator's
    # resolution knob), not a bigger heap. Fail loudly instead.
    g = g.withColumn(
        "arr",
        F.when(F.size("arr") <= F.lit(int(max_buckets)), F.col("arr")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("theil_sen: series has "),
                    F.size("arr").cast("string"),
                    F.lit(
                        f" buckets > max_buckets={int(max_buckets)}"
                        " — coarsen bucket_ms (pairs grow as buckets²)"
                        " or raise max_buckets explicitly"
                    ),
                )
            )
        ),
    )
    t0 = F.element_at(F.col("arr"), 1)["ts"]

    def x_of(e):
        # exact integer bucket index (no float division near boundaries)
        delta = e["ts"] - t0
        return (delta - delta % F.lit(bucket_ms)) / F.lit(bucket_ms)

    # hoist the bucket index out of the O(B²) inner lambda: one O(B)
    # pass computes (x, y) per bucket, pairs then read it by rank
    g = g.select(
        *series_cols,
        F.size("arr").alias("n"),
        F.transform(
            F.col("arr"),
            lambda e: F.struct(x_of(e).alias("x"), e["y"].alias("y")),
        ).alias("xy"),
    )

    def slopes_from(i):
        # skip equal-x partners (two input rows landing in one bucket —
        # un-bucketed input) instead of emitting a divide-by-zero: the
        # pair set stays exactly the x_j > x_i triangle the oracle's
        # `b.x > a.x` join defines, so parity holds even on malformed
        # input
        a = F.element_at(F.col("xy"), i)
        return F.transform(
            F.filter(
                F.slice(F.col("xy"), i + 1, F.size("xy") - i),
                lambda e: e["x"] > a["x"],
            ),
            lambda e: (e["y"] - a["y"]).cast("double")
            / (e["x"] - a["x"]).cast("double"),
        )

    sp = F.array_sort(
        F.flatten(
            F.transform(F.sequence(F.lit(1), F.size("xy") - 1), slopes_from)
        )
    )
    # sp is provably non-empty here: the span precondition above
    # guarantees x_last > x_first, so (first, last) alone is a valid pair
    g = g.select(*series_cols, "n", sp.alias("sp"))
    m = F.size("sp")
    # 1-based ranks of the middle pair, in INT arithmetic ('/' on ints
    # is double division in Spark SQL)
    lower = F.element_at(F.col("sp"), F.floor((m + 1) / 2).cast("int"))
    upper = F.element_at(F.col("sp"), (F.floor(m / 2) + 1).cast("int"))
    # quantile_cont's interpolation, pinned: lower + (upper - lower)/2
    # (odd m: both indices land on the middle element)
    med = lower + (upper - lower) * F.lit(0.5)
    return g.select(
        *series_cols,
        F.col("n").cast("long").alias("n"),
        m.cast("long").alias("n_pairs"),
        _q6(med / F.lit(1_000_000.0)).alias("slope"),
    )


def _theil_sen_arrow(
    df: DataFrame,
    series_cols: list[str],
    bucket_ms: int,
    value_col: str,
    ts_col: str,
    max_buckets: int,
) -> DataFrame:
    """theil_sen engine='arrow' (see its docstring). Exactness notes:

    - y enters as the SAME micro-unit rounding (np.floor(v*1e6+0.5) is
      the identical IEEE op sequence as the JVM _micro), kept float64 so
      a NULL value flows through as NaN;
    - the pair set is the x_j > x_i triangle over rows sorted by
      (ts, y) — exactly the HOF path's array_sort(struct(ts, y)) order
      (ts is unique per bucketed series, y is the tiebreak for
      malformed input);
    - slope division is int-difference float64 / float64 — the same op
      the JVM evaluates; np.sort places NaN last like array_sort places
      NULL last, so the median rank picks align, and a NaN median
      (NULL-value series) is emitted as NULL exactly like the JVM's
      NULL arithmetic;
    - the median is lower + (upper − lower)·0.5 with the SAME 1-based
      ranks, then the standard 6-decimal canonicalization applied to
      med/1e6 in the same op order.
    """
    import math

    import numpy as np
    import pandas as pd

    dtypes = dict(df.dtypes)
    series_schema = ", ".join(f"`{c}` {dtypes[c]}" for c in series_cols)
    out_schema = f"{series_schema}, n long, n_pairs long, slope double"
    bms = int(bucket_ms)
    maxb = int(max_buckets)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ts", "__y"], kind="mergesort")
        ts = pdf["__ts"].to_numpy(np.int64)
        n = len(ts)
        series_vals = {c: pdf[c].iloc[0] for c in series_cols}
        empty = pd.DataFrame(
            {**{c: [] for c in series_cols}, "n": [], "n_pairs": [], "slope": []}
        )
        if n < 2 or ts[-1] - ts[0] < bms:
            return empty
        if n > maxb:
            raise ValueError(
                f"theil_sen: series has {n} buckets > max_buckets={maxb}"
                " — coarsen bucket_ms (pairs grow as buckets²)"
                " or raise max_buckets explicitly"
            )
        x = (ts - ts[0]) // bms
        i, j = np.triu_indices(n, k=1)
        keep = x[j] > x[i]
        i, j = i[keep], j[keep]
        ycol = pdf["__y"]
        if ycol.isna().any():
            # NULL values present: float64 path, NaN propagates like the
            # JVM's NULL arithmetic (converted back to NULL at the end)
            y = ycol.to_numpy(np.float64)
            dy = y[j] - y[i]
        else:
            # exact path: int64 Δy then ONE rounding at the float cast —
            # the JVM's (y_j - y_i).cast('double') op order
            y = ycol.to_numpy(np.int64)
            dy = (y[j] - y[i]).astype(np.float64)
        sp = dy / (x[j] - x[i]).astype(np.float64)
        sp = np.sort(sp)  # NaN (NULL-value pairs) sorts last, like array_sort
        m = len(sp)
        lower = sp[(m + 1) // 2 - 1]
        upper = sp[m // 2]
        med = lower + (upper - lower) * 0.5
        if math.isnan(med):
            slope = None
        else:
            c = med / 1_000_000.0
            slope = math.floor(c * 1_000_000.0 + 0.5) / 1_000_000.0
        return pd.DataFrame(
            {
                **{c: [v] for c, v in series_vals.items()},
                "n": [n],
                "n_pairs": [m],
                "slope": [slope],
            }
        )

    base = df.select(
        *series_cols,
        F.col(ts_col).alias("__ts"),
        # float64 micro units: same floor(v*1e6+0.5) rounding as _micro,
        # NULL kept as NaN so NULL propagation matches the JVM path
        (F.floor(F.col(value_col) * F.lit(1_000_000.0) + F.lit(0.5))).alias(
            "__y"
        ),
    )
    return base.groupBy(*series_cols).applyInPandas(kernel, schema=out_schema)


def seasonal_strength(
    df: DataFrame,
    series_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    period_ms: int = 86_400_000,
    phase_ms: int = 3_600_000,
) -> DataFrame:
    """Fraction of a series' variance explained by its seasonal profile:
    1 − SS_resid/SS_total, where the profile is the per-phase mean
    (hour-of-day by default — q155's matrix) — the one number that says
    whether seasonal-baseline alerting (q156) will actually beat a flat
    threshold for this metric, and whether a daily rollup can stand in
    for raw data in capacity models.

    Output: (series..., n, n_phases, strength) — strength in [~0, 1],
    6-decimal; NULL for zero-variance series.

    Exactness: phase means round to integer micro-units (the q157
    pattern), residuals are then integer subtractions, and both sums of
    squares accumulate in DECIMAL(38,0) — order-free, bit-identical
    across engines. Scale shape: ONE scan — both means are
    unordered-frame window aggregates over the single bucket lineage
    (per (series, phase) and per series), then one final per-series
    agg that reuses the series partitioning; no joins, no re-executed
    subtree.
    """
    # integer `div`, not float '/': a double quotient can round across
    # the phase boundary for epoch values near a multiple of phase_ms
    phase = F.expr(
        f"CAST((({ts_col} % {period_ms}) div {phase_ms}) AS LONG)"
    )
    base = df.select(
        *series_cols, phase.alias("phase"), _micro(value_col).alias("y")
    )
    dec = F.col("y").cast("decimal(38,0)")
    wp = Window.partitionBy(*series_cols, "phase")
    wg = Window.partitionBy(*series_cols)
    mean_over = lambda w: (  # noqa: E731
        F.floor(
            F.sum(dec).over(w).cast("double") / F.count(F.lit(1)).over(w)
            + F.lit(0.5)
        ).cast("long")
    )
    withm = base.withColumn("ph_mean", mean_over(wp)).withColumn(
        "g_mean", mean_over(wg)
    )
    r = (F.col("y") - F.col("ph_mean")).cast("decimal(38,0)")
    t = (F.col("y") - F.col("g_mean")).cast("decimal(38,0)")
    ss = withm.groupBy(*series_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("phase").cast("long").alias("n_phases"),
        F.sum(r * r).alias("ss_resid"),
        F.sum(t * t).alias("ss_total"),
    )
    return ss.select(
        *series_cols,
        "n",
        "n_phases",
        _q6(
            F.lit(1.0)
            - F.try_divide(
                F.col("ss_resid").cast("double"),
                F.col("ss_total").cast("double"),
            )
        ).alias("strength"),
    )


def seasonal_envelope(
    df: DataFrame,
    series_cols: list[str],
    quantiles: list[float] | None = None,
    value_col: str = "value",
    ts_col: str = "ts",
    period_ms: int = 86_400_000,
    phase_ms: int = 3_600_000,
) -> DataFrame:
    """Seasonal percentile envelope per series: exact R-6 percentiles of
    the bucket values grouped by phase-of-period (hour-of-day by
    default) — the p10/p50/p90 band a seasonal-baseline alert
    (rolling.ewma / q156) draws around "normal for 3am", and the
    capacity-planning curve ("p90 load by hour") read straight off the
    data. seasonal_strength (above) says WHETHER the profile explains a
    series; this is the profile itself, with spread.

    Output: (series..., phase, quantile, n, pct) — long format, pct
    6-decimal.

    Exactness: the phase index is integer `div` (q182's boundary rule);
    ranks and interpolation run on 6-decimal-canonical values through
    operators/percentile.group_percentiles_r6, both-engine-pinned.

    Scale shape: one scan → per-(series, phase) rank windows — the
    partition holds one phase's BUCKETS (span/period_ms rows, e.g. 365
    for a year of daily periods), never raw datapoints, provided the
    input is bucketed (the module contract above).
    """
    from ticktock_spark.operators.percentile import group_percentiles_r6

    qs = quantiles if quantiles is not None else [10.0, 50.0, 90.0]
    phase = F.expr(
        f"CAST((({ts_col} % {int(period_ms)}) div {int(phase_ms)}) AS LONG)"
    )
    base = df.select(
        *series_cols, phase.alias("phase"), _q6(F.col(value_col)).alias("v")
    )
    out = group_percentiles_r6(base, [*series_cols, "phase"], "v", qs)
    return out.select(
        *series_cols, "phase", "quantile", "n", _q6(F.col("pct")).alias("pct")
    )
