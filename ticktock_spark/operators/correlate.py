"""Series correlation operators: exact-integer Pearson machinery.

Shared discipline (established by q167/q168 and `operators/drift.py`):
bucket means are exact DECIMAL sums; values enter the correlation as
rounded integer micro-units; every moment (n, Σx, Σy, Σxy, Σx², Σy²)
accumulates in DECIMAL(38,0) — order-free, so Spark's partial
aggregation matches any sequential engine bit-for-bit; the final r is
a handful of IEEE double ops in pinned order. Zero-variance series
yield NULL (try_divide / NULLIF on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _q6(c):
    return F.floor(c * F.lit(1_000_000.0) + F.lit(0.5)) / F.lit(1_000_000.0)


def _r_from_moments(s: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., n, sx, sy, sxy, sxx, syy) DECIMAL(38,0) moments →
    (group..., n, pearson_r): the pinned-order final double arithmetic
    shared by every Pearson producer (pair-row and wide-moment forms
    must agree bit-for-bit, so they share this tail)."""
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        _q6(F.try_divide(num, F.sqrt(denx) * F.sqrt(deny))).alias("pearson_r"),
    )


def pearson_moments(jd: DataFrame, group_cols: list[str]) -> DataFrame:
    """(x, y) integer micro-unit pairs → (group..., n, pearson_r)."""
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    g = jd.groupBy(*group_cols) if group_cols else jd.groupBy()
    s = g.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    return _r_from_moments(s, group_cols)


def acf(
    df: DataFrame,
    series_cols: list[str],
    max_lag: int,
    bucket_ms: int,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Autocorrelation function per series: exact Pearson between the
    bucketed series and itself shifted by 1..``max_lag`` buckets — the
    seasonality/memory fingerprint read before choosing EWMA alphas,
    rollup grains, or forecast horizons (a spike at lag 1440 on 1m
    buckets = daily cycle). The self-join twin of the q168 lead-lag
    profile, same integer-moment machinery.

    ``df`` must already be bucketed to ``bucket_ms`` spacing with one
    row per (series, bucket) (e.g. a downsample/bucket-mean frame);
    alignment is exact-timestamp (missing buckets simply drop pairs —
    the engine's no-interpolation rule).

    Output: (series..., lag, n, pearson_r), one row per series × lag
    with ≥1 aligned pair.

    Scale shape: one range-frame window pass over the (series, ts) sort
    — for each lag k the frame [k·bucket, k·bucket] FOLLOWING holds
    exactly the aligned partner bucket (or nothing), so no self-join, no
    lag fan-out shuffle, and the bucket frame is computed ONCE (as a
    self-join of a derived frame it was computed twice). All 2·max_lag
    frames share one partition/order spec = one WindowExec, one sort;
    the per-lag moments then aggregate in the SAME groupBy(series) —
    which reuses the window's hash partitioning, no further exchange —
    and only the |series|-row moment frame is unpivoted to (series,
    lag) rows. Window partitions are per-series at bucket scale
    (time-range / bucket_ms rows), the same bound q171's changepoint
    windows carry — not raw-event cardinality.
    """
    from pyspark.sql import Window

    micro = F.floor(F.col(value_col) * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    base = df.select(*series_cols, F.col(ts_col).alias("ts"), micro.alias("x"))
    # For each lag: y = the partner bucket's x, present = does that
    # bucket exist. The pair (x, y) must be kept whenever the partner
    # ROW exists even if its value is NULL (the join version counted
    # such pairs in n while the sums skipped the NULL), so presence is
    # a count over the frame, not y IS NOT NULL. One row per (series,
    # bucket) is the operator's documented precondition — under it the
    # frame holds at most one row and max(x) IS that row's x.
    w = Window.partitionBy(*series_cols).orderBy("ts")
    proj = [*series_cols, F.col("x")]
    for k in range(1, int(max_lag) + 1):
        fr = w.rangeBetween(k * int(bucket_ms), k * int(bucket_ms))
        proj.append(F.max("x").over(fr).alias(f"__y{k}"))
        proj.append(F.count(F.lit(1)).over(fr).alias(f"__c{k}"))
    wide = base.select(*proj)
    # Per-lag moments inline (no pair-row explode): each sum matches the
    # pair-table aggregate exactly — n counts rows whose partner row
    # EXISTS (__c >= 1, value NULLs included, same as count(1) over join
    # rows); the value sums skip NULLs on their own (a guarded `x` is
    # NULL when x is NULL; y/x·y/y² are NULL when either side is),
    # which is precisely F.sum's NULL-skip over the pair rows. All in
    # DECIMAL(38,0) like pearson_moments, order-free under partial agg.
    dec38 = "decimal(38,0)"
    aggs = []
    for k in range(1, int(max_lag) + 1):
        present = F.col(f"__c{k}") >= 1
        xk = F.when(present, F.col("x")).cast(dec38)
        yk = F.col(f"__y{k}").cast(dec38)
        aggs += [
            F.sum(F.when(present, F.lit(1))).cast(dec38).alias(f"n{k}"),
            F.sum(xk).alias(f"sx{k}"),
            F.sum(yk).alias(f"sy{k}"),
            F.sum(xk * yk).alias(f"sxy{k}"),
            F.sum(xk * xk).alias(f"sxx{k}"),
            F.sum(yk * yk).alias(f"syy{k}"),
        ]
    mom = wide.groupBy(*series_cols).agg(*aggs)
    stacked = mom.select(
        *series_cols,
        F.expr(
            "stack({}, {}) AS (lag, n, sx, sy, sxy, sxx, syy)".format(
                int(max_lag),
                ", ".join(
                    f"CAST({k} AS INT), n{k}, sx{k}, sy{k}, sxy{k}, "
                    f"sxx{k}, syy{k}"
                    for k in range(1, int(max_lag) + 1)
                ),
            )
        ),
    ).filter(F.col("n") > 0)  # a (series, lag) group exists iff >=1 pair
    return _r_from_moments(stacked, [*series_cols, "lag"])


def trend(
    df: DataFrame,
    series_cols: list[str],
    bucket_ms: int,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-series least-squares linear trend over a bucketed series —
    the capacity-forecast primitive ("at this slope, disk is full in N
    days"). x is the integer bucket index from each series' own first
    bucket (so moments stay small and the slope reads as value-units
    per bucket); y is the micro-unit value.

    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), intercept = (Σy − m·Σx)/n,
    every moment exact DECIMAL(38,0) (order-free under partial agg),
    final arithmetic a pinned sequence of double ops, q6-canonicalized
    — the q167 discipline applied to regression. Series with one bucket
    (or zero x-variance) yield NULL slope/intercept.

    Output: (series..., n, slope, intercept, pearson_r).

    Scale shape: one window-min per series (same exchange as the agg)
    + one aggregation; no joins, no collection.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*series_cols)
    base = df.select(
        *series_cols,
        ((F.col(ts_col) - F.min(ts_col).over(w)) / F.lit(int(bucket_ms)))
        .cast("long")
        .alias("x"),
        F.floor(F.col(value_col) * F.lit(1_000_000.0) + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    s = base.groupBy(*series_cols).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope_micro = F.try_divide(num, denx)
    intercept_micro = (
        F.col("sy").cast("double") - slope_micro * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        *series_cols,
        F.col("n").cast("long").alias("n"),
        _q6(slope_micro / F.lit(1_000_000.0)).alias("slope"),
        _q6(intercept_micro / F.lit(1_000_000.0)).alias("intercept"),
        _q6(F.try_divide(num, F.sqrt(denx) * F.sqrt(deny))).alias("pearson_r"),
    )
