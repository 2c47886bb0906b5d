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
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        _q6(F.try_divide(num, F.sqrt(denx) * F.sqrt(deny))).alias("pearson_r"),
    )


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

    Scale shape: the lag fan-out is a broadcast ``max_lag``-row literal
    cross join; the aligned self-join is one shuffle on (series, ts) at
    bucket scale — no per-series collection, no window state.
    """
    micro = F.floor(F.col(value_col) * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    base = df.select(*series_cols, F.col(ts_col).alias("ts"), micro.alias("x"))
    lags = df.sparkSession.range(1, int(max_lag) + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    # equi-join on (series, shifted ts): hash join at bucket scale — the
    # lag condition must be a join KEY, not a post-cartesian filter
    expanded = base.crossJoin(F.broadcast(lags)).withColumn(
        "__tts",
        F.col("ts") + F.col("lag").cast("long") * F.lit(int(bucket_ms)),
    )
    shifted = base.select(
        *[F.col(c).alias(f"__r_{c}") for c in series_cols],
        F.col("ts").alias("__ots"),
        F.col("x").alias("y"),
    )
    cond = [expanded[c] == shifted[f"__r_{c}"] for c in series_cols]
    cond.append(expanded["__tts"] == shifted["__ots"])
    jd = expanded.join(shifted, cond)
    return pearson_moments(jd, [*series_cols, "lag"])


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
