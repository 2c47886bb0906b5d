"""Arrival/value summary statistics shared by the registry entries and
the `/api/analytics` endpoint — one implementation per statistic, the
discipline the Pearson machinery follows (`operators/correlate.py`):
q188/q189/q194 and op=fano/top_movers/histogram_quantile call THESE,
so the endpoint can never drift from the oracle-pinned spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

MIN_MS = 60_000
DAY_MS = 86_400_000


def _q6(c):
    return F.floor(c * F.lit(1_000_000.0) + F.lit(0.5)) / F.lit(1_000_000.0)


def fano_factor(
    df: DataFrame,
    series_cols: list[str],
    bucket_ms: int = MIN_MS,
    ts_col: str = "ts",
) -> DataFrame:
    """Index of dispersion of per-bucket event COUNTS over each series'
    active span (1.0 = Poisson, >1 bursty, <1 regular). Empty in-span
    buckets count as zeros WITHOUT a spine: they contribute nothing to
    Σc/Σc², so n = span/bucket + 1 from min/max alone — one scan, one
    bucket agg, one per-series reduction; exact DECIMAL(38) moments.

    Output: (series..., n_buckets, n_events, fano)."""
    b = df.groupBy(
        *series_cols,
        (F.col(ts_col) - F.col(ts_col) % F.lit(bucket_ms)).alias("b"),
    ).agg(F.count(F.lit(1)).alias("c"))
    dec = "decimal(38,0)"
    m = b.groupBy(*series_cols).agg(
        ((F.max("b") - F.min("b")) / F.lit(bucket_ms) + F.lit(1))
        .cast(dec)
        .alias("n"),
        F.sum(F.col("c").cast(dec)).alias("sc"),
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).alias("sc2"),
    )
    fano = (F.col("n") * F.col("sc2") - F.col("sc") * F.col("sc")).cast(
        "double"
    ) / (F.col("n") * F.col("sc")).cast("double")
    return m.filter(F.col("sc") > 0).select(
        *series_cols,
        F.col("n").cast("long").alias("n_buckets"),
        F.col("sc").cast("long").alias("n_events"),
        _q6(fano).alias("fano"),
    )


def daily_top_movers(
    df: DataFrame,
    series_cols: list[str],
    k: int = 3,
    ts_col: str = "ts",
    value_col: str = "value",
    day_ms: int = DAY_MS,
) -> DataFrame:
    """The ``k`` largest adjacent-day jumps of the exact-decimal daily
    mean per series (a gap day breaks the comparison rather than faking
    a jump). Daily means quantize to integer micro-units BEFORE the
    delta and the ranking, so |Δ| ordering is pure integer comparison.

    Output: (series..., ts [day], rank, prev_mean, mean, delta)."""
    day = (F.col(ts_col) - F.col(ts_col) % F.lit(day_ms)).alias("day")
    dd = df.groupBy(*series_cols, day).agg(
        F.floor(
            (
                F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            )
            * F.lit(1_000_000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("m")
    )
    w = W.partitionBy(*series_cols).orderBy("day")
    lagged = dd.select(
        *series_cols,
        "day",
        "m",
        F.lag("day").over(w).alias("pday"),
        F.lag("m").over(w).alias("pm"),
    ).filter(F.col("pday") == F.col("day") - F.lit(day_ms))
    ranked = lagged.withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy(*series_cols).orderBy(
                F.abs(F.col("m") - F.col("pm")).desc(), "day"
            )
        ),
    ).filter(F.col("rank") <= int(k))
    return ranked.select(
        *series_cols,
        F.col("day").alias("ts"),
        F.col("rank").cast("long").alias("rank"),
        (F.col("pm") / F.lit(1_000_000.0)).alias("prev_mean"),
        (F.col("m") / F.lit(1_000_000.0)).alias("mean"),
        ((F.col("m") - F.col("pm")) / F.lit(1_000_000.0)).alias("delta"),
    )


def value_histogram(
    df: DataFrame,
    series_cols: list[str],
    width: float = 10.0,
    value_col: str = "value",
) -> DataFrame:
    """Fixed-width value bins per series: (series..., bin, n) — the
    q174 aggregation, also the input shape of
    :func:`histogram_quantiles` (batch) and the state of
    `streaming/histogram.py` (live)."""
    return df.groupBy(
        *series_cols,
        F.floor(F.col(value_col) / F.lit(float(width)))
        .cast("long")
        .alias("bin"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def histogram_quantiles(
    hist: DataFrame,
    quantiles: list[float],
    width: float = 10.0,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Prometheus histogram_quantile semantics over a
    (group..., bin, n) histogram frame: cumulative counts + linear
    interpolation inside the landing bin — target = q·N, first bin with
    cum ≥ target, est = lo + width·(target − cum_prev)/c. Integer
    counts; the interpolation is four pinned IEEE ops, engine-exact.

    Output: (group..., q, n, est)."""
    groups = list(group_cols or ["metric"])
    cw = hist.select(
        *groups,
        "bin",
        F.col("n").alias("c"),
        F.sum("n").over(W.partitionBy(*groups).orderBy("bin")).alias("cum"),
        F.sum("n").over(W.partitionBy(*groups)).alias("nn"),
    )
    qs = hist.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    cand = cw.join(F.broadcast(qs), F.col("cum") >= F.col("q") * F.col("nn"))
    first = cand.groupBy(*groups, "q", "nn").agg(
        F.min_by(F.struct("bin", "c", "cum"), F.col("bin")).alias("s")
    )
    s = F.col("s")
    est = s["bin"] * F.lit(float(width)) + F.lit(float(width)) * (
        F.col("q") * F.col("nn") - (s["cum"] - s["c"])
    ) / s["c"]
    return first.select(
        *groups,
        "q",
        F.col("nn").cast("long").alias("n"),
        _q6(est).alias("est"),
    )
