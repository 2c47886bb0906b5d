"""Distributed EXACT group percentiles (R-6 / OpenTSDB rule) without
per-group arrays.

The TSDB downsample path computes percentiles on collect_list arrays —
bounded by a time bucket's population, fine there. For corpus-scale
groups (a percentile of quality over 10^10 English docs) an array per
group is a straight OOM, and approx_percentile changes the answer.

This operator gets the exact R-6 result with sort + two-row lookup:
rank each value in its group (sort-based window, spills fine), derive
the one or two ranks the R-6 index touches — lo = floor(idx), hi =
lo + 1 — keep ONLY those rows, and interpolate after a tiny
aggregation. Work is one sort-shuffle of the raw values, memory is
O(1) per row; the explode over quantiles happens in the same stage as
the rank filter, so the blow-up never reaches a shuffle.

Semantics match operators/downsample.percentile_r6_on_array
(`src/agg/aggregate.cpp:341-387`): idx = p·(n+1), clamp to [v1, vn],
n==1 → the value, linear interpolation between ranks otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def group_percentiles_r6(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float],
) -> DataFrame:
    """→ one row per (group, quantile): exact R-6 percentile.

    Output columns: group_cols + [quantile, n, pct]. Ties in the value
    order are interchangeable (equal values interpolate to themselves).
    """
    if not quantiles:
        raise ValueError("need at least one quantile")
    wg = Window.partitionBy(*group_cols)
    base = df.select(*group_cols, F.col(value_col).cast("double").alias("__v")).select(
        "*",
        F.row_number().over(wg.orderBy("__v")).alias("__rn"),
        F.count(F.lit(1)).over(wg).alias("__n"),
    )
    e = base.select(
        *group_cols,
        "__v",
        "__rn",
        "__n",
        F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("quantile"),
    )
    p = F.col("quantile") / F.lit(100.0)
    n = F.col("__n")
    idx = (
        F.when(p <= 0.0, F.lit(0.0))
        .when(p >= 1.0, n.cast("double"))
        .otherwise(p * (n + F.lit(1)).cast("double"))
    )
    i = F.floor(idx)
    edge_lo = (idx < 1.0) | (n == 1)
    edge_hi = idx >= n.cast("double")
    lo = F.when(edge_lo, F.lit(1)).when(edge_hi, n).otherwise(i.cast("int"))
    hi = F.when(edge_lo, F.lit(1)).when(edge_hi, n).otherwise(i.cast("int") + 1)
    frac = F.when(edge_lo | edge_hi, F.lit(0.0)).otherwise(idx - i)
    keep = e.select(
        *group_cols,
        "quantile",
        "__v",
        "__rn",
        "__n",
        lo.alias("__lo"),
        hi.alias("__hi"),
        frac.alias("__frac"),
    ).filter((F.col("__rn") == F.col("__lo")) | (F.col("__rn") == F.col("__hi")))
    agg = keep.groupBy(*group_cols, "quantile").agg(
        F.min(F.when(F.col("__rn") == F.col("__lo"), F.col("__v"))).alias("__vlo"),
        F.min(F.when(F.col("__rn") == F.col("__hi"), F.col("__v"))).alias("__vhi"),
        F.first("__frac").alias("__f"),
        F.first("__n").alias("n"),
    )
    pct = F.col("__vlo") + F.col("__f") * (F.col("__vhi") - F.col("__vlo"))
    return agg.select(*group_cols, "quantile", "n", pct.alias("pct"))
