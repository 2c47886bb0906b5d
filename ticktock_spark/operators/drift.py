"""Distribution-drift tests over numeric columns.

The data-quality twin of pipeline/text.py's vocab_drift: did this
batch's VALUE distribution shift against the reference slice? Exact
two-sample Kolmogorov-Smirnov statistic, computed Spark-first:

    D = max over observed values v of |F_a(v) - F_b(v)|

Scale shape: the per-(value, side) counts aggregate first — the shuffle
carries one row per distinct value, not per input row — and the
cumulative window then runs over the DISTINCT-VALUE table. Exactness is
therefore affordable when the value domain is bounded (the driver's
2-decimal value contract, sensor readings, latencies rounded to ms);
for genuinely continuous unbounded columns, pre-quantize with round()
to the resolution you care about — the statistic is then exact for the
quantized distribution. The final window is a single partition of
distinct values by construction, the same vocab-bounded regime as
vocab_top_k's final stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ks_drift(
    df: DataFrame,
    side_a: Column,
    value_col: str = "value",
) -> DataFrame:
    """Exact two-sample KS statistic between the rows where ``side_a``
    holds and the rest (NULL side or NULL value rows are excluded).

    Returns one row: n_a, n_b, ks (6-decimal), ks_at (the smallest
    value where the gap is attained — the 'where did it drift' answer).
    """
    sided = df.select(
        F.col(value_col).alias("v"), side_a.alias("is_a")
    ).filter(F.col("v").isNotNull() & F.col("is_a").isNotNull())
    per_v = sided.groupBy("v").agg(
        F.count(F.when(F.col("is_a"), 1)).alias("na"),
        F.count(F.when(~F.col("is_a"), 1)).alias("nb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    cum = per_v.select(
        "v",
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
        F.sum("na").over(tot).alias("ta"),
        F.sum("nb").over(tot).alias("tb"),
    )
    # |F_a - F_b| as an exact INTEGER numerator |ca*tb - cb*ta| over the
    # common denominator ta*tb: the argmax ranking never touches a
    # float, so the attained-at value is engine-exact (decimal(38)
    # headroom covers counts to ~1e13 a side)
    dec = "decimal(38,0)"
    num = F.abs(
        F.col("ca").cast(dec) * F.col("tb").cast(dec)
        - F.col("cb").cast(dec) * F.col("ta").cast(dec)
    )
    ranked = cum.filter((F.col("ta") > 0) & (F.col("tb") > 0)).select(
        "v", "ta", "tb", num.alias("num")
    )
    best = ranked.orderBy(F.col("num").desc(), F.col("v").asc()).limit(1)
    ks = F.col("num").cast("double") / (
        F.col("ta").cast(dec) * F.col("tb").cast(dec)
    ).cast("double")
    return best.select(
        F.col("ta").cast("bigint").alias("n_a"),
        F.col("tb").cast("bigint").alias("n_b"),
        (F.floor(ks * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("ks"),
        F.col("v").alias("ks_at"),
    )
