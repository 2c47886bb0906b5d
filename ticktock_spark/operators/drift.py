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


def categorical_drift(
    df: DataFrame,
    side_a: Column,
    cat_col: str,
) -> DataFrame:
    """Categorical-distribution drift between the ``side_a`` slice and
    the rest: Pearson chi-square statistic (homogeneity test, observed
    vs expected under the pooled distribution) and the Population
    Stability Index Σ (p_a - p_b) ln(p_a / p_b) with add-one smoothing
    (so empty cells on either side stay finite).

    One row out: n_a, n_b, n_categories, chi2, psi (both 6-decimal).
    Scale shape: one conditional-count aggregate per category (shuffle
    bounded by category cardinality), then a category-count-sized
    reduction. NULL category or NULL side rows are excluded.
    """
    sided = df.select(F.col(cat_col).alias("c"), side_a.alias("is_a")).filter(
        F.col("c").isNotNull() & F.col("is_a").isNotNull()
    )
    per_c = sided.groupBy("c").agg(
        F.count(F.when(F.col("is_a"), 1)).alias("na"),
        F.count(F.when(~F.col("is_a"), 1)).alias("nb"),
    )
    tot = Window.partitionBy()
    k = F.count(F.lit(1)).over(tot)
    with_tot = per_c.select(
        "c", "na", "nb",
        F.sum("na").over(tot).alias("ta"),
        F.sum("nb").over(tot).alias("tb"),
        k.alias("k"),
    )
    n = (F.col("ta") + F.col("tb")).cast("double")
    # chi2 (homogeneity): expected_a = (na+nb) * ta/n per cell
    ea = (F.col("na") + F.col("nb")).cast("double") * F.col("ta").cast("double") / n
    eb = (F.col("na") + F.col("nb")).cast("double") * F.col("tb").cast("double") / n
    cell = (F.col("na").cast("double") - ea) * (
        F.col("na").cast("double") - ea
    ) / ea + (F.col("nb").cast("double") - eb) * (F.col("nb").cast("double") - eb) / eb
    # PSI with add-one smoothing over k categories
    pa = (F.col("na").cast("double") + F.lit(1.0)) / (
        F.col("ta").cast("double") + F.col("k").cast("double")
    )
    pb = (F.col("nb").cast("double") + F.lit(1.0)) / (
        F.col("tb").cast("double") + F.col("k").cast("double")
    )
    psi_cell = (pa - pb) * (F.log(pa) - F.log(pb))
    agg = with_tot.select(
        "ta", "tb", "k", cell.alias("cell"), psi_cell.alias("psic")
    ).groupBy("ta", "tb", "k").agg(
        F.sum("cell").alias("chi2"), F.sum("psic").alias("psi")
    )
    q6 = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return agg.select(
        F.col("ta").cast("bigint").alias("n_a"),
        F.col("tb").cast("bigint").alias("n_b"),
        F.col("k").cast("bigint").alias("n_categories"),
        q6(F.col("chi2")).alias("chi2"),
        q6(F.col("psi")).alias("psi"),
    )


def embedding_drift(
    df: DataFrame,
    side_a: Column,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space drift between the ``side_a`` slice and the rest:
    cosine similarity and L2 distance between the two slices' MEAN
    vectors (the centroid shift a re-embedded or re-crawled corpus
    shows first), plus the per-side counts.

    Completes the drift family's modality coverage: ks_drift (numeric),
    categorical_drift (categorical), vocab_drift (tokens), this
    (embeddings).

    Scale shape: posexplode → per-(dimension, side) mean — the shuffle
    is dimension-bounded (dim × 2 rows out) with map-side partial
    aggregation — then a dimension-count reduction to one row. NULL
    side or NULL vector rows are excluded.
    """
    sided = df.select(F.col(vec_col).alias("e"), side_a.alias("is_a")).filter(
        F.col("e").isNotNull() & F.col("is_a").isNotNull()
    )
    ex = sided.select("is_a", F.posexplode("e").alias("pos", "x"))
    per_dim = ex.groupBy("pos").agg(
        F.avg(F.when(F.col("is_a"), F.col("x").cast("double"))).alias("ma"),
        F.avg(F.when(~F.col("is_a"), F.col("x").cast("double"))).alias("mb"),
    )
    counts = sided.groupBy().agg(
        F.count(F.when(F.col("is_a"), 1)).alias("n_a"),
        F.count(F.when(~F.col("is_a"), 1)).alias("n_b"),
    )
    red = per_dim.groupBy().agg(
        F.sum(F.col("ma") * F.col("mb")).alias("dot"),
        F.sum(F.col("ma") * F.col("ma")).alias("na2"),
        F.sum(F.col("mb") * F.col("mb")).alias("nb2"),
        F.sum(
            (F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))
        ).alias("d2"),
    )
    q6 = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return counts.crossJoin(red).select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        q6(
            F.col("dot") / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2")))
        ).alias("centroid_cosine"),
        q6(F.sqrt(F.col("d2"))).alias("centroid_l2"),
    )


def wasserstein_drift(
    df: DataFrame,
    side_a: Column,
    value_col: str = "value",
    group_cols: list[str] | None = None,
    value_scale: int = 100,
) -> DataFrame:
    """Exact two-sample 1-Wasserstein (earth-mover) distance between the
    ``side_a`` slice and the rest: W1 = ∫|F_a(v) − F_b(v)| dv — the
    magnitude-aware complement of ``ks_drift`` (KS says the CDFs differ
    somewhere; W1 says by how much value-mass moved, in value units, so
    a 2× latency regression scores 2× a 1.01× one).

    ``value_scale`` is the input's decimal resolution (100 = the
    driver's 2-decimal value contract): values are snapped to that
    integer grid, making every term exact — per-value counts, integer
    CDF numerators |ca·tb − cb·ta|, integer grid gaps — accumulated in
    DECIMAL(38,0) and divided out once at the end. Bit-identical across
    engines and aggregation orders, like ks_drift.

    One row per group: n_a, n_b, w1 (6-decimal, value units).

    Scale shape: identical to ks_drift — the shuffle carries one row
    per distinct (group, value); the cumulative window runs over the
    distinct-value table, vocab-bounded for quantized domains.
    """
    groups = list(group_cols or [])
    v_int = F.floor(
        F.col(value_col).cast("double") * F.lit(float(value_scale)) + F.lit(0.5)
    ).cast("long")
    sided = df.select(
        *groups, v_int.alias("v"), side_a.alias("is_a")
    ).filter(F.col("v").isNotNull() & F.col("is_a").isNotNull())
    per_v = sided.groupBy(*groups, "v").agg(
        F.count(F.when(F.col("is_a"), 1)).alias("na"),
        F.count(F.when(~F.col("is_a"), 1)).alias("nb"),
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(*groups)
    lead = Window.partitionBy(*groups).orderBy("v")
    cum = per_v.select(
        *groups,
        "v",
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
        F.sum("na").over(tot).alias("ta"),
        F.sum("nb").over(tot).alias("tb"),
        (F.lead("v").over(lead) - F.col("v")).alias("gap"),
    )
    dec = "decimal(38,0)"
    num = F.abs(
        F.col("ca").cast(dec) * F.col("tb").cast(dec)
        - F.col("cb").cast(dec) * F.col("ta").cast(dec)
    )
    # the last distinct value per group has no successor (gap NULL);
    # coalesce it to a zero-width term instead of filtering the row, so
    # a group whose rows all share ONE distinct value still surfaces
    # (w1 = 0 with its n_a/n_b) rather than silently vanishing from the
    # drift report
    terms = cum.filter((F.col("ta") > 0) & (F.col("tb") > 0)).select(
        *groups,
        "ta",
        "tb",
        (num * F.coalesce(F.col("gap"), F.lit(0)).cast(dec)).alias("term"),
    )
    agg = terms.groupBy(*groups, "ta", "tb").agg(F.sum("term").alias("s"))
    q6 = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    w1 = F.col("s").cast("double") / (
        (F.col("ta").cast(dec) * F.col("tb").cast(dec)).cast("double")
        * F.lit(float(value_scale))
    )
    return agg.select(
        *groups,
        F.col("ta").cast("bigint").alias("n_a"),
        F.col("tb").cast("bigint").alias("n_b"),
        q6(w1).alias("w1"),
    )
