"""Cross-series aggregation (the OpenTSDB "aggregator").

Reference: `src/agg/aggregate.cpp:140-215` — after per-series downsampling,
series that agree on all grouping-tag values collapse into one result set;
values merge PER EXACT TIMESTAMP (no interpolation, deliberately unlike
OpenTSDB — `test/int_test3.py:1110-1114`). Tags whose values vary within a
group are dropped and listed in ``aggregateTags``
(`src/core/query.cpp:505-554,1683-1738`).

In Spark this is a second hash aggregation keyed on
(grouping tags, ts). Functions: avg count dev max min pNN sum none
(`aggregate.cpp:33-36`); `first`/`last` are downsample-only (create() has
no case for them and throws). ``dev`` here is Welford with the SAMPLE
divisor (n-1) unlike the downsampler's population dev — `aggregate.cpp:
263-294` keeps `stdev = sqrt(m2/(count-1))`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ticktock_spark.operators.downsample import parse_quantile, percentile_r6_on_array, _finite

AGGREGATORS = (
    "avg,count,dev,max,min,none,p50,p75,p90,p95,p99,p999,sum,"
    "top1,top3,top5,top9,bottom1,bottom3,bottom5,bottom9"
).split(",")


def aggregator_expr(func: str, value_col: str = "value") -> Column:
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
        # sample stddev (m2/(n-1)), NaN/Inf skipped (aggregate.cpp:263-294);
        # single point → stddev undefined → 0.0 in reference
        return F.coalesce(F.stddev_samp(_finite(v)), F.lit(0.0))
    raise ValueError(f"unknown aggregator: {func!r}")


def aggregate_across_series(
    df: DataFrame,
    group_cols: list[str],
    func: str,
    value_col: str = "value",
    ts_col: str = "ts",
    out_col: str = "value",
) -> DataFrame:
    """Merge series onto (group_cols, ts) with aggregator ``func``.

    ``none`` keeps every series separate (caller groups by the full series
    key instead). Alignment is exact-timestamp: rows only combine when ts
    is identical — run downsample first to align buckets.
    """
    if func == "none":
        return df
    return df.groupBy(*group_cols, ts_col).agg(aggregator_expr(func, value_col).alias(out_col))


def aggregate_tags(
    df: DataFrame,
    tags_col: str,
    group_keys: list[str],
) -> DataFrame:
    """Compute ``aggregateTags`` per result group: tag keys whose values
    vary within the group (`src/core/query.cpp:1683-1738`).

    Input: one row per series with a map column; output: group_keys +
    ``aggregateTags`` array<string>.
    """
    exploded = df.select(*group_keys, F.explode(tags_col).alias("k", "v"))
    per_key = exploded.groupBy(*group_keys, "k").agg(
        F.countDistinct("v").alias("nv")
    )
    return (
        per_key.withColumn("agg_tag", F.when(F.col("nv") > 1, F.col("k")))
        .groupBy(*group_keys)
        .agg(F.sort_array(F.collect_list("agg_tag")).alias("aggregateTags"))
    )
