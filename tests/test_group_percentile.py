"""group_percentiles_r6 (rank + two-row interpolation, no arrays) must
agree exactly with percentile_r6_on_array (the TSDB downsample path) —
two independent implementations of aggregate.cpp:341-387."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from ticktock_spark.operators.downsample import percentile_r6_on_array
from ticktock_spark.operators.percentile import group_percentiles_r6

QS = [0.0, 10.0, 25.0, 50.0, 75.0, 95.0, 99.9, 100.0]


@pytest.mark.parametrize("seed", [0, 1])
def test_group_percentiles_match_array_path(spark, seed):
    rng = random.Random(seed)
    rows = []
    # group sizes 1, 2, 3 and larger — exercise every R-6 clamp branch
    for g, size in enumerate([1, 2, 3, 7, 40, 101]):
        rows += [(g, round(rng.uniform(-50, 150), 3)) for _ in range(size)]
    df = spark.createDataFrame(rows, "g int, v double")

    got = {
        (r["g"], r["quantile"]): (r["pct"], r["n"])
        for r in group_percentiles_r6(df, ["g"], "v", QS).collect()
    }

    arr = df.groupBy("g").agg(F.sort_array(F.collect_list("v")).alias("vals"))
    for q in QS:
        for r in arr.select(
            "g", percentile_r6_on_array(F.col("vals"), q).alias("pct"),
            F.size("vals").alias("n"),
        ).collect():
            pct, n = got[(r["g"], q)]
            assert n == r["n"]
            assert pct == r["pct"], (r["g"], q, pct, r["pct"])
