"""Golden percentile fixture from the reference's C++ unit test.

`test/agg_test.cpp:29-76`: two series
  A = {(1569859300000, 26.878908), (1569859310000, 0.0)}
  B = {(1569859300000, 0.0),       (1569859310000, 0.0)}
aggregated per-timestamp: p50@t1 = 13.439454 (midpoint, R-6 idx=q*(n+1));
p75/p90/p95/p99/p999@t1 = 26.878908; everything @t2 = 0.0.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ticktock_spark.operators.aggregate import aggregate_across_series

T1, T2 = 1569859300000, 1569859310000
V = 26.878908

ROWS = [
    ("m", "A", T1, V),
    ("m", "A", T2, 0.0),
    ("m", "B", T1, 0.0),
    ("m", "B", T2, 0.0),
]

EXPECTED = {
    "p50": {T1: 13.439454, T2: 0.0},
    "p75": {T1: V, T2: 0.0},
    "p90": {T1: V, T2: 0.0},
    "p95": {T1: V, T2: 0.0},
    "p99": {T1: V, T2: 0.0},
    "p999": {T1: V, T2: 0.0},
}


@pytest.mark.parametrize("func", sorted(EXPECTED))
def test_percentile_golden(spark, func):
    df = spark.createDataFrame(ROWS, ["metric", "series", "ts", "value"])
    out = aggregate_across_series(df, ["metric"], func)
    got = {r["ts"]: r["value"] for r in out.collect()}
    for ts, exp in EXPECTED[func].items():
        assert math.isclose(got[ts], exp, rel_tol=1e-9), (func, ts, got[ts], exp)


def test_percentile_single_value(spark):
    df = spark.createDataFrame([("m", "A", T1, 42.5)], ["metric", "series", "ts", "value"])
    out = aggregate_across_series(df, ["metric"], "p99")
    assert out.collect()[0]["value"] == 42.5


def test_percentile_skips_nan_inf(spark):
    rows = [("m", "A", T1, 1.0), ("m", "B", T1, float("nan")), ("m", "C", T1, float("inf")), ("m", "D", T1, 3.0)]
    df = spark.createDataFrame(rows, ["metric", "series", "ts", "value"])
    out = aggregate_across_series(df, ["metric"], "p50")
    # n=2 finite values [1,3]; idx=0.5*3=1.5 → 1 + 0.5*(3-1) = 2.0
    assert out.collect()[0]["value"] == 2.0


def test_percentile_r6_distributed_matches_array(spark):
    """The mega-bucket-safe distributed-selection percentile must be
    value-equal to the collect_list path for every quantile shape
    (interp, idx<1 clamp, idx>=n clamp, single value, all-non-finite
    group -> NaN) on randomized groups, for both bucketed and 0all."""
    import math
    import random

    from ticktock_spark.operators.downsample import (
        downsample,
        percentile_r6_distributed,
    )

    rng = random.Random(11)
    rows = []
    for s in range(6):
        for _ in range(rng.randint(1, 300)):
            rows.append((f"m{s}", rng.randrange(0, 3_600_000), rng.uniform(-50, 150)))
    rows.append(("tiny", 1, 42.0))            # n == 1
    rows.append(("allnan", 5, float("nan")))  # all-non-finite group
    rows.append(("allnan", 6, float("inf")))
    df = spark.createDataFrame(rows, "metric string, ts long, value double")

    def canon(rows_):
        return {
            (m, t, "NaN" if (v is not None and math.isnan(v)) else v)
            for m, t, v in (tuple(r) for r in rows_)
        }

    for func, q in (("p95", 95.0), ("p50", 50.0), ("p999", 99.9)):
        for interval in (0, 600_000):
            a = canon(downsample(df, ["metric"], interval, func).collect())
            b = canon(
                percentile_r6_distributed(df, ["metric"], q, interval).collect()
            )
            assert a == b, (func, interval)


def test_percentile_approx_downsample_bound(spark):
    """The GK-sketch tier returns an actual data value whose rank is
    within n/accuracy of the target — on data with distinct values that
    pins it between the exact neighbors of the R-6 index."""
    import random

    from ticktock_spark.operators.downsample import (
        downsample,
        percentile_approx_downsample,
    )

    rng = random.Random(3)
    rows = [("m", rng.randrange(0, 600_000), rng.uniform(0, 1000)) for _ in range(5000)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    exact = downsample(df, ["metric"], 0, "p95").collect()[0]["value"]
    approx = percentile_approx_downsample(df, ["metric"], 95.0).collect()[0]["value"]
    vals = sorted(v for _, _, v in rows)
    n = len(vals)
    # high accuracy -> rank error <= ~1; allow a small window around p95
    k = int(0.95 * (n + 1))
    window = vals[k - 5 : k + 5]
    assert min(window) <= approx <= max(window)
    assert abs(approx - exact) <= (max(window) - min(window)) + 1e-9
