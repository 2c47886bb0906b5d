"""Invariance properties of the robust operators — the algebra each
estimator promises, checked on deterministic pseudo-random series
(seeded; no hypothesis dependency needed for these fixed laws)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, functions as F

from ticktock_spark.operators.drift import wasserstein_drift
from ticktock_spark.operators.robust import (
    mad_outliers,
    seasonal_strength,
    theil_sen,
)

HOUR = 3_600_000


def _series(spark, values, metric="m"):
    return spark.createDataFrame(
        [Row(metric=metric, ts=i * HOUR, value=float(v))
         for i, v in enumerate(values)]
    )


def _vals(seed, n=48):
    rng = random.Random(seed)
    return [round(rng.uniform(0, 100), 2) for _ in range(n)]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_theilsen_translation_invariance(spark, seed):
    # slope(y + c) == slope(y): pairwise differences cancel the shift
    vals = _vals(seed)
    s1 = theil_sen(_series(spark, vals), ["metric"], HOUR).first()
    s2 = theil_sen(
        _series(spark, [v + 37.25 for v in vals]), ["metric"], HOUR
    ).first()
    assert s1["slope"] == s2["slope"]
    assert s1["n_pairs"] == s2["n_pairs"]


@pytest.mark.parametrize("seed", [1, 2])
def test_theilsen_scale_equivariance(spark, seed):
    # slope(4·y) == 4·slope(y) (exact: micro-units scale by an integer)
    vals = _vals(seed)
    s1 = theil_sen(_series(spark, vals), ["metric"], HOUR).first()
    s4 = theil_sen(
        _series(spark, [4 * v for v in vals]), ["metric"], HOUR
    ).first()
    assert s4["slope"] == pytest.approx(4 * s1["slope"], abs=4e-6)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_mad_translation_invariance(spark, seed):
    # shifting every value moves medians with it: same buckets flagged,
    # same scores (2-decimal shift stays on the micro grid exactly)
    vals = _vals(seed) + [500.0]  # ensure at least one outlier
    r1 = {r["ts"]: r["score"]
          for r in mad_outliers(_series(spark, vals), ["metric"]).collect()}
    r2 = {r["ts"]: r["score"]
          for r in mad_outliers(
              _series(spark, [v + 11.5 for v in vals]), ["metric"]
          ).collect()}
    assert r1 == r2 and len(r1) >= 1


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_wasserstein_symmetry(spark, seed):
    # W1(A, B) == W1(B, A): the integrand |F_a - F_b| is symmetric
    rng = random.Random(seed)
    rows = [Row(g="x", value=round(rng.uniform(0, 50), 2), a=rng.random() < 0.5)
            for _ in range(200)]
    df = spark.createDataFrame(rows)
    w_ab = wasserstein_drift(df, F.col("a"), group_cols=["g"]).first()
    w_ba = wasserstein_drift(df, ~F.col("a"), group_cols=["g"]).first()
    assert w_ab["w1"] == w_ba["w1"]
    assert (w_ab["n_a"], w_ab["n_b"]) == (w_ba["n_b"], w_ba["n_a"])


def test_wasserstein_translation_covariance(spark):
    # shifting ONE side by d makes W1 >= ... and for identical sides
    # exactly d (mass 1 moved distance d)
    rows = [Row(g="x", value=float(v), a=True) for v in [3, 7, 11]] + [
        Row(g="x", value=float(v + 2.5), a=False) for v in [3, 7, 11]
    ]
    out = wasserstein_drift(
        spark.createDataFrame(rows), F.col("a"), group_cols=["g"]
    ).first()
    assert out["w1"] == pytest.approx(2.5, abs=1e-6)


@pytest.mark.parametrize("seed", [1, 2])
def test_seasonal_strength_translation_invariance(spark, seed):
    # adding a constant moves every phase mean AND the grand mean:
    # both sums of squares are unchanged
    rng = random.Random(seed)
    rows, rows_shift = [], []
    for d in range(3):
        for h in range(24):
            v = round((h % 6) * 3 + rng.uniform(0, 2), 2)
            ts = (d * 24 + h) * HOUR
            rows.append(Row(metric="m", ts=ts, value=v))
            rows_shift.append(Row(metric="m", ts=ts, value=v + 40.25))
    s1 = seasonal_strength(spark.createDataFrame(rows), ["metric"]).first()
    s2 = seasonal_strength(
        spark.createDataFrame(rows_shift), ["metric"]
    ).first()
    assert s1["strength"] == s2["strength"]
    assert s1["strength"] is not None and 0 < s1["strength"] < 1
