"""as-of join operator edge cases (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ticktock_spark.operators.asof import asof_join


def _collect(df):
    return {
        r["id"]: (r["v"], r["right_ts"]) for r in df.collect()
    }


def test_asof_basic_inclusive_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 1, 2), (2, 1, 5), (3, 1, 10), (4, 2, 7)], "id long, k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 5, 0.5), (1, 9, 0.9), (2, 8, 0.8)], "k long, ts long, v double"
    )
    got = _collect(asof_join(left, right, ["k"], ["v"], ts_col="ts"))
    assert got[1] == (None, None)          # before any right row
    assert got[2] == (0.5, 5)              # equal ts matches (inclusive)
    assert got[3] == (0.9, 9)              # latest prior, not first
    assert got[4] == (None, None)          # right row is in the future


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, 1, 100), (2, 1, 200)], "id long, k long, ts long")
    right = spark.createDataFrame([(1, 95, 1.0)], "k long, ts long, v double")
    got = _collect(asof_join(left, right, ["k"], ["v"], ts_col="ts", tolerance=10))
    assert got[1] == (1.0, 95)
    assert got[2] == (None, None)          # 105 > 10 away


def test_asof_duplicate_right_ts_last_wins(spark):
    left = spark.createDataFrame([(1, 1, 10)], "id long, k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 1.0, 1), (1, 10, 2.0, 2), (1, 10, 0.5, 0)],
        "k long, ts long, v double, seq long",
    )
    got = _collect(asof_join(left, right, ["k"], ["v"], ts_col="ts", seq_col="seq"))
    assert got[1] == (2.0, 10)             # highest seq among equal ts wins


def test_asof_partition_invariance(spark):
    rows = [(i, i % 3, i * 7 % 100) for i in range(60)]
    left = spark.createDataFrame(rows, "id long, k long, ts long")
    right = spark.createDataFrame(
        [(k, t, float(k * 100 + t)) for k in range(3) for t in range(0, 100, 9)],
        "k long, ts long, v double",
    )
    a = _collect(asof_join(left, right, ["k"], ["v"], ts_col="ts"))
    b = _collect(
        asof_join(left.repartition(13), right.repartition(7), ["k"], ["v"], ts_col="ts")
    )
    assert a == b and len(a) == 60


def test_asof_value_col_collision_rejected(spark):
    left = spark.createDataFrame([(1, 1, 10, 0.0)], "id long, k long, ts long, v double")
    right = spark.createDataFrame([(1, 5, 1.0)], "k long, ts long, v double")
    try:
        asof_join(left, right, ["k"], ["v"], ts_col="ts")
    except ValueError as e:
        assert "collide" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_asof_single_shuffle_plan(spark):
    """The plan must contain exactly ONE exchange (the key shuffle) —
    the union + window formulation never broadcasts or re-shuffles."""
    left = spark.createDataFrame([(1, 1, 10)], "id long, k long, ts long")
    right = spark.createDataFrame([(1, 5, 1.0)], "k long, ts long, v double")
    plan = asof_join(left, right, ["k"], ["v"], ts_col="ts")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
