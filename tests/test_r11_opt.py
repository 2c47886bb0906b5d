"""Round-11 optimization parity tests: the rewritten hot paths must
produce byte-identical rows to the engines they replaced.

- theil_sen engine='arrow' (numpy pair kernel) vs engine='hof' (the
  pure-expression spec) — including NULL-value series and duplicate
  -bucket (equal-x) input;
- cosine_argmax_partials + global max_by vs cosine_scores + max_by
  (the q190 shape) — the per-block partial argmax must reduce to the
  same global winner under the (cosine, -vec_id) order.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, functions as F

from ticktock_spark.operators.robust import theil_sen
from ticktock_spark.pipeline import similarity as sim

HOUR = 3_600_000


def _collect_sorted(df):
    cols = df.columns
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def _theilsen_frame(spark, seed=1107, n_series=4, null_series=True):
    rng = random.Random(seed)
    rows = []
    for s in range(n_series):
        base = rng.uniform(-50, 50)
        slope = rng.uniform(-2, 2)
        nb = rng.randint(2, 60)
        for i in sorted(rng.sample(range(120), nb)):
            rows.append(
                Row(
                    metric=f"m{s}",
                    ts=i * HOUR,
                    value=base + slope * i + rng.uniform(-5, 5),
                )
            )
    if null_series:
        # all-NULL-value series: slope must come back NULL in both engines
        for i in range(6):
            rows.append(Row(metric="mnull", ts=i * HOUR, value=None))
    return spark.createDataFrame(rows, "metric string, ts long, value double")


def test_theilsen_arrow_matches_hof(spark):
    df = _theilsen_frame(spark)
    arrow = theil_sen(df, ["metric"], HOUR, engine="arrow")
    hof = theil_sen(df, ["metric"], HOUR, engine="hof")
    a, h = _collect_sorted(arrow), _collect_sorted(hof)
    assert a == h
    assert any(t[0] == "mnull" and t[3] is None for t in a)


def test_theilsen_arrow_matches_hof_duplicate_buckets(spark):
    # two rows land in one bucket: equal-x pairs must be skipped by both
    rows = [
        Row(metric="m", ts=0, value=1.0),
        Row(metric="m", ts=10, value=3.0),  # same bucket as ts=0
        Row(metric="m", ts=HOUR, value=2.0),
        Row(metric="m", ts=2 * HOUR, value=5.0),
    ]
    df = spark.createDataFrame(rows)
    assert _collect_sorted(
        theil_sen(df, ["metric"], HOUR, engine="arrow")
    ) == _collect_sorted(theil_sen(df, ["metric"], HOUR, engine="hof"))


def test_theilsen_arrow_single_bucket_dropped(spark):
    rows = [Row(metric="m", ts=0, value=1.0), Row(metric="m", ts=10, value=2.0)]
    df = spark.createDataFrame(rows)
    assert theil_sen(df, ["metric"], HOUR, engine="arrow").count() == 0


def test_theilsen_arrow_max_buckets_guard(spark):
    rows = [Row(metric="m", ts=i * HOUR, value=float(i)) for i in range(12)]
    df = spark.createDataFrame(rows)
    with pytest.raises(Exception, match="max_buckets"):
        theil_sen(df, ["metric"], HOUR, max_buckets=10, engine="arrow").collect()


def _emb_frame(spark, seed=42, n=90, dim=8, n_ties=12):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(dim)])
        )
    # exact twins: quantized-cosine ties that exercise the -vec_id tiebreak
    for i in range(n_ties):
        rows.append(Row(vec_id=n + i, embedding=list(rows[i]["embedding"])))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_argmax_partials_matches_full_scores(spark):
    e = _emb_frame(spark)
    q = e.select(F.col("vec_id").alias("query_id"), "embedding")
    agg = lambda scored: scored.groupBy("query_id").agg(  # noqa: E731
        F.max_by("vec_id", F.struct(F.col("cosine"), (-F.col("vec_id")))).alias(
            "vec_id"
        )
    )
    full = agg(sim.cosine_scores(e, q))
    partial = agg(sim.cosine_argmax_partials(e, q, min_parallelism=4))
    assert _collect_sorted(full) == _collect_sorted(partial)


def test_cosine_argmax_partials_rejects_string_ids(spark):
    e = spark.createDataFrame(
        [Row(vec_id="a", embedding=[1.0, 0.0])],
        "vec_id string, embedding array<float>",
    )
    q = e.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="integral id"):
        sim.cosine_argmax_partials(e, q)
