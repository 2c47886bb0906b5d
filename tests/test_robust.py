"""Semantic unit tests for operators/robust.py, wasserstein_drift, and
the round-8 corpus-gram statistics — handcrafted frames with known
answers (the oracle differential in test_oracle.py pins cross-engine
exactness; these pin the MATH)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from ticktock_spark.operators.drift import wasserstein_drift
from ticktock_spark.operators.robust import (
    mad_outliers,
    seasonal_strength,
    theil_sen,
)

HOUR = 3_600_000


def _series(spark, values, metric="m", bucket_ms=HOUR):
    return spark.createDataFrame(
        [Row(metric=metric, ts=i * bucket_ms, value=float(v))
         for i, v in enumerate(values)]
    )


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------

def test_mad_flags_only_the_spike(spark):
    # 20 quiet points around 10 ± 1, one wild spike
    vals = [10 + (i % 3) - 1 for i in range(20)] + [100.0]
    out = mad_outliers(_series(spark, vals), ["metric"]).collect()
    assert len(out) == 1
    assert out[0]["value"] == 100.0
    assert out[0]["score"] > 3.5


def test_mad_baseline_not_inflated_by_the_outlier(spark):
    # the classic z-score failure: with n=21 and a 100-point spike the
    # stddev blows up and plain z misses it; MAD must still flag it
    vals = [10 + (i % 3) - 1 for i in range(20)] + [100.0]
    df = _series(spark, vals)
    stats = df.agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sd")
    ).first()
    plain_z = abs(100.0 - stats["mu"]) / stats["sd"]
    mad_score = mad_outliers(df, ["metric"]).first()["score"]
    assert mad_score > plain_z  # robust score dominates the masked one


def test_mad_constant_series_yields_nothing(spark):
    out = mad_outliers(_series(spark, [5.0] * 10), ["metric"]).collect()
    assert out == []  # MAD = 0 → no finite scale → no rows


# ---------------------------------------------------------------------------
# theil_sen
# ---------------------------------------------------------------------------

def test_theilsen_exact_line(spark):
    # y = 3 + 2x → every pairwise slope is exactly 2
    out = theil_sen(
        _series(spark, [3 + 2 * i for i in range(10)]), ["metric"], HOUR
    ).first()
    assert out["n"] == 10
    assert out["n_pairs"] == 45
    assert out["slope"] == pytest.approx(2.0, abs=1e-6)


def test_theilsen_shrugs_off_an_outlier(spark):
    # one wrecked point: OLS slope moves visibly, Theil–Sen stays ~2
    vals = [3 + 2 * i for i in range(10)]
    vals[5] = 500
    df = _series(spark, vals)
    ts = theil_sen(df, ["metric"], HOUR).first()["slope"]
    from ticktock_spark.operators.correlate import trend

    ols = trend(df, ["metric"], bucket_ms=HOUR).first()["slope"]
    assert ts == pytest.approx(2.0, abs=0.1)
    assert abs(ols - 2.0) > 1.0


def test_theilsen_handles_missing_buckets(spark):
    # gaps in ts: x is the bucket INDEX from ts, not row number
    rows = [Row(metric="m", ts=t * HOUR, value=float(1 + 2 * t))
            for t in [0, 1, 5, 9]]
    out = theil_sen(spark.createDataFrame(rows), ["metric"], HOUR).first()
    assert out["slope"] == pytest.approx(2.0, abs=1e-6)
    assert out["n_pairs"] == 6


# ---------------------------------------------------------------------------
# seasonal_strength
# ---------------------------------------------------------------------------

def test_seasonal_strength_pure_cycle_is_one(spark):
    # value depends ONLY on hour-of-day → residual SS = 0 → strength 1
    rows = [
        Row(metric="m", ts=(d * 24 + h) * HOUR, value=float(10 + h % 4))
        for d in range(4)
        for h in range(24)
    ]
    out = seasonal_strength(
        spark.createDataFrame(rows), ["metric"]
    ).first()
    assert out["n_phases"] == 24
    assert out["strength"] == pytest.approx(1.0, abs=1e-6)


def test_seasonal_strength_hour_independent_is_zero(spark):
    # value depends only on the DAY (constant within any hour-of-day
    # pattern position across days is the day value) → the hourly
    # profile explains nothing beyond the grand mean
    rows = [
        Row(metric="m", ts=(d * 24 + h) * HOUR, value=float(d))
        for d in range(4)
        for h in range(24)
    ]
    out = seasonal_strength(
        spark.createDataFrame(rows), ["metric"]
    ).first()
    # every phase mean equals the grand mean → SS_resid == SS_total
    assert out["strength"] == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# wasserstein_drift
# ---------------------------------------------------------------------------

def test_wasserstein_pure_shift(spark):
    # B is A shifted by +2.0 → W1 = 2.0 exactly (mass 1 moved distance 2)
    rows = [Row(g="x", value=float(v), a=True) for v in [1, 2, 3, 4]] + [
        Row(g="x", value=float(v + 2), a=False) for v in [1, 2, 3, 4]
    ]
    out = wasserstein_drift(
        spark.createDataFrame(rows), F.col("a"), group_cols=["g"]
    ).first()
    assert out["n_a"] == 4 and out["n_b"] == 4
    assert out["w1"] == pytest.approx(2.0, abs=1e-6)


def test_wasserstein_identical_sides_zero(spark):
    rows = [Row(g="x", value=float(v), a=s)
            for v in [1, 5, 9] for s in (True, False)]
    out = wasserstein_drift(
        spark.createDataFrame(rows), F.col("a"), group_cols=["g"]
    ).first()
    assert out["w1"] == 0.0


def test_wasserstein_beats_ks_on_magnitude(spark):
    # KS is identical (1.0) for a +1 shift and a +10 shift of disjoint
    # supports; W1 scales with the distance — the reason it exists
    def w1_of(shift):
        rows = [Row(g="x", value=1.0, a=True),
                Row(g="x", value=1.0 + shift, a=False)]
        return wasserstein_drift(
            spark.createDataFrame(rows), F.col("a"), group_cols=["g"]
        ).first()["w1"]

    assert w1_of(10.0) == pytest.approx(10 * w1_of(1.0), rel=1e-6)


# ---------------------------------------------------------------------------
# gram_duplication / gram_novelty / decontaminate_rarity /
# split_leakage_audit
# ---------------------------------------------------------------------------

def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_gram_duplication_flags_boilerplate_assembly(spark):
    from ticktock_spark.pipeline.dedup import gram_duplication

    texts = [
        "alpha beta gamma delta epsilon zeta",   # unique
        "one two three four five six",           # source of boilerplate
        "one two three four nine ten",           # shares grams with doc 1
    ]
    out = {r["doc_id"]: r for r in gram_duplication(_docs(spark, texts)).collect()}
    assert out[0]["n_dup"] == 0 and out[0]["dup_ratio"] == 0.0
    # docs 1 and 2 share the grams "one two three" and "two three four"
    assert out[1]["n_dup"] == 2 and out[2]["n_dup"] == 2
    assert 0 < out[1]["dup_ratio"] < 1


def test_gram_novelty_first_doc_wins(spark):
    from ticktock_spark.pipeline.dedup import gram_novelty

    texts = [
        "one two three four",        # all grams first-seen here
        "one two three four",        # exact restatement → zero novelty
        "one two three brand new",   # partially novel
    ]
    out = {r["doc_id"]: r for r in gram_novelty(_docs(spark, texts)).collect()}
    assert out[0]["novelty"] == 1.0
    assert out[1]["novelty"] == 0.0
    assert 0 < out[2]["novelty"] < 1


def test_rarity_weighting_ranks_the_true_leak_first(spark):
    from ticktock_spark.pipeline.dedup import decontaminate, decontaminate_rarity

    boiler = "click here to subscribe now"
    rare = "flux capacitor resonance cascade overload"
    train = _docs(
        spark,
        [f"{boiler} article {i} body text" for i in range(8)]  # boilerplate hits
        + [f"intro words then {rare}"],                         # the real leak
    )
    bench = spark.createDataFrame(
        [Row(doc_id=100, text=f"{boiler} {rare}")]
    )
    plain = {r["doc_id"]: r["hit_ratio"]
             for r in decontaminate(train, bench, n=3).collect()}
    weighted = {r["doc_id"]: r["rarity_ratio"]
                for r in decontaminate_rarity(train, bench, n=3).collect()}
    leak_id = 8
    # the leak must outrank every boilerplate doc under rarity weighting
    assert all(weighted[leak_id] > v
               for k, v in weighted.items() if k != leak_id)
    # and the weighted margin must beat the unweighted one
    w_margin = weighted[leak_id] / max(
        v for k, v in weighted.items() if k != leak_id
    )
    p_margin = plain[leak_id] / max(
        v for k, v in plain.items() if k != leak_id
    )
    assert w_margin > p_margin


def test_split_leakage_audit_cluster_split_is_diagonal(spark):
    from ticktock_spark.pipeline.cluster import (
        leakage_safe_split,
        split_leakage_audit,
    )

    # 3 near-dup pairs among 40 docs; naive split may or may not cut
    # them, but the CLUSTER split audit must be purely diagonal
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(40)])
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=21), Row(id_a=2, id_b=22), Row(id_a=3, id_b=23)]
    )
    weights = {"train": 0.8, "valid": 0.1, "test": 0.1}
    naive = split_leakage_audit(docs, pairs, weights).collect()
    assert sum(r["n_pairs"] for r in naive) == 3  # every pair lands somewhere
    safe = leakage_safe_split(docs, pairs, weights).select(
        F.col("doc_id").alias("node"), "split"
    )
    a = safe.select(F.col("node").alias("id_a"), F.col("split").alias("sa"))
    b = safe.select(F.col("node").alias("id_b"), F.col("split").alias("sb"))
    crossed = (
        pairs.join(a, "id_a").join(b, "id_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert crossed == 0


def test_theilsen_duplicate_bucket_rows_skip_equal_x_pairs(spark):
    # un-bucketed input (two rows inside one bucket) must NOT divide by
    # zero: equal-x pairings are skipped, exactly the pairs the q181
    # oracle's `b.x > a.x` join excludes — both remaining pairs pair the
    # two bucket-0 rows against the bucket-1 row
    rows = [Row(metric="m", ts=0, value=1.0),
            Row(metric="m", ts=10, value=2.0),
            Row(metric="m", ts=HOUR, value=5.0)]
    out = theil_sen(spark.createDataFrame(rows), ["metric"], HOUR).first()
    assert out["n"] == 3 and out["n_pairs"] == 2
    assert out["slope"] == pytest.approx(3.5, abs=1e-6)  # median(3, 4)


def test_theilsen_all_rows_in_one_bucket_dropped(spark):
    # a series whose rows all share ONE bucket has no valid pair: it is
    # dropped (the oracle's pair join yields no group either), not a
    # DIVIDE_BY_ZERO — and the guard is the O(1) span precondition on
    # `arr`, not a filter on the O(B²) slope array (see theil_sen body)
    rows = [Row(metric="m", ts=0, value=1.0),
            Row(metric="m", ts=10, value=2.0)]
    assert theil_sen(spark.createDataFrame(rows), ["metric"], HOUR).count() == 0


def test_wasserstein_single_distinct_value_group_reports_zero(spark):
    # a group whose rows all share one distinct value must surface with
    # w1 = 0 and its counts, not silently vanish from the drift report
    rows = [Row(g="x", value=7.0, a=True), Row(g="x", value=7.0, a=False),
            Row(g="y", value=1.0, a=True), Row(g="y", value=2.0, a=False)]
    out = {r["g"]: r for r in wasserstein_drift(
        spark.createDataFrame(rows), F.col("a"), group_cols=["g"]
    ).collect()}
    assert out["x"]["w1"] == 0.0 and out["x"]["n_a"] == 1 and out["x"]["n_b"] == 1
    assert out["y"]["w1"] == pytest.approx(1.0, abs=1e-6)
