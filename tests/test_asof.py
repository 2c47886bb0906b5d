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


# --- rolling window (operators/rolling.py) ---


def test_rolling_agg_exact_frames(spark):
    from ticktock_spark.operators.rolling import rolling_agg

    df = spark.createDataFrame(
        [("m", 0, 1.0), ("m", 500, 2.0), ("m", 1000, 4.0), ("m", 1601, 8.0),
         ("x", 0, 100.0)],
        "s string, ts long, value double",
    )
    got = {(r["s"], r["ts"]): r for r in rolling_agg(df, ["s"], 1000).collect()}
    assert got[("m", 0)]["roll_n"] == 1 and got[("m", 0)]["roll_avg"] == 1.0
    assert got[("m", 1000)]["roll_n"] == 3          # 0,500,1000 all in [0,1000]
    assert got[("m", 1000)]["roll_sum"] == 7.0
    assert got[("m", 1601)]["roll_n"] == 2          # 1000,1601 (601 in range, 500 not)
    assert got[("m", 1601)]["roll_sum"] == 12.0
    assert got[("x", 0)]["roll_n"] == 1             # series isolated


def test_rolling_duplicate_ts_identical_frames(spark):
    from ticktock_spark.operators.rolling import rolling_agg

    df = spark.createDataFrame(
        [("m", 10, 1.0), ("m", 10, 2.0)], "s string, ts long, value double"
    )
    rows = rolling_agg(df, ["s"], 1000).collect()
    assert all(r["roll_n"] == 2 and r["roll_sum"] == 3.0 for r in rows)


# --- range join (operators/rangejoin.py) ---


def test_range_join_inclusive_bounds_and_buckets(spark):
    from ticktock_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 250), (3, 1, 251), (4, 2, 100)],
        "pid long, k long, ts long",
    )
    iv = spark.createDataFrame(
        [(10, 1, 100, 250), (11, 1, 240, 300)], "iid long, k long, start long, end long"
    )
    got = sorted(
        (r["pid"], r["iid"]) for r in range_join(pts, iv, ["k"], 50, ts_col="ts").collect()
    )
    # pid1 in iv10 only; pid2 in both (inclusive end=250); pid3 in iv11 only;
    # pid4 wrong key. Buckets of width 50 — intervals span several buckets,
    # but each (point, interval) pair appears exactly once.
    assert got == [(1, 10), (2, 10), (2, 11), (3, 11)]


def test_range_join_matches_naive(spark):
    from ticktock_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(i, i % 4, (i * 37) % 1000) for i in range(200)], "pid long, k long, ts long"
    )
    iv = spark.createDataFrame(
        [(j, j % 4, (j * 91) % 900, (j * 91) % 900 + (j * 13) % 300)
         for j in range(40)],
        "iid long, k long, start long, end long",
    )
    fast = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pts, iv, ["k"], 128, ts_col="ts").collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in pts.join(iv, "k").filter("ts between start and end").collect()
    )
    assert fast == naive and len(fast) > 0


def test_range_join_collision_rejected(spark):
    from ticktock_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame([(1, 1, 5)], "pid long, k long, ts long")
    iv = spark.createDataFrame([(1, 1, 0, 9)], "pid long, k long, start long, end long")
    try:
        range_join(pts, iv, ["k"], 10, ts_col="ts")
    except ValueError as e:
        assert "collision" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_asof_matches_naive_on_random_data(spark):
    """Randomized differential check: the window formulation must equal
    the quadratic per-row 'latest prior right' reference."""
    import random

    rng = random.Random(42)
    lrows = [(i, rng.randrange(4), rng.randrange(500)) for i in range(120)]
    rrows = [
        (rng.randrange(4), rng.randrange(500), float(j)) for j in range(60)
    ]
    # dedup right (k, ts) — keep the highest v, mirroring seq-less use
    best = {}
    for k, t, v in rrows:
        best[(k, t)] = max(best.get((k, t), v), v)
    rrows = [(k, t, v) for (k, t), v in best.items()]

    left = spark.createDataFrame(lrows, "id long, k long, ts long")
    right = spark.createDataFrame(rrows, "k long, ts long, v double")
    got = {
        r["id"]: (r["v"], r["right_ts"])
        for r in asof_join(left, right, ["k"], ["v"], ts_col="ts").collect()
    }
    for i, k, t in lrows:
        cand = [(rt, rv) for (rk, rt, rv) in rrows if rk == k and rt <= t]
        exp = max(cand) if cand else None
        assert got[i] == ((exp[1], exp[0]) if exp else (None, None)), (i, k, t)


def test_rolling_zscore(spark):
    """Hand-checked frames: constant series → std 0 → NULL z; a spike
    after a flat run gets a large positive z; first point NULL
    (min_points)."""
    from ticktock_spark.operators.rolling import rolling_zscore

    rows = [
        ("a", 1, 0, 10.0),
        ("a", 1, 1000, 10.0),
        ("a", 1, 2000, 10.0),
        ("a", 1, 3000, 20.0),   # spike
        ("b", 9, 0, 5.0),       # lone point
    ]
    df = spark.createDataFrame(rows, "et string, uid long, ts long, value double")
    got = {(r["et"], r["uid"], r["ts"]): r for r in
           rolling_zscore(df, ["et", "uid"], window_ms=10_000).collect()}
    assert got[("a", 1, 0)]["zscore"] is None            # single-point frame
    assert got[("a", 1, 2000)]["zscore"] is None         # zero variance
    spike = got[("a", 1, 3000)]
    # frame = [10,10,10,20]: mean 12.5, var 18.75, std ~4.3301, z ~1.7320
    assert abs(spike["roll_mean"] - 12.5) < 1e-12
    assert abs(spike["zscore"] - (7.5 / 18.75 ** 0.5)) < 1e-12
    assert got[("b", 9, 0)]["zscore"] is None


def test_ewma_baseline_hand_computed(spark):
    from ticktock_spark.operators.rolling import ewma_baseline

    rows = [("m", t, float(v)) for t, v in [(1, 10.0), (2, 20.0), (3, 40.0), (4, 0.0)]]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = {r["ts"]: r for r in ewma_baseline(df, ["metric"], 0.5, 16).collect()}
    assert 1 not in out  # no prior point
    assert out[2]["ewma"] == 10.0 and out[2]["resid"] == 10.0
    # t=3: weights 0.5, 1 over [10, 20] -> (5 + 20) / 1.5
    assert out[3]["ewma"] == round((0.5 * 10 + 20) / 1.5, 6)
    # t=4: weights 0.25, 0.5, 1 over [10, 20, 40]
    import math

    want = (0.25 * 10 + 0.5 * 20 + 40) / 1.75
    assert out[4]["ewma"] == math.floor(want * 1e6 + 0.5) / 1e6
    assert out[4]["resid"] == math.floor((0.0 - want) * 1e6 + 0.5) / 1e6


def test_rolling_percentile_r6_hand_computed(spark):
    from ticktock_spark.operators.rolling import rolling_percentile_r6

    rows = [("m", t, float(v)) for t, v in enumerate([10, 30, 20, 40], start=1)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = {r["ts"]: r for r in rolling_percentile_r6(df, ["metric"], 50.0, 3).collect()}
    # t=1: window [10] -> p50 = 10; t=2: [10,30] -> idx=1.5 -> 20
    assert out[1]["pct"] == 10.0 and out[1]["n_window"] == 1
    assert out[2]["pct"] == 20.0
    # t=3: [10,20,30] -> idx = 0.5*4 = 2 -> exactly the 2nd value = 20
    assert out[3]["pct"] == 20.0 and out[3]["n_window"] == 3
    # t=4: trailing 3 = [20,30,40] -> 30
    assert out[4]["pct"] == 30.0


def test_acf_periodic_series(spark):
    """A perfectly periodic series autocorrelates at exactly 1.0 on the
    period lag and below it elsewhere; a constant series yields NULL r
    (zero variance guard)."""
    from pyspark.sql import functions as F

    from ticktock_spark.operators.correlate import acf

    rows = [("m", i * 60000, float([3.0, 7.0, 5.0][i % 3])) for i in range(60)]
    rows += [("c", i * 60000, 4.0) for i in range(30)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = {
        (r["metric"], r["lag"]): r
        for r in acf(df, ["metric"], max_lag=4, bucket_ms=60000).collect()
    }
    assert out[("m", 3)]["pearson_r"] == 1.0
    assert all(
        out[("m", lag)]["pearson_r"] < 1.0 for lag in (1, 2, 4)
    )
    # aligned-pair counts shrink with lag (no wraparound)
    assert out[("m", 1)]["n"] == 59 and out[("m", 4)]["n"] == 56
    assert all(out[("c", lag)]["pearson_r"] is None for lag in (1, 2, 3, 4))


def test_mean_shift_score_planted_step(spark):
    """A level step of height 6 produces its maximum score exactly at
    the first point of the new level, equal to the step height; flat
    regions score 0; edges without full windows are absent."""
    from ticktock_spark.operators.rolling import mean_shift_score

    rows = [("m", i * 1000, 2.0 if i < 20 else 8.0) for i in range(40)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = {r["ts"]: r for r in mean_shift_score(df, ["metric"], window=8).collect()}
    # rows 0-7 lack a full left window; rows 33+ lack a full right window
    assert min(out) == 8 * 1000 and max(out) == 32 * 1000
    best = max(out.values(), key=lambda r: r["shift_score"])
    assert best["ts"] == 20 * 1000 and best["shift_score"] == 6.0
    assert best["mean_before"] == 2.0 and best["mean_after"] == 8.0
    assert out[10 * 1000]["shift_score"] == 0.0
    assert out[30 * 1000]["shift_score"] == 0.0


def test_decontaminate_planted_overlap(spark):
    """A training doc quoting a benchmark n-gram is flagged with the
    exact shared-gram count; clean docs are absent; hash_grams engine
    flags the same docs."""
    from ticktock_spark.pipeline.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the capital of france is paris everyone knows")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "quiz answer the capital of france is paris obviously"),
            (2, "completely unrelated text about gardening and soil"),
        ],
        "doc_id long, text string",
    )
    out = decontaminate(train, bench, n=5).collect()
    assert [r["doc_id"] for r in out] == [1]
    r = out[0]
    # shared 5-grams: the 2 windows fully inside "the capital of france
    # is paris" plus "of france is paris everyone"? no — 'everyone' is
    # not in doc 1, so exactly 2: "the capital of france is",
    # "capital of france is paris"
    assert r["n_hits"] == 2 and r["n_grams"] == 5
    assert abs(r["hit_ratio"] - 0.4) < 1e-12
    hashed = decontaminate(train, bench, n=5, hash_grams=True).collect()
    assert [(x["doc_id"], x["n_hits"]) for x in hashed] == [(1, 2)]
