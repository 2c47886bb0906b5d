"""Invariance/brute-force properties of the round-9 operators — the
test_robust_property.py discipline: deterministic pseudo-random frames,
each operator checked against a straight-line Python reference or an
algebraic law the estimator promises."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from ticktock_spark.operators.summary import (
    compressibility_audit,
    flatline_runs,
    gap_report,
    interarrival_percentiles,
    value_precision_audit,
)

MIN = 60_000


def _pts(spark, rows):
    return spark.createDataFrame(
        [Row(metric=m, ts=int(t), value=float(v)) for m, t, v in rows]
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_gap_report_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    # a sparse random subset of 200 minutes
    mins = sorted(rng.sample(range(200), 60))
    rows = [("m", b * MIN + rng.randrange(MIN), 1.0) for b in mins]
    out = gap_report(_pts(spark, rows), ["metric"], bucket_ms=MIN).first()
    expected = mins[-1] - mins[0] + 1
    gaps = [b2 - b1 - 1 for b1, b2 in zip(mins, mins[1:])]
    assert out["n_expected"] == expected
    assert out["n_present"] == len(mins)
    assert out["n_missing"] == expected - len(mins)
    assert out["longest_gap_ms"] == max(gaps) * MIN


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_flatline_matches_bruteforce_runs(spark, seed):
    rng = random.Random(seed)
    # values drawn from a tiny alphabet → plenty of accidental runs
    vals = [float(rng.choice([1.0, 1.0, 2.0])) for _ in range(80)]
    out = flatline_runs(
        _pts(spark, [("m", i * MIN, v) for i, v in enumerate(vals)]),
        ["metric"],
        min_run=4,
    ).first()
    runs, cur = [], 1
    for a, b in zip(vals, vals[1:]):
        if a == b:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    assert out["n_buckets"] == len(vals)
    assert out["n_runs"] == len(runs)
    assert out["longest_run"] == max(runs)
    assert out["n_flat_runs"] == sum(1 for r in runs if r >= 4)


@pytest.mark.parametrize("seed", [1, 2])
def test_interarrival_median_matches_bruteforce_r6(spark, seed):
    rng = random.Random(seed)
    ts, t = [0], 0
    for _ in range(60):
        t += rng.choice([15_000, 15_000, 15_000, 60_000, 120_000])
        ts.append(t)
    out = {
        r["quantile"]: r["pct"]
        for r in interarrival_percentiles(
            _pts(spark, [("m", x, 1.0) for x in ts]), ["metric"]
        ).collect()
    }
    deltas = sorted(b - a for a, b in zip(ts, ts[1:]))

    def r6(vals, q):
        n = len(vals)
        idx = q / 100.0 * (n + 1)
        if n == 1 or idx < 1:
            return float(vals[0])
        if idx >= n:
            return float(vals[-1])
        i = int(idx)
        return vals[i - 1] + (idx - i) * (vals[i] - vals[i - 1])

    assert out[50.0] == r6(deltas, 50.0)
    assert out[95.0] == r6(deltas, 95.0)


@pytest.mark.parametrize("seed", [1, 2])
def test_compress_audit_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    ts, t, vals = [], 0, []
    last = 5.0
    for _ in range(50):
        t += rng.choice([15_000, 15_000, 17_000])
        ts.append(t)
        last = last if rng.random() < 0.4 else round(rng.uniform(0, 9), 2)
        vals.append(last)
    out = compressibility_audit(
        _pts(spark, [("m", ts[i], vals[i]) for i in range(50)]), ["metric"]
    ).first()
    d1 = [b - a for a, b in zip(ts, ts[1:])]
    dod = [b - a for a, b in zip(d1, d1[1:])]
    reps = [a == b for a, b in zip(vals, vals[1:])]

    def q6(x):
        import math

        return math.floor(x * 1e6 + 0.5) / 1e6

    assert out["n"] == 50
    assert out["frac_ts_regular"] == q6(
        sum(1 for d in dod if d == 0) / len(dod)
    )
    assert out["frac_val_repeat"] == q6(sum(reps) / len(reps))


@pytest.mark.parametrize("seed", [1, 2])
def test_value_precision_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    vals = [round(rng.uniform(-50, 50), rng.choice([0, 1, 2])) for _ in range(120)]
    out = value_precision_audit(
        _pts(spark, [("m", i, v) for i, v in enumerate(vals)]), ["metric"]
    ).first()
    import math

    grid = [int(math.floor(v * 100.0 + 0.5)) for v in vals]

    def q6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    n = len(grid)
    n_int = sum(1 for g in grid if g % 100 == 0)
    n_1dp = sum(1 for g in grid if g % 10 == 0)
    assert out["n"] == n
    assert out["frac_integer"] == q6(n_int / n)
    assert out["frac_1dp"] == q6(n_1dp / n)
    assert out["frac_2dp"] == q6((n - n_1dp) / n)


def test_vocab_coverage_is_monotone_and_bounded(spark):
    from ticktock_spark.pipeline.text import vocab_coverage

    rng = random.Random(7)
    words = [f"w{rng.randrange(40)}" for _ in range(600)]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * 20 : (i + 1) * 20])) for i in range(30)],
        "doc_id long, text string",
    )
    out = {r["k"]: r for r in vocab_coverage(docs, ks=[5, 10, 20, 40]).collect()}
    cov = [out[k]["coverage"] for k in (5, 10, 20, 40)]
    assert cov == sorted(cov)                       # monotone in K
    assert out[40]["covered_tokens"] == out[40]["total_tokens"]
    # exact check against a brute-force top-K mass
    from collections import Counter

    c = Counter(words)
    total = sum(c.values())
    for k in (5, 10, 20):
        top = sum(v for _, v in sorted(
            c.items(), key=lambda kv: (-kv[1], kv[0]))[:k])
        assert out[k]["covered_tokens"] == top, k
        assert out[k]["total_tokens"] == total
