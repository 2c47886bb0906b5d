"""Semantic unit tests for the round-9 operators — handcrafted frames
with known answers (test_oracle.py pins cross-engine exactness; these
pin the MATH, same split as test_robust.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from ticktock_spark.operators.robust import seasonal_envelope
from ticktock_spark.operators.summary import (
    compressibility_audit,
    flatline_runs,
    gap_report,
    interarrival_percentiles,
    rollup_error_audit,
    value_precision_audit,
)

MIN = 60_000
HOUR = 3_600_000


def _pts(spark, rows):
    return spark.createDataFrame(
        [Row(metric=m, ts=t, value=float(v)) for m, t, v in rows]
    )


# ---------------------------------------------------------------------------
# interarrival_percentiles
# ---------------------------------------------------------------------------

def test_interarrival_reads_native_interval(spark):
    # 15s cadence where every 10th interval stalls to 90s: p50 stays
    # 15_000 (the native interval), p95 lands in the stall tail (R-6 at
    # n=50 interpolates rank 48.45 — inside the five 90_000 deltas)
    ts, t = [0], 0
    for i in range(1, 51):
        t += 90_000 if i % 10 == 0 else 15_000
        ts.append(t)
    out = {
        r["quantile"]: r
        for r in interarrival_percentiles(
            _pts(spark, [("m", t, 1.0) for t in ts]), ["metric"]
        ).collect()
    }
    assert out[50.0]["pct"] == 15_000.0
    assert out[50.0]["n"] == 50
    assert out[95.0]["pct"] == 90_000.0


def test_interarrival_ignores_duplicate_timestamps(spark):
    # two rows on one ts (dedup-pending ingest) must not create a 0 delta
    rows = [("m", 0, 1.0), ("m", 0, 2.0), ("m", 10_000, 1.0),
            ("m", 20_000, 1.0)]
    out = interarrival_percentiles(_pts(spark, rows), ["metric"]).collect()
    assert all(r["pct"] == 10_000.0 for r in out)


# ---------------------------------------------------------------------------
# flatline_runs
# ---------------------------------------------------------------------------

def test_flatline_finds_the_stuck_stretch(spark):
    # 5 varying buckets, then 12 frozen at 7.0, then 3 varying
    vals = [1.0, 2.0, 3.0, 4.0, 5.0] + [7.0] * 12 + [8.0, 9.0, 10.0]
    rows = [("m", i * MIN, v) for i, v in enumerate(vals)]
    out = flatline_runs(_pts(spark, rows), ["metric"], min_run=10).first()
    assert out["n_buckets"] == 20
    assert out["longest_run"] == 12
    assert out["n_flat_runs"] == 1


def test_flatline_interrupted_run_does_not_count(spark):
    # 9 frozen + 1 blip + 9 frozen at the same value: two runs of 9,
    # neither reaches min_run=10 — the islands must SPLIT at the blip
    vals = [7.0] * 9 + [1.0] + [7.0] * 9
    rows = [("m", i * MIN, v) for i, v in enumerate(vals)]
    out = flatline_runs(_pts(spark, rows), ["metric"], min_run=10).first()
    assert out["longest_run"] == 9
    assert out["n_flat_runs"] == 0
    assert out["n_runs"] == 3


# ---------------------------------------------------------------------------
# gap_report
# ---------------------------------------------------------------------------

def test_gap_report_counts_missing_buckets(spark):
    # present at minutes 0,1,2, 10, 11 → span 12 buckets, 7 missing,
    # longest gap = 7 buckets of silence = 420_000 ms
    rows = [("m", i * MIN, 1.0) for i in [0, 1, 2, 10, 11]]
    out = gap_report(_pts(spark, rows), ["metric"], bucket_ms=MIN).first()
    assert out["n_expected"] == 12
    assert out["n_present"] == 5
    assert out["n_missing"] == 7
    assert out["longest_gap_ms"] == 7 * MIN


def test_gap_report_dense_series_has_zero_gap(spark):
    rows = [("m", i * MIN + 123, 1.0) for i in range(10)]  # offset inside bucket
    out = gap_report(_pts(spark, rows), ["metric"], bucket_ms=MIN).first()
    assert out["n_missing"] == 0 and out["longest_gap_ms"] == 0


# ---------------------------------------------------------------------------
# seasonal_envelope
# ---------------------------------------------------------------------------

def test_seasonal_envelope_brackets_each_hour(spark):
    # hour h of each day carries values h, h+1, h+2, h+3 across 4 days
    rows = [
        ("m", (d * 24 + h) * HOUR, float(h + d))
        for d in range(4)
        for h in range(3)
    ]
    out = {
        (r["phase"], r["quantile"]): r["pct"]
        for r in seasonal_envelope(_pts(spark, rows), ["metric"]).collect()
    }
    # phase 1 has values [1,2,3,4]: R-6 p50 = 2.5, p10 → edge = 1, p90 → edge = 4
    assert out[(1, 50.0)] == pytest.approx(2.5, abs=1e-6)
    assert out[(1, 10.0)] == pytest.approx(1.0, abs=1e-6)
    assert out[(1, 90.0)] == pytest.approx(4.0, abs=1e-6)


# ---------------------------------------------------------------------------
# rollup_error_audit
# ---------------------------------------------------------------------------

def test_rollup_error_catches_uneven_buckets(spark):
    # day 0: hour 0 has 3 points at 0.0, hour 1 has 1 point at 4.0
    # exact daily avg = 1.0, avg-of-hourly-avgs = 2.0 → error = 1.0
    rows = [("m", 0, 0.0), ("m", 1000, 0.0), ("m", 2000, 0.0),
            ("m", HOUR, 4.0)]
    out = rollup_error_audit(_pts(spark, rows), ["metric"]).first()
    assert out["n_coarse"] == 1
    assert out["max_abs_err"] == pytest.approx(1.0, abs=1e-6)
    assert out["mean_abs_err"] == pytest.approx(1.0, abs=1e-6)


def test_rollup_error_zero_when_buckets_balanced(spark):
    rows = [("m", h * HOUR + i * 1000, float(h)) for h in range(3)
            for i in range(4)]
    out = rollup_error_audit(_pts(spark, rows), ["metric"]).first()
    assert out["max_abs_err"] == 0.0


# ---------------------------------------------------------------------------
# value_precision_audit
# ---------------------------------------------------------------------------

def test_value_precision_fractions(spark):
    # 2 integers, 1 one-decimal, 1 full-grid value
    rows = [("m", 0, 5.0), ("m", 1, -3.0), ("m", 2, 2.5), ("m", 3, 2.57)]
    out = value_precision_audit(_pts(spark, rows), ["metric"]).first()
    assert out["n"] == 4
    assert out["frac_integer"] == pytest.approx(0.5, abs=1e-6)
    assert out["frac_1dp"] == pytest.approx(0.75, abs=1e-6)  # ints count too
    assert out["frac_2dp"] == pytest.approx(0.25, abs=1e-6)


# ---------------------------------------------------------------------------
# compressibility_audit
# ---------------------------------------------------------------------------

def test_compressibility_regular_vs_jittered(spark):
    reg = [("reg", i * 15_000, 1.0) for i in range(20)]
    jit = [("jit", i * 15_000 + (i % 3) * 777, float(i)) for i in range(20)]
    out = {
        r["metric"]: r
        for r in compressibility_audit(
            _pts(spark, reg + jit), ["metric"]
        ).collect()
    }
    assert out["reg"]["frac_ts_regular"] == 1.0   # perfect cadence
    assert out["reg"]["frac_val_repeat"] == 1.0   # constant value
    assert out["jit"]["frac_ts_regular"] < 1.0
    assert out["jit"]["frac_val_repeat"] == 0.0
    assert out["reg"]["n"] == 20


def test_compressibility_drops_two_point_series(spark):
    rows = [("m", 0, 1.0), ("m", 1000, 1.0)]  # no delta-of-delta exists
    assert compressibility_audit(_pts(spark, rows), ["metric"]).count() == 0


# ---------------------------------------------------------------------------
# vocab_coverage
# ---------------------------------------------------------------------------

def test_vocab_coverage_exact_boundary_math(spark):
    from ticktock_spark.pipeline.text import vocab_coverage

    # corpus: "a" ×6, "b" ×3, "c" ×3, "d" ×1  (total 13, vocab 4)
    docs = spark.createDataFrame(
        [(1, "a a a a a a"), (2, "b b b c c c"), (3, "d")],
        "doc_id long, text string",
    )
    out = {r["k"]: r for r in vocab_coverage(docs, ks=[1, 2, 4, 99]).collect()}
    assert out[1]["covered_tokens"] == 6          # top-1 = "a"
    # K=2 lands INSIDE the count=3 tie tier {b, c}: 6 + 1×3 = 9 —
    # tie order can't change the mass
    assert out[2]["covered_tokens"] == 9
    assert out[4]["covered_tokens"] == 13
    assert out[99]["covered_tokens"] == 13        # K past vocab clamps
    assert out[99]["vocab_size"] == 4 and out[99]["total_tokens"] == 13
    assert out[2]["coverage"] == pytest.approx(9 / 13, abs=1e-6)


# ---------------------------------------------------------------------------
# dedup_yield_curve
# ---------------------------------------------------------------------------

def test_dedup_yield_monotone_and_greedy_rule(spark):
    from ticktock_spark.pipeline.dedup import dedup_yield_curve

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest tonight"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                                   # exact dup of 1
            (3, base + " with a small twist at the end"),  # near dup
            (4, "completely different text about spark physical plans"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["threshold"]: r
        for r in dedup_yield_curve(docs, thresholds=[0.5, 0.9]).collect()
    }
    # strictness can only shrink the curve
    assert out[0.9]["n_pairs"] <= out[0.5]["n_pairs"]
    assert out[0.9]["n_docs"] <= out[0.5]["n_docs"]
    # the exact dup survives any threshold; doc 2 is removable (partner 1)
    assert out[0.9]["n_pairs"] >= 1
    assert out[0.9]["n_removable"] >= 1
    # removable never counts a doc without a smaller partner: doc 1 and 4
    assert out[0.5]["n_removable"] <= 2


def test_dedup_yield_reports_zero_rows_for_dry_thresholds(spark):
    # a strictness level with ZERO qualifying pairs must still report
    # (t, 0, 0, 0) — "tightening costs nothing here" is the
    # decision-relevant datapoint, and on a clean corpus an empty frame
    # would be indistinguishable from "not run"
    from ticktock_spark.pipeline.dedup import dedup_yield_curve

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (2, "completely different words about spark physical plan shapes"),
         (3, "a third unrelated document mentioning parquet row groups")],
        "doc_id long, text string",
    )
    out = {r["threshold"]: r
           for r in dedup_yield_curve(docs, thresholds=[0.5, 0.9]).collect()}
    assert set(out) == {0.5, 0.9}  # every threshold has its row
    for t in (0.5, 0.9):
        assert (out[t]["n_pairs"], out[t]["n_docs"], out[t]["n_removable"]) \
            == (0, 0, 0)


def test_dedup_yield_single_lineage_execution(spark, tmp_path):
    # the LSH+verify lineage must feed ONE aggregation — a second
    # aggregation branch re-executes the whole uncached candidate
    # pipeline (the expensive part the docstring promises runs once).
    # explode_outer + one groupBy keeps the corpus scans at the
    # q187-class shingle re-derivations only; the old two-branch join
    # doubled them.
    import re

    from ticktock_spark.pipeline.dedup import dedup_yield_curve

    p = str(tmp_path / "docs_y.parquet")
    spark.createDataFrame(
        [(i, f"some text body number {i}") for i in range(10)],
        "doc_id long, text string",
    ).write.parquet(p)
    out = dedup_yield_curve(spark.read.parquet(p))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    # the q34+verify composition derives shingles 5x from the corpus
    # (q187-class measured-cheaper recompute); the two-branch form paid
    # 10 — pin the halved bound
    assert scans <= 5, scans
