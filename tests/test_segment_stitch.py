"""Exactness of the round-10 segment-stitched lag rewrites (q195/q203).

interarrival_percentiles and compressibility_audit no longer run a
window over raw-datapoint cardinality: lags partition on (series,
slice) and slice boundaries are stitched from a per-slice frame. These
tests pin BIT-EXACT equality against the naive global-lag form across
adversarial shapes — single-point slices, empty slices between points,
boundary-straddling repeats, duplicate timestamps (seq tie-break),
null values — with slice widths chosen to force every stitch path
(p.n == 1 fallback to q.last included).
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import Window as W, functions as F

from ticktock_spark.operators.summary import (
    compressibility_audit,
    interarrival_percentiles,
)


def _random_points(seed: int, n_series: int = 4, n_pts: int = 120):
    rng = random.Random(seed)
    rows = []
    for s in range(n_series):
        t = rng.randrange(0, 5_000)
        for i in range(rng.randrange(1, n_pts)):
            # cadence mix: dense bursts, long silences, exact repeats
            t += rng.choice([1, 7, 1000, 1000, 1000, 25_000, 90_000])
            val = rng.choice(
                [1.0, 1.0, 2.5, rng.uniform(-5, 5), None]
            )
            rows.append((f"m{s}", t, val, i))
    rng.shuffle(rows)
    return rows


def _naive_interarrival(spark, rows, qs):
    from ticktock_spark.operators.percentile import group_percentiles_r6

    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, seq long"
    )
    w = W.partitionBy("metric").orderBy("ts")
    deltas = (
        df.select("metric", "ts")
        .distinct()
        .select(
            "metric", (F.col("ts") - F.lag("ts").over(w)).alias("delta")
        )
        .filter(F.col("delta").isNotNull())
    )
    return group_percentiles_r6(deltas, ["metric"], "delta", qs)


def _naive_compress(spark, rows, seq_col):
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, seq long"
    )
    order = ["__ts"] + (["__seq"] if seq_col else [])
    w = W.partitionBy("metric").orderBy(*order)
    v = F.floor(F.col("value").cast("double") * 100.0 + F.lit(0.5)).cast(
        "long"
    )
    base = df.select(
        "metric",
        F.col("ts").alias("__ts"),
        v.alias("__v"),
        *([F.col(seq_col).alias("__seq")] if seq_col else []),
    )
    lagged = base.select(
        "metric",
        (
            F.col("__ts") - 2 * F.lag("__ts", 1).over(w)
            + F.lag("__ts", 2).over(w)
        ).alias("dod"),
        (F.col("__v") == F.lag("__v").over(w)).alias("rep"),
    )
    agg = lagged.groupBy("metric").agg(
        F.count(F.when(F.col("dod").isNotNull(), 1)).alias("n_dod"),
        F.count(F.when(F.col("dod") == 0, 1)).alias("n_dod0"),
        F.count(F.when(F.col("rep").isNotNull(), 1)).alias("n_rep"),
        F.count(F.when(F.col("rep"), 1)).alias("n_rep1"),
    )
    q6 = lambda c: F.floor(c * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0  # noqa: E731
    return agg.filter(F.col("n_dod") > 0).select(
        "metric",
        (F.col("n_dod") + F.lit(2)).cast("long").alias("n"),
        q6(F.col("n_dod0").cast("double") / F.col("n_dod")).alias(
            "frac_ts_regular"
        ),
        q6(F.col("n_rep1").cast("double") / F.col("n_rep")).alias(
            "frac_val_repeat"
        ),
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("slice_ms", [1_000, 7_777, 60_000])
def test_interarrival_stitched_equals_global_lag(spark, seed, slice_ms):
    rows = _random_points(seed)
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, seq long"
    )
    got = sorted(
        map(
            tuple,
            interarrival_percentiles(
                df, ["metric"], quantiles=[10.0, 50.0, 95.0],
                slice_ms=slice_ms,
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, _naive_interarrival(spark, rows, [10.0, 50.0, 95.0]).collect())
    )
    assert got == want


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("slice_ms", [1_000, 7_777, 60_000])
def test_compressibility_stitched_equals_global_lag(spark, seed, slice_ms):
    rows = _random_points(seed)
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, seq long"
    )
    got = sorted(
        map(
            tuple,
            compressibility_audit(
                df, ["metric"], slice_ms=slice_ms
            ).collect(),
        )
    )
    want = sorted(map(tuple, _naive_compress(spark, rows, None).collect()))
    assert got == want


def test_compressibility_stitched_with_seq_tiebreak(spark):
    """Duplicate timestamps resolved by seq: the in-slice order and the
    boundary frame must both honor (ts, seq)."""
    rows = []
    rng = random.Random(42)
    t = 0
    for i in range(80):
        if i % 5:
            t += rng.choice([1, 500, 1500])
        # repeated t every 5th row → same-slice AND cross-boundary ties
        rows.append(("m0", t, rng.choice([1.0, 1.0, 3.25]), i))
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, seq long"
    )
    for slice_ms in (700, 1_000):
        got = sorted(
            map(
                tuple,
                compressibility_audit(
                    df, ["metric"], seq_col="seq", slice_ms=slice_ms
                ).collect(),
            )
        )
        want = sorted(map(tuple, _naive_compress(spark, rows, "seq").collect()))
        assert got == want, slice_ms


def test_stitch_handles_single_point_slices_chain(spark):
    """Three consecutive single-point slices: the slice-first row's
    second predecessor must fall back to the slice-before-previous
    (coalesce(p.last2, q.last)) — the exact case a naive stitch drops."""
    rows = [
        ("m0", 100, 1.0, 0),   # slice 0
        ("m0", 1_100, 1.0, 1),  # slice 1 (alone)
        ("m0", 2_100, 1.0, 2),  # slice 2 (alone)
        ("m0", 3_100, 2.0, 3),  # slice 3 (alone)
        ("m0", 3_200, 2.0, 4),
    ]
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, seq long"
    )
    got = sorted(
        map(
            tuple,
            compressibility_audit(df, ["metric"], slice_ms=1_000).collect(),
        )
    )
    want = sorted(map(tuple, _naive_compress(spark, rows, None).collect()))
    assert got == want
    ia_got = sorted(
        map(
            tuple,
            interarrival_percentiles(
                df, ["metric"], slice_ms=1_000
            ).collect(),
        )
    )
    ia_want = sorted(
        map(tuple, _naive_interarrival(spark, rows, [50.0, 95.0]).collect())
    )
    assert ia_got == ia_want


def test_no_raw_cardinality_window_partition_remains(spark):
    """Plan assert (the robust-tier contract): every Window in the
    stitched plans either includes the __slice column in its partition
    keys (in-slice pass) or runs over the slice FRAME / the percentile
    machinery's bounded frames — never partitionBy(series) ordered by
    raw ts over the datapoint table. We pin it structurally: each
    windowspecdefinition that orders by the raw ts column must also
    partition on __slice."""
    import re

    df = spark.createDataFrame(
        [("m0", i * 1000, 1.0, i) for i in range(50)],
        "metric string, ts long, value double, seq long",
    )
    for out in (
        interarrival_percentiles(df, ["metric"]),
        compressibility_audit(df, ["metric"]),
    ):
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            spec = m.group(1)
            # specs ordering by the raw-point ts/__ts column must be
            # slice-partitioned; slice-frame specs order by __slice
            if re.search(r"\b(ts|__ts)#\d+L ASC", spec):
                assert "__slice" in spec, spec


def _py_compress_reference(rows_by_metric):
    """Pure-Python re-statement of the q203 spec (global consecutive
    lags, 2-decimal grid, q6-floored fractions) — the shrinking oracle
    for the hypothesis test below."""
    import math

    out = {}
    for m, rows in rows_by_metric.items():
        rows = sorted(rows)
        ts = [r[0] for r in rows]
        vs = [
            None if r[1] is None
            else math.floor(r[1] * 100.0 + 0.5)
            for r in rows
        ]
        n_dod = n_dod0 = n_rep = n_rep1 = 0
        for i in range(len(rows)):
            if i >= 2:
                n_dod += 1
                if ts[i] - 2 * ts[i - 1] + ts[i - 2] == 0:
                    n_dod0 += 1
            if i >= 1 and vs[i] is not None and vs[i - 1] is not None:
                n_rep += 1
                if vs[i] == vs[i - 1]:
                    n_rep1 += 1
        if n_dod > 0:
            q6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
            out[m] = (
                n_dod + 2,
                q6(n_dod0 / n_dod),
                q6(n_rep1 / n_rep) if n_rep else None,
            )
    return out


try:
    from hypothesis import given, settings, strategies as st

    _ROWS = st.dictionaries(
        st.sampled_from(["m0", "m1"]),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=40),
                st.sampled_from([1.0, 2.5, None]),
            ),
            min_size=0,
            max_size=10,
            unique_by=lambda t: t[0],  # unique ts per metric (no seq)
        ),
        min_size=1,
        max_size=2,
    )

    @given(rows=_ROWS, slice_ms=st.sampled_from([3, 5, 7]))
    @settings(max_examples=25, deadline=None)
    def test_compressibility_stitch_matches_python_reference(
        spark, rows, slice_ms
    ):
        flat = [
            (m, ts, v) for m, rs in rows.items() for ts, v in rs
        ]
        if not flat:
            return
        df = spark.createDataFrame(
            flat, "metric string, ts long, value double"
        )
        got = {
            r["metric"]: (r["n"], r["frac_ts_regular"], r["frac_val_repeat"])
            for r in compressibility_audit(
                df, ["metric"], slice_ms=slice_ms
            ).collect()
        }
        assert got == _py_compress_reference(
            {m: rs for m, rs in rows.items()}
        )
except ImportError:  # pragma: no cover — hypothesis is baked in
    pass
