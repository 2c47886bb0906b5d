"""Downsampler semantics (`src/agg/down.cpp`, `test/query_test.cpp:216-226`)."""

from __future__ import annotations

import math

from ticktock_spark.operators.dedup import dedup_last_wins
from ticktock_spark.operators.downsample import downsample
from ticktock_spark.operators.fill import fill_buckets

ROWS = [
    ("s1", 1_000, 1.0, 1),
    ("s1", 61_000, 3.0, 2),
    ("s1", 62_000, 5.0, 3),
    ("s1", 181_000, 7.0, 4),
]
COLS = ["series", "ts", "value", "seq"]


def test_downsample_avg_epoch_aligned(spark):
    df = spark.createDataFrame(ROWS, COLS)
    out = downsample(df, ["series"], 60_000, "avg")
    got = {r["ts"]: r["value"] for r in out.collect()}
    assert got == {0: 1.0, 60_000: 4.0, 180_000: 7.0}


def test_downsample_0all_last_and_avg(spark):
    # `0all-last` → single point = last value; `0all-avg` → mean
    df = spark.createDataFrame(ROWS, COLS)
    last = downsample(df, ["series"], 0, "last").collect()
    assert len(last) == 1 and last[0]["value"] == 7.0 and last[0]["ts"] == 1_000
    avg = downsample(df, ["series"], 0, "avg").collect()
    assert math.isclose(avg[0]["value"], 4.0)


def test_downsample_first_last_dev(spark):
    df = spark.createDataFrame(ROWS, COLS)
    first = {r["ts"]: r["value"] for r in downsample(df, ["series"], 60_000, "first").collect()}
    assert first[60_000] == 3.0
    last = {r["ts"]: r["value"] for r in downsample(df, ["series"], 60_000, "last").collect()}
    assert last[60_000] == 5.0
    dev = {r["ts"]: r["value"] for r in downsample(df, ["series"], 60_000, "dev").collect()}
    assert dev[0] == 0.0  # single point → population stddev 0
    assert math.isclose(dev[60_000], 1.0)  # pop stddev of {3,5}


def test_fill_zero(spark):
    df = spark.createDataFrame(ROWS, COLS)
    ds = downsample(df, ["series"], 60_000, "avg")
    filled = fill_buckets(ds, ["series"], 60_000, 0, 240_000, policy="zero")
    got = {r["ts"]: r["value"] for r in filled.collect()}
    assert got == {0: 1.0, 60_000: 4.0, 120_000: 0.0, 180_000: 7.0, 240_000: 0.0}


def test_dedup_last_wins(spark):
    rows = ROWS + [("s1", 61_000, 99.0, 9)]  # duplicate ts, higher seq wins
    df = spark.createDataFrame(rows, COLS)
    out = dedup_last_wins(df, ["series"])
    got = {r["ts"]: r["value"] for r in out.collect()}
    assert got[61_000] == 99.0 and len(got) == 4
