"""Rate semantics matrix (`src/agg/rate.cpp:38-92`, `test/int_test3.py:1550-1606`)."""

from __future__ import annotations

import math

from ticktock_spark.operators.rate import rate

# one series: ts (ms), value — includes a decrease (40 → 10) to exercise wrap
ROWS = [
    ("s", 10_000, 10.0),
    ("s", 20_000, 40.0),
    ("s", 30_000, 10.0),
    ("s", 40_000, 20.0),
]
COLS = ["series", "ts", "value"]


def _got(df):
    return {r["ts"]: r["value"] for r in df.collect()}


def test_rate_plain(spark):
    out = rate(spark.createDataFrame(ROWS, COLS), ["series"])
    got = _got(out)
    assert set(got) == {20_000, 30_000, 40_000}  # first point dropped
    assert math.isclose(got[20_000], 3.0)   # (40-10)/10s
    assert math.isclose(got[30_000], -3.0)  # decrease kept verbatim
    assert math.isclose(got[40_000], 1.0)


def test_rate_counter_wrap(spark):
    out = rate(spark.createDataFrame(ROWS, COLS), ["series"], counter=True, counter_max=100)
    got = _got(out)
    # wrap at 30s: (100 - 40 + 10)/10 = 7.0
    assert math.isclose(got[30_000], 7.0)
    assert math.isclose(got[20_000], 3.0)


def test_rate_counter_reset_value(spark):
    out = rate(
        spark.createDataFrame(ROWS, COLS), ["series"],
        counter=True, counter_max=1_000_000, reset_value=100,
    )
    got = _got(out)
    # wrap-rate (1e6-40+10)/10 ≈ 99997 > resetValue=100 → 0
    assert got[30_000] == 0.0


def test_rate_drop_resets(spark):
    out = rate(spark.createDataFrame(ROWS, COLS), ["series"], counter=True, drop_resets=True)
    got = _got(out)
    assert 30_000 not in got
    # the NEXT delta is vs the dropped point (prev still advanced): (20-10)/10 = 1.0
    assert math.isclose(got[40_000], 1.0)
