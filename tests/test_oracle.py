"""Differential testing: every queries() entry vs its DuckDB oracle.

Emulates the driver's correctness gate (BASELINE.json): run the Spark query
and the oracle SQL on the same parquet tables, compare row count, column
names, and values (order-insensitive). We compare at sf0.001 for speed; the
driver runs sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import ticktock_spark.pipeline.queries  # noqa: F401 — registers pipeline queries
from ticktock_spark.queries import ORACLES, QUERIES
from ticktock_spark.schema import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(df):
    """pandas DF → sorted list of tuples with floats canonicalized."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))  # full precision — we expect bit-identical
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k in ORACLES))
def test_query_matches_oracle(spark, con, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    exp = con.sql(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    cg, ce = _canon(got), _canon(exp)
    mismatches = [(a, b) for a, b in zip(cg, ce) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
