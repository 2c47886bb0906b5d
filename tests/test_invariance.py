"""Results must not depend on physical parallelism.

At 100 TB the partition count is three orders of magnitude larger than
in tests — any operator whose output depends on partitioning (fold
order, per-partition ids, unstable ties) silently corrupts results on
the real cluster while passing small-scale checks. Representative
queries (mapInPandas hashing, iterative CC, window sessionization,
decimal sums) run under two very different shuffle widths and must
produce identical canonical output.
"""

from __future__ import annotations

import math

import pytest

from ticktock_spark.queries import QUERIES

import ticktock_spark.pipeline.queries  # noqa: F401 — registers pipeline queries

SF_DIR = "/root/testdata/sf0.001"

CASES = [
    "q34_minhash_lsh",        # Arrow-batched hashing + band shuffle
    "q46_sessionize",         # windows + running sums + decimal sums
    "q49_dedup_clusters",     # iterative large-star/small-star
    "q51_rate_after_agg",     # two-level agg + window rate
]


def _canon(df):
    out = []
    for row in df.toPandas()[sorted(df.columns)].itertuples(index=False):
        out.append(tuple("NaN" if isinstance(v, float) and math.isnan(v) else repr(v) for v in row))
    return sorted(out)


@pytest.mark.parametrize("name", CASES)
def test_partition_invariance(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _canon(QUERIES[name](spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        wide = _canon(QUERIES[name](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert narrow == wide, f"{name}: output depends on shuffle width"
