#!/usr/bin/env python
"""Measure the metadata-endpoint asymptotics claim (SCALE.md):

/api/suggest + /api/search/lookup answer from the cached series dim
(O(series)) instead of distinct-scanning the datapoints fact table
(O(points)). This script builds a datapoints table N× the sf0.1 events
conversion (copy-count scales points, series count stays fixed) and times
both paths — the dim latency should stay flat in N while the raw scan
grows linearly.

Usage: python tools/metadata_stress.py [N]   (default 16)
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from ticktock_spark.api.http import TsdbStore  # noqa: E402
from ticktock_spark.session import get_spark  # noqa: E402


def tagged_datapoints(spark, sf_dir):
    from ticktock_spark.queries import _tagged_dps

    return _tagged_dps(spark, sf_dir)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(app_name="metadata-stress")
    spark.sparkContext.setLogLevel("ERROR")
    base1 = tagged_datapoints(spark, "/root/testdata/sf0.1")
    # N× the points, same series set — the regime where fact-scan metadata
    # hurts and the dim should not care. The fact table lives in parquet
    # (as it would at 100 TB), not a cache.
    base = base1
    for _ in range(n - 1):
        base = base.unionByName(base1)
    path = ".scratch/metadata_stress_dps"
    base.write.mode("overwrite").parquet(path)
    base = spark.read.parquet(path)
    n_points = base.count()

    store = TsdbStore(spark, base=base)

    # tagv suggest: the worst endpoint for a fact scan (explodes the tags
    # map of every point) and the common autocomplete call
    def suggest_tagv(df) -> float:
        t0 = time.perf_counter()
        df.select(F.explode(F.map_values("tags")).alias("v")).filter(
            F.col("v").startswith("u")
        ).distinct().orderBy("v").limit(25).collect()
        return time.perf_counter() - t0

    def suggest_via_dim() -> float:
        return suggest_tagv(store.series_dim())

    def suggest_via_fact() -> float:
        return suggest_tagv(store.dataframe())

    # first dim call pays the one-time index build; report it separately
    t_build = suggest_via_dim()
    t_dim = min(suggest_via_dim() for _ in range(3))
    t_fact = min(suggest_via_fact() for _ in range(3))
    n_series = store.series_dim().count()
    print(
        f"N={n} points={n_points:,} series={n_series:,} | "
        f"dim build+first={t_build:.2f}s warm={t_dim:.3f}s | "
        f"fact distinct-scan={t_fact:.2f}s | speedup {t_fact / t_dim:.0f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
