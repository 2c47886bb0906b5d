"""Measured payoff of `/api/analytics` grain= rollup routing.

The routing claim: at scale a bucket-mean op should read
|series|×|hours| rollup rows, not raw points. Locally both paths are
fast, so the measurement scales the POINT volume (sf0.1 events
replicated N× by densifying within the same time span — more points
per hour, the realistic TSDB growth axis) while the rollup row count
stays FIXED at |series|×|hours|. Both stores are parquet-backed so
scan cost is real; the op runs through analytics.execute exactly as
the HTTP layer calls it.

Usage: python tools/analytics_rollup_stress.py [N]   (default 8)
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ticktock_spark.api import analytics
from ticktock_spark.plans.planner import TsdbContext
from ticktock_spark.schema import load_table
from ticktock_spark.session import get_spark
from ticktock_spark.sources.events import events_to_datapoints

SCRATCH = "/root/repo/.scratch/analytics_rollup"


def _run(dps, rollups, params) -> float:
    t0 = time.monotonic()
    analytics.execute(dps, params, rollups)
    return round(time.monotonic() - t0, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)

    base = events_to_datapoints(load_table(spark, "/root/testdata/sf0.1", "events"))
    copies = spark.range(n).withColumnRenamed("id", "copy")
    # densify: copy c shifts by c×7s inside the same hour grid — point
    # volume grows N×, the hourly bucket/rollup row count does not
    dense = base.crossJoin(copies).select(
        "metric",
        (F.col("ts") + F.col("copy") * 7_000).alias("ts"),
        "value",
        "tags",
    )
    out = {"n": n, "op": "trend@1h", "cases": {}}
    for tag, frame in (("1", base), (str(n), dense)):
        dp_path = f"{SCRATCH}/dps_{tag}"
        frame.repartition(32).write.mode("overwrite").parquet(dp_path)
        dps = spark.read.parquet(dp_path)
        ctx = TsdbContext(dps)
        ctx.materialize_rollups()
        r_path = f"{SCRATCH}/rollup1h_{tag}"
        ctx.rollup_1h.write.mode("overwrite").parquet(r_path)
        rollup = spark.read.parquet(r_path)
        params = {"op": ["trend"], "bucket_ms": ["3600000"]}
        raw = min(_run(dps, None, params) for _ in range(3))
        routed = min(
            _run(dps, {"1h": rollup}, {**params, "grain": ["1h"]})
            for _ in range(3)
        )
        out["cases"][tag] = {
            "points": dps.count(),
            "rollup_rows": rollup.count(),
            "raw_s": raw,
            "grain_1h_s": routed,
        }
        print(tag, out["cases"][tag], flush=True)
    c1, cn = out["cases"]["1"], out["cases"][str(n)]
    out["raw_growth"] = round(cn["raw_s"] / max(c1["raw_s"], 1e-9), 2)
    out["routed_growth"] = round(
        cn["grain_1h_s"] / max(c1["grain_1h_s"], 1e-9), 2
    )
    print(json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
