#!/usr/bin/env python
"""Interleaved A/B for spread_scan call sites (round 11).

This host's run-to-run drift exceeds most per-query effects, so
before/after comparisons across separate sessions are unreliable for
sub-second queries. This harness times each query with spread_scan
DISABLED (A) and ENABLED (B) alternately inside ONE session:
A B A B ... for ``--pairs`` pairs, reporting min-of-runs per arm.

Usage: python tools/ab_spread.py [--pairs 3] q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--pairs", type=int, default=3)
    args = ap.parse_args()

    import ticktock_spark.pipeline.queries  # noqa: F401
    from ticktock_spark.pipeline import util
    from ticktock_spark.queries import BENCH_ONLY, QUERIES
    from ticktock_spark.session import get_spark

    # validate up front: an unknown name otherwise surfaces as a bare
    # KeyError mid-benchmark, after warmup work has already run (ADVICE r11)
    unknown = [n for n in args.names if n not in QUERIES and n not in BENCH_ONLY]
    if unknown:
        sys.exit(
            f"unknown queries: {unknown}; known = QUERIES/BENCH_ONLY names "
            f"(e.g. {sorted(QUERIES)[:3]} ...)"
        )

    spark = get_spark(
        app_name="ticktock-ab-spread",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(name: str) -> float:
        fn = QUERIES.get(name) or BENCH_ONLY[name]
        df = fn(spark, SF_DIR)
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    # warmup both arms (JVM, codegen, parquet footers, Python workers)
    for flag in (True, False):
        util._DISABLE_SPREAD = flag
        for name in args.names:
            run_once(name)

    out = {}
    for name in args.names:
        a = b = float("inf")
        for _ in range(args.pairs):
            util._DISABLE_SPREAD = True
            a = min(a, run_once(name))
            util._DISABLE_SPREAD = False
            b = min(b, run_once(name))
        out[name] = {"off": round(a, 4), "on": round(b, 4)}
    util._DISABLE_SPREAD = False
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
