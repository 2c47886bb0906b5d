#!/usr/bin/env python
"""Round-12 optimization measurement harness.

Measures each bench query exactly like bench.py (noop sink, warmup,
cold + min-of-3 interleaved warm passes) and captures
``explain("formatted")`` for every query into plans/r12/<name>_<tag>.txt.

Usage:
    python tools/profile_r12.py [--tag before|after] [--no-plans] [q1 q2 ...]

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
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import BENCH_QUERIES

    import ticktock_spark.pipeline.queries  # noqa: F401
    from ticktock_spark.queries import BENCH_ONLY, QUERIES
    from ticktock_spark.session import get_spark

    names = args.names or BENCH_QUERIES
    spark = get_spark(
        app_name="ticktock-profile",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    plans_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)

    def build(name):
        fn = QUERIES.get(name) or BENCH_ONLY[name]
        return fn(spark, SF_DIR)

    def run_once(name: str) -> float:
        df = build(name)
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    # warmup: JVM, codegen, parquet footers, Python worker pool
    fn = QUERIES["q20_pricing_summary"]
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    def _identity(batches):
        yield from batches

    spark.range(0, int(CPUS) * 4, 1, int(CPUS)).mapInPandas(
        _identity, "id long"
    ).write.format("noop").mode("overwrite").save()

    # construction cost (df build incl. any eager fit jobs) + plan capture
    t_build: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = build(name)
        t_build[name] = round(time.perf_counter() - t0, 4)
        if not args.no_plans:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)

    cold: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        cold[name] = round(run_once(name), 4)
    spark.catalog.clearCache()

    times: dict[str, float] = {name: float("inf") for name in names}
    for _ in range(args.reps):
        for name in names:
            times[name] = min(times[name], run_once(name))
    times = {name: round(t, 4) for name, t in times.items()}

    total = round(sum(times.values()), 4)
    out = {
        "tag": args.tag,
        "sf_dir": SF_DIR,
        "total_warm": total,
        "warm": times,
        "cold": cold,
        "build": t_build,
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
