"""Streaming end-to-end latency stress (r5 verdict #8): sustained
put-line arrival → stream_put_lines → write_datapoints_stream_with_series
(parquet + series dim) → streaming_rollup_1h from the written table →
rollup parquet, measuring TRIGGER LAG and post-arrival drain freshness
at escalating arrival rates.

Load shape: put lines are pre-generated JVM-side (one text file per
"arrival", 8 metrics × 64 hosts — ingest_bench's cardinality), then a
feeder thread renames one staged file into the watched directory every
``interval`` seconds — arrival rate = lines_per_file / interval. Event
timestamps advance ONE HOUR per file with a 1-second watermark, so each
arrival closes the previous hour's rollup windows (append-mode parquet
can only emit closed windows; the stress measures engine lag, not
watermark policy).

Reported per rate, from StreamingQuery.recentProgress + polling:
  * ingest_lag_avg/max  — ingest batchDuration (ms) vs the 2 s trigger
  * rollup_lag_avg/max  — rollup batchDuration (ms)
  * keeps_up            — processedRowsPerSecond >= arrival rate
  * drain_sec           — after the LAST file lands, seconds until the
                          datapoint sink holds every fed row
  * rollup_fresh_sec    — seconds until every closable hour window is
                          in the rollup sink

Usage: python tools/streaming_latency_stress.py [base_rate] [rates...]
       (defaults: base 50_000 lines/s, rates 1x 2x 4x)
Prints one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ticktock_spark.session import get_spark

SCRATCH = "/root/repo/.scratch/stream_latency"
T0 = 1_704_067_200_000  # 2024-01-01
N_FILES = 20
TRIGGER_SEC = 2


def gen_staged_files(spark, lines_per_file: int) -> list[str]:
    """N_FILES text files of put lines; file i's event times live in
    hour i (closing hour i-1 on arrival under a 1 s watermark)."""
    staging = f"{SCRATCH}/staging"
    shutil.rmtree(staging, ignore_errors=True)
    for i in range(N_FILES):
        (
            spark.range(lines_per_file)
            .select(
                F.format_string(
                    "put sys.metric%d %d %.2f host=h%d dc=dc%d",
                    (F.col("id") % 8).cast("int"),
                    (
                        F.lit(T0 + i * 3_600_000)
                        + (F.col("id") * 37) % 3_600_000
                    ).cast("long"),
                    (F.col("id") % 10_000).cast("double") / 100.0,
                    (F.col("id") % 64).cast("int"),
                    (F.col("id") % 4).cast("int"),
                ).alias("value")
            )
            .coalesce(1)
            .write.mode("append")
            .text(f"{staging}/f{i:03d}")
        )
    out = []
    for i in range(N_FILES):
        d = f"{staging}/f{i:03d}"
        part = next(p for p in os.listdir(d) if p.startswith("part-"))
        out.append(os.path.join(d, part))
    return out


def run_rate(spark, rate: int, lines_per_file: int) -> dict:
    from ticktock_spark.schema import DATAPOINTS_SCHEMA
    from ticktock_spark.streaming.ingest import (
        stream_put_lines,
        write_datapoints_stream_with_series,
    )
    from ticktock_spark.streaming.rollup import streaming_rollup_1h

    tag = f"r{rate}"
    for sub in ("in", "dps", "series", "ck1", "rollup", "ck2"):
        shutil.rmtree(f"{SCRATCH}/{tag}/{sub}", ignore_errors=True)
    in_dir = f"{SCRATCH}/{tag}/in"
    os.makedirs(in_dir, exist_ok=True)
    staged = gen_staged_files(spark, lines_per_file)
    interval = lines_per_file / rate

    dps = stream_put_lines(spark, path=in_dir, fmt="put")
    # pre-create the handoff directory so the chained file source can
    # attach before the first ingest batch commits
    os.makedirs(f"{SCRATCH}/{tag}/dps", exist_ok=True)
    q1 = write_datapoints_stream_with_series(
        dps, f"{SCRATCH}/{tag}/dps", f"{SCRATCH}/{tag}/ck1",
        f"{SCRATCH}/{tag}/series",
    )
    # chained stage: file-stream over the datapoint sink (its
    # _spark_metadata log makes the handoff exactly-once)
    dps_stream = (
        spark.readStream.schema(DATAPOINTS_SCHEMA)
        .parquet(f"{SCRATCH}/{tag}/dps")
    )
    rollup = streaming_rollup_1h(dps_stream, watermark="1 second")
    q2 = (
        rollup.writeStream.format("parquet")
        .option("path", f"{SCRATCH}/{tag}/rollup")
        .option("checkpointLocation", f"{SCRATCH}/{tag}/ck2")
        .outputMode("append")
        .trigger(processingTime=f"{TRIGGER_SEC} seconds")
        .start()
    )

    def feeder():
        nxt = time.monotonic()
        for i, src in enumerate(staged):
            tmp = os.path.join(in_dir, f".arrival-{i:03d}.tmp")
            shutil.copy(src, tmp)
            os.rename(tmp, os.path.join(in_dir, f"arrival-{i:03d}.txt"))
            nxt += interval
            dt = nxt - time.monotonic()
            if dt > 0:
                time.sleep(dt)

    t_start = time.monotonic()
    th = threading.Thread(target=feeder)
    th.start()
    th.join()
    t_fed = time.monotonic()

    total = N_FILES * lines_per_file
    drain_sec = None
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        try:
            n = spark.read.parquet(f"{SCRATCH}/{tag}/dps").count()
        except Exception:  # noqa: BLE001 — sink not created yet
            n = 0
        if n >= total:
            drain_sec = round(time.monotonic() - t_fed, 2)
            break
        time.sleep(0.5)

    # every hour < N_FILES-1 is closable once the last file's watermark
    # lands: 8 metrics × 64 hosts × 4 dcs = 512 series per hour... but
    # host/dc align (id mod) — count the actual distinct series instead
    expect_hours = N_FILES - 1
    rollup_fresh_sec = None
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        try:
            got_hours = (
                spark.read.parquet(f"{SCRATCH}/{tag}/rollup")
                .select("bucket_ts").distinct().count()
            )
        except Exception:  # noqa: BLE001
            got_hours = 0
        if got_hours >= expect_hours:
            rollup_fresh_sec = round(time.monotonic() - t_fed, 2)
            break
        time.sleep(0.5)

    def lag(q):
        ds = [p["batchDuration"] for p in q.recentProgress
              if p.get("numInputRows", 0) > 0 and "batchDuration" in p]
        if not ds:
            return None, None
        return round(sum(ds) / len(ds)), max(ds)

    i_avg, i_max = lag(q1)
    r_avg, r_max = lag(q2)
    q1.stop()
    q2.stop()
    fed_rate = round(total / (t_fed - t_start))
    return {
        "rate_target": rate,
        "rate_fed": fed_rate,
        "lines": total,
        "ingest_lag_avg_ms": i_avg,
        "ingest_lag_max_ms": i_max,
        "rollup_lag_avg_ms": r_avg,
        "rollup_lag_max_ms": r_max,
        "drain_sec": drain_sec,
        "rollup_fresh_sec": rollup_fresh_sec,
        "keeps_up": drain_sec is not None and drain_sec <= 3 * TRIGGER_SEC,
    }


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    base = args[0] if args else 50_000
    mults = args[1:] if len(args) > 1 else [1, 2, 4]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for m in mults:
        rate = base * m
        # ~20 s of sustained arrivals per rate
        lines_per_file = max(1000, rate * 20 // N_FILES)
        res = run_rate(spark, rate, lines_per_file)
        print(json.dumps(res), flush=True)
        out.append(res)
    print(json.dumps({"runs": out}))


if __name__ == "__main__":
    main()
