"""Ingest-throughput benchmark: telnet put-lines → canonical datapoints
→ parquet, the reference's headline metric class (its README claims
10-50× OpenTSDB/InfluxDB ingest with no recorded numbers — BASELINE.md).

Measures the three Spark ingest stages separately, all JVM-side:

  parse      put_lines_to_datapoints over in-memory generated lines
             (split/transform/map_from_entries — whole-stage codegen)
  batch      parse + dt-partitioned parquet write (the TsdbStore.flush
             shape at bulk scale)
  streaming  availableNow file-source → write_datapoints_stream with
             checkpointing (the production continuous-ingest path)

Lines are generated with Spark expressions (no driver loop, no Python in
the hot path) so the number reported is parser+sink cost, not generator
cost. Prints one JSON line: points/sec per stage plus points/sec/core.

Usage: python tools/ingest_bench.py [n_points] [--stream-points M]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ticktock_spark.session import get_spark
from ticktock_spark.sources.parsers import put_lines_to_datapoints

SCRATCH = "/root/repo/.scratch/ingest_bench"


def gen_lines(spark, n: int):
    """n telnet put lines, 8 metrics × 64 hosts, ms timestamps, 2-decimal
    values — the testdata value contract at ingest-realistic cardinality."""
    T0 = 1_704_067_200_000
    return spark.range(n).select(
        F.format_string(
            "put sys.metric%d %d %.2f host=h%d dc=dc%d",
            (F.col("id") % 8).cast("int"),
            (F.lit(T0) + F.col("id") * 37 % 2_592_000_000).cast("long"),
            (F.col("id") % 10_000).cast("double") / 100.0,
            (F.col("id") % 64).cast("int"),
            (F.col("id") % 4).cast("int"),
        ).alias("value")
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 5_000_000
    stream_n = 1_000_000
    if "--stream-points" in sys.argv:
        stream_n = int(sys.argv[sys.argv.index("--stream-points") + 1])

    spark = get_spark(app_name="ingest-bench")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    out = {"n_points": n, "cores": cores, "points_per_sec": {}}

    lines = gen_lines(spark, n)
    lines.write.mode("overwrite").format("text").save(f"{SCRATCH}/lines")
    raw = spark.read.format("text").load(f"{SCRATCH}/lines")

    # parse only (count forces full evaluation, no sink cost)
    t0 = time.monotonic()
    parsed_n = put_lines_to_datapoints(raw).count()
    dt = time.monotonic() - t0
    assert parsed_n == n, (parsed_n, n)
    out["points_per_sec"]["parse"] = round(n / dt)

    # parse + dt-partitioned parquet write (bulk/backfill ingest) — add
    # the seq/dt columns TsdbStore/streaming ingest attach
    t0 = time.monotonic()
    (
        put_lines_to_datapoints(raw)
        .withColumn("seq", F.monotonically_increasing_id())
        .withColumn("dt", F.to_date(F.timestamp_millis(F.col("ts"))))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(f"{SCRATCH}/dps")
    )
    dt = time.monotonic() - t0
    out["points_per_sec"]["batch_write"] = round(n / dt)

    # streaming path: availableNow over a stream_n-line subset
    from ticktock_spark.streaming.ingest import stream_put_lines, write_datapoints_stream

    gen_lines(spark, stream_n).write.mode("overwrite").format("text").save(
        f"{SCRATCH}/stream_in"
    )
    t0 = time.monotonic()
    dps = stream_put_lines(spark, path=f"{SCRATCH}/stream_in")
    q = write_datapoints_stream(
        dps, f"{SCRATCH}/stream_out", f"{SCRATCH}/ckpt", trigger_once=True
    )
    q.awaitTermination(600)
    dt = time.monotonic() - t0
    out["stream_points"] = stream_n
    out["points_per_sec"]["streaming"] = round(stream_n / dt)

    out["points_per_sec_per_core"] = {
        k: round(v / cores) for k, v in out["points_per_sec"].items()
    }
    shutil.rmtree(SCRATCH, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
