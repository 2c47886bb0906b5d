"""streaming_anomaly throughput/latency stress (r6 verdict ask #6).

Replays a high-cardinality point stream (512 series × 8 files) through
the live anomaly scorer — stateful recursive EWMA + broadcast seasonal
profile join — and reports per-micro-batch durations and sustained
rows/s from StreamingQuery.recentProgress. Flat batch durations across
files = the O(1)-state claim holds under load; rows/s is the single-host
ceiling to scale by executor count.

Usage: python tools/anomaly_latency_stress.py [rows_per_file] [n_files]
Prints one JSON line; paste into SCALE.md.
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

SCRATCH = "/root/repo/.scratch/anomaly_latency"
N_SERIES = 512


def main() -> None:
    rows_per_file = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(f"{SCRATCH}/in", exist_ok=True)

    # point lines: series s{i%512}, monotone us stepping 1 min per row
    # within a series, value varying; one file per micro-batch
    for fi in range(n_files):
        (
            spark.range(rows_per_file)
            .select(
                F.format_string(
                    "s%d %d %d %.2f",
                    F.col("id") % N_SERIES,
                    F.lit(fi * rows_per_file).cast("long") * F.lit(60_000_000).cast("long")
                    + (F.col("id") / N_SERIES).cast("long") * F.lit(60_000_000).cast("long"),
                    F.col("id") + fi * rows_per_file,
                    (F.col("id") % 97).cast("double") * 0.5,
                ).alias("value")
            )
            .coalesce(1)
            .write.mode("overwrite")
            .text(f"{SCRATCH}/stage/{fi}")
        )
        part = [
            f
            for f in os.listdir(f"{SCRATCH}/stage/{fi}")
            if f.startswith("part-")
        ][0]
        os.rename(
            f"{SCRATCH}/stage/{fi}/{part}", f"{SCRATCH}/in/f{fi}.txt"
        )

    profile = spark.createDataFrame(
        [(f"s{i}", h, float(24.0)) for i in range(N_SERIES) for h in range(24)],
        "series string, hour_utc int, hour_avg double",
    )

    from ticktock_spark.streaming.anomaly import streaming_anomaly

    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(f"{SCRATCH}/in")
    )
    p = F.split("value", " ")
    stream = lines.select(
        p.getItem(0).alias("series"),
        p.getItem(1).cast("long").alias("us"),
        p.getItem(2).cast("long").alias("seq"),
        p.getItem(3).cast("double").alias("value"),
    )
    t0 = time.monotonic()
    # applyInPandasWithState emits in update mode, which the parquet
    # sink rejects — foreachBatch bridges to an append-only parquet
    # write exactly like the production ingest sinks do
    def write_batch(bdf, _bid):
        bdf.write.mode("append").parquet(f"{SCRATCH}/out")

    q = (
        streaming_anomaly(stream, profile, alpha=0.5)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", f"{SCRATCH}/ckpt")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    batches = [
        {
            "batch": pr["batchId"],
            "rows": pr["numInputRows"],
            "duration_ms": pr["batchDuration"],
        }
        for pr in (q.recentProgress or [])
        if pr["numInputRows"]
    ]
    total = rows_per_file * n_files
    out_rows = spark.read.parquet(f"{SCRATCH}/out").count()
    print(
        json.dumps(
            {
                "rows_per_file": rows_per_file,
                "n_files": n_files,
                "n_series": N_SERIES,
                "total_rows": total,
                "out_rows": out_rows,
                "wall_s": round(wall, 1),
                "rows_per_s": round(total / wall),
                "batches": batches,
            }
        )
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
