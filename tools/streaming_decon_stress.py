"""Throughput check for the streaming decontamination intake gate.

Replicates the sf0.1 documents table N× with fresh ids (per-copy Caesar
shift, same trick as analytics_scale_stress: no cross-copy shared
grams), splits it into F file-source micro-batches, and drives
streaming_decontaminate end-to-end (xxh64 engine, precomputed bench
grams) with trigger availableNow. Reports docs/s over the whole run and
the per-epoch output split — evidence that per-batch cost stays at
batch scale (the bench side is static and derived once).

Usage: python tools/streaming_decon_stress.py [N] [F]   (default 8 16)
"""

from __future__ import annotations

import json
import shutil
import string
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ticktock_spark.pipeline.dedup import benchmark_grams
from ticktock_spark.schema import load_table
from ticktock_spark.session import get_spark
from ticktock_spark.streaming.decontaminate import streaming_decontaminate

SCRATCH = "/root/repo/.scratch/streaming_decon"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    nfiles = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    bench_src = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    copies = spark.range(n).withColumnRenamed("id", "copy")
    lo, up = string.ascii_lowercase, string.ascii_uppercase
    pert = F.col("text")
    for c in range(1, n):
        sh = c * 3 % 25 + 1
        pert = F.when(
            F.col("copy") == c,
            F.translate(F.col("text"), lo + up, lo[sh:] + lo[:sh] + up[sh:] + up[:sh]),
        ).otherwise(pert)
    big = train.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
        pert.alias("text"),
    )
    in_path = f"{SCRATCH}/in"
    big.repartition(nfiles).write.mode("overwrite").json(in_path)
    n_docs = spark.read.json(in_path).count()

    bench = benchmark_grams(bench_src, n=3).persist()
    bench.count()  # materialize before the clock starts

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", max(1, nfiles // 8))
        .json(in_path)
    )
    t0 = time.monotonic()
    q = streaming_decontaminate(
        stream,
        bench_src,
        f"{SCRATCH}/clean",
        f"{SCRATCH}/report",
        f"{SCRATCH}/ckpt",
        n=3,
        hash_grams=True,
        bench_grams_df=bench,
    )
    q.awaitTermination()
    wall = time.monotonic() - t0

    clean = spark.read.parquet(f"{SCRATCH}/clean")
    report = spark.read.parquet(f"{SCRATCH}/report")
    epochs = sorted(
        r["__epoch"] for r in report.select("__epoch").distinct().collect()
    )
    out = {
        "n_docs": n_docs,
        "files": nfiles,
        "epochs": len(epochs),
        "wall_s": round(wall, 2),
        "docs_per_s": round(n_docs / wall),
        "clean": clean.count(),
        "flagged": report.count(),
    }
    print(json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
