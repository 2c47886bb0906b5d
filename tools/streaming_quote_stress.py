"""Scale check for the streaming quote/containment screen.

The design claim: the per-micro-batch cost of screening arrivals is
governed by the BATCH (its hash work + matched candidates), not by the
corpus — the corpus side is two persisted static indexes probed by
stream-static hash joins. Replicate the sf0.1 corpus N× (per-copy
Caesar shift: arrivals quote copy-0 docs only, so true matches stay
constant while the index grows N×), hold the arrival set fixed, and
compare the screen's wall at 1× vs N×. The one-off index build is
timed separately (that part IS corpus-linear, by design — it is the
artifact a 100 TB deployment materializes per corpus version).

Usage: python tools/streaming_quote_stress.py [N]   (default 8)
"""

from __future__ import annotations

import json
import shutil
import string
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ticktock_spark.schema import load_table
from ticktock_spark.session import get_spark
from ticktock_spark.streaming.containment import (
    corpus_containment_state,
    streaming_quote_screen,
)

SCRATCH = "/root/repo/.scratch/streaming_quote"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    copies = spark.range(n).withColumnRenamed("id", "copy")
    lo, up = string.ascii_lowercase, string.ascii_uppercase
    pert = F.col("text")
    for c in range(1, n):
        sh = c * 3 % 25 + 1
        pert = F.when(
            F.col("copy") == c,
            F.translate(F.col("text"), lo + up, lo[sh:] + lo[:sh] + up[sh:] + up[:sh]),
        ).otherwise(pert)
    big = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
        pert.alias("text"),
    )

    # fixed arrival set: 250 tile-aligned quotes of copy-0 long docs
    # (words 13..36 = the stride-12 tile) + 250 clean synthetic docs
    w = docs.select("doc_id", F.split("text", " ").alias("_w"))
    quotes = (
        w.filter(F.size("_w") > 36)
        .orderBy("doc_id")
        .limit(250)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.array_join(F.slice("_w", 13, 24), " ").alias("text"),
        )
    )
    clean = spark.range(250).select(
        (F.col("id") + 20_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.array([F.concat(F.lit(f"zq{j}x"), F.col("id")) for j in range(30)]),
        ).alias("text"),
    )
    in_path = f"{SCRATCH}/in"
    quotes.unionByName(clean).repartition(4).write.mode("overwrite").json(in_path)

    out = {"n": n, "arrivals": spark.read.json(in_path).count(), "corpus": {}}
    for tag, corp in (("1", docs), (str(n), big)):
        t0 = time.monotonic()
        state = tuple(fr.persist() for fr in corpus_containment_state(corp))
        sizes = [fr.count() for fr in state]
        build = round(time.monotonic() - t0, 2)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(in_path)
        )
        t0 = time.monotonic()
        q = streaming_quote_screen(
            stream, state, f"{SCRATCH}/out_{tag}", f"{SCRATCH}/ckpt_{tag}",
            threshold=0.8,
        )
        q.awaitTermination()
        wall = round(time.monotonic() - t0, 2)
        flagged = spark.read.parquet(f"{SCRATCH}/out_{tag}").count()
        out["corpus"][tag] = {
            "docs": corp.count(),
            "index_rows": sizes,
            "build_s": build,
            "screen_wall_s": wall,
            "flagged_pairs": flagged,
        }
        for fr in state:
            fr.unpersist()
        print(tag, out["corpus"][tag], flush=True)
    r = out["corpus"]
    out["screen_ratio"] = round(
        r[str(n)]["screen_wall_s"] / max(r["1"]["screen_wall_s"], 1e-9), 2
    )
    print(json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
