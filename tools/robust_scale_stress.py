"""Data-scaling check for the round-8 robust/gram operators.

Two scaling axes, because the operators bound their cost differently:

- TIMELINE axis: N time-shifted copies of the sf0.1 events table (the
  bucket timeline grows N×) — mad_outliers / seasonal_strength /
  wasserstein_drift must stay ~linear here.
- POINTS axis: N same-timestamp copies (rows-per-bucket grows N×, the
  timeline doesn't) — theil_sen's quadratic pair fan-out is in BUCKETS,
  so its wall must stay ~flat on this axis (and is documented quadratic
  on the timeline axis, with bucket_ms as the knob: pairs =
  (span/bucket_ms)² regardless of datapoint volume).
- DOCS axis: N Caesar-shifted fresh-id copies of the documents table
  (the analytics_scale_stress recipe — within-copy relations replicate,
  no cross-copy gram sharing) — gram_duplication / gram_novelty /
  decontaminate_rarity are one gram-keyed groupBy each and must stay
  ~linear.

Usage: python tools/robust_scale_stress.py [N]   (default 8)
Prints one JSON line; evidence rows for SCALE.md.
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

SCRATCH = "/root/repo/.scratch/robust_scale"
MIN_MS = 60_000
HOUR_MS = 3_600_000


def bucket_means(d, bucket_ms=MIN_MS):
    # the canonical exact-decimal implementation — measure the operator
    # shape production routes, never a drifted inline copy
    from ticktock_spark.operators.summary import exact_bucket_means

    return exact_bucket_means(d, ["metric"], bucket_ms)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)

    ev = load_table(spark, "/root/testdata/sf0.1", "events").select(
        F.col("event_type").alias("metric"),
        F.unix_millis("ts").alias("ts"),
        "value",
    )
    lohi = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    span = int(lohi["hi"] - lohi["lo"]) + HOUR_MS
    mid_1x = int(lohi["lo"]) + span // 2
    mid_nx = int(lohi["lo"]) + n * span // 2
    copies = spark.range(n).withColumnRenamed("id", "copy")
    shifted = ev.crossJoin(copies).select(
        "metric", (F.col("ts") + F.col("copy") * span).alias("ts"), "value"
    )
    stacked = ev.crossJoin(copies).select("metric", "ts", "value")
    paths = {}
    for tag, frame in (
        ("ev_1", ev),
        (f"ev_shift_{n}", shifted),
        (f"ev_stack_{n}", stacked),
    ):
        p = f"{SCRATCH}/{tag}x.parquet"
        frame.repartition(32).write.mode("overwrite").parquet(p)
        paths[tag] = p

    from ticktock_spark.operators.drift import wasserstein_drift
    from ticktock_spark.operators.robust import (
        mad_outliers,
        seasonal_strength,
        theil_sen,
    )

    out: dict = {"n": n, "ops": {}}

    def measure(name, fn, tag_1, tag_n):
        res = {}
        for lbl, tag in (("1", tag_1), (str(n), tag_n)):
            d = spark.read.parquet(paths[tag])
            t0 = time.monotonic()
            cnt = fn(d, lbl).count()
            res[f"t{lbl}x"] = round(time.monotonic() - t0, 2)
            res[f"rows{lbl}x"] = cnt
        res["ratio"] = round(res[f"t{n}x"] / max(res["t1x"], 1e-9), 1)
        out["ops"][name] = res
        print(name, res, flush=True)

    measure(
        "mad_outliers_timeline",
        lambda d, _: mad_outliers(bucket_means(d), ["metric"]),
        "ev_1",
        f"ev_shift_{n}",
    )
    measure(
        "seasonal_strength_timeline",
        lambda d, _: seasonal_strength(bucket_means(d), ["metric"]),
        "ev_1",
        f"ev_shift_{n}",
    )
    measure(
        "wasserstein_timeline",
        lambda d, lbl: wasserstein_drift(
            d,
            F.col("ts") < F.lit(mid_1x if lbl == "1" else mid_nx),
            group_cols=["metric"],
        ),
        "ev_1",
        f"ev_shift_{n}",
    )
    # theil_sen: POINTS axis — rows-per-bucket grows N x, bucket count
    # (and therefore the quadratic pair fan-out) does not
    measure(
        "theilsen_points",
        lambda d, _: theil_sen(bucket_means(d, HOUR_MS), ["metric"], HOUR_MS),
        "ev_1",
        f"ev_stack_{n}",
    )

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    lo, up = string.ascii_lowercase, string.ascii_uppercase
    pert = F.col("text")
    for c in range(1, n):
        sh = c * 3 % 25 + 1
        pert = F.when(
            F.col("copy") == c,
            F.translate(
                F.col("text"),
                lo + up,
                lo[sh:] + lo[:sh] + up[sh:] + up[:sh],
            ),
        ).otherwise(pert)
    big_docs = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
        pert.alias("text"),
    )
    for tag, frame in (("docs_1", docs.select("doc_id", "text")),
                       (f"docs_{n}", big_docs)):
        p = f"{SCRATCH}/{tag}x.parquet"
        frame.repartition(32).write.mode("overwrite").parquet(p)
        paths[tag] = p

    from ticktock_spark.pipeline.dedup import (
        decontaminate_rarity,
        gram_duplication,
        gram_novelty,
    )

    measure(
        "gram_duplication_docs",
        lambda d, _: gram_duplication(d, n=3),
        "docs_1",
        f"docs_{n}",
    )
    measure(
        "gram_novelty_docs",
        lambda d, _: gram_novelty(d, n=3),
        "docs_1",
        f"docs_{n}",
    )
    measure(
        "rarity_decontaminate_docs",
        lambda d, _: decontaminate_rarity(
            d.filter(F.col("doc_id") % 97 != 0),
            d.filter(F.col("doc_id") % 97 == 0),
            n=3,
        ),
        "docs_1",
        f"docs_{n}",
    )

    # q194 histogram_quantile: TIMELINE axis (bins are value-bounded, so
    # 8x the points must be ~flat beyond the scan) — the PRODUCT
    # operators, not a copy
    from ticktock_spark.operators.summary import (
        histogram_quantiles,
        value_histogram,
    )

    measure(
        "histogram_quantile_timeline",
        lambda d, _: histogram_quantiles(
            value_histogram(d, ["metric"], width=10.0),
            [0.5, 0.99],
            width=10.0,
        ),
        "ev_1",
        f"ev_shift_{n}",
    )

    # q193 centroid probe: EMBEDDINGS axis (fresh-id copies, labels kept
    # -- centroids average over 8x the vectors, scoring is O(N*L))
    from ticktock_spark.pipeline.similarity import centroid_label_agreement

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    big_emb = emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
        "embedding",
        "label",
    )
    for tag, frame in (("emb_1", emb), (f"emb_{n}", big_emb)):
        p2 = f"{SCRATCH}/{tag}x.parquet"
        frame.repartition(32).write.mode("overwrite").parquet(p2)
        paths[tag] = p2

    measure(
        "centroid_probe_embeddings",
        lambda d, _: centroid_label_agreement(d),
        "emb_1",
        f"emb_{n}",
    )
    print(json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
