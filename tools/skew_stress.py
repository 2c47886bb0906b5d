"""Skew robustness stress — the r8 verdict's two skew asks in one tool.

1. GRAM SKEW (verdict "what's wrong #1"): plant ONE word 3-gram in 50%
   of the 8x documents corpus and compare the skew-hardened
   gram_duplication / gram_novelty / decontaminate_rarity against their
   pre-r9 window forms (reconstructed inline as `*_window_form`) on the
   SAME data. The hardened forms aggregate the gram key with map-side-
   combinable groupBys (hot gram folds to one row per map task before
   the exchange; the rarity join-back is AQE-splittable), so their
   skew/uniform wall ratio must stay ~1. The window forms put every hot-
   gram row through one un-splittable window task — at this local volume
   that task is milliseconds, so the local wall-ratio understates the
   cluster effect; the tool therefore ALSO reports the hot gram's
   document frequency (= the row count of the biggest window partition
   the old form would create) next to the hardened form's bounded
   per-task share.

2. HOT-SERIES SKEW (verdict "next round #5"): one series holding 50% of
   an 8x events corpus' points (every prior stress replicated sf0.1
   uniformly). Runs the analytics tier in its product query shapes
   (q180/q181/q182 over bucket means, q183/q188/q194 over raw points,
   q170/q171 over bucket means) on the skewed corpus vs the uniform 8x
   control. Per-series window partitions are bucket-bounded by module
   contract (operators/robust.py header), so a hot series only skews
   the bucket-mean groupBy — which is map-side combinable — and each
   ratio must stay ~1 (flag: > 2).

Usage: python tools/skew_stress.py [N]   (default 8)
Prints one JSON line; evidence rows for SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import string
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window, functions as F

from ticktock_spark.schema import load_table
from ticktock_spark.session import get_spark

SCRATCH = "/root/repo/.scratch/skew_stress"
MIN_MS = 60_000
HOUR_MS = 3_600_000
HOT_GRAM_TAIL = " zzq hotgram zzmarker"  # one planted word 3-gram


def bucket_means(d, bucket_ms=MIN_MS):
    # the canonical exact-decimal implementation — measure the operator
    # shape production routes, never a drifted inline copy
    from ticktock_spark.operators.summary import exact_bucket_means

    return exact_bucket_means(d, ["metric"], bucket_ms)


def gram_duplication_window_form(df, n=3):
    """The pre-r9 form, for the A/B: df-count as an unordered window
    over the gram key — the partition AQE cannot split."""
    from ticktock_spark.pipeline.dedup import _doc_grams

    dg = _doc_grams(df, n, "text", "doc_id")
    return (
        dg.withColumn("gdf", F.count(F.lit(1)).over(Window.partitionBy("gram")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count(F.when(F.col("gdf") >= 2, 1)).cast("long").alias("n_dup"),
        )
    )


def gram_novelty_window_form(df, n=3):
    from ticktock_spark.pipeline.dedup import _doc_grams

    dg = _doc_grams(df, n, "text", "doc_id")
    return (
        dg.withColumn("first_id", F.min("doc_id").over(Window.partitionBy("gram")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count(F.when(F.col("first_id") == F.col("doc_id"), 1))
            .cast("long")
            .alias("n_new"),
        )
    )


def run(n: int = 8) -> dict:
    """Programmatic entry (the @pytest.mark.scale tier asserts on the
    returned dict); main() wraps it for the CLI."""
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    out: dict = {"n": n, "gram": {}, "series": {}}
    paths: dict[str, str] = {}

    def write(tag, frame):
        p = f"{SCRATCH}/{tag}.parquet"
        frame.repartition(32).write.mode("overwrite").parquet(p)
        paths[tag] = p

    # ---- gram-skew corpus: 8x Caesar-shifted copies (the
    # robust_scale_stress recipe), then ONE gram planted in 50% of docs
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    copies = spark.range(n).withColumnRenamed("id", "copy")
    lo, up = string.ascii_lowercase, string.ascii_uppercase
    pert = F.col("text")
    for c in range(1, n):
        sh = c * 3 % 25 + 1
        pert = F.when(
            F.col("copy") == c,
            F.translate(
                F.col("text"), lo + up, lo[sh:] + lo[:sh] + up[sh:] + up[:sh]
            ),
        ).otherwise(pert)
    big = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
        pert.alias("text"),
    )
    write("docs_uniform", big)
    write(
        "docs_skew",
        big.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.concat("text", F.lit(HOT_GRAM_TAIL))
            ).otherwise(F.col("text")),
        ),
    )

    from ticktock_spark.pipeline.dedup import (
        decontaminate_rarity,
        gram_duplication,
        gram_novelty,
    )

    def ab(name, fn):
        res = {}
        for lbl in ("uniform", "skew"):
            d = spark.read.parquet(paths[f"docs_{lbl}"])
            t0 = time.monotonic()
            res[f"rows_{lbl}"] = fn(d).count()
            res[f"t_{lbl}"] = round(time.monotonic() - t0, 2)
        res["ratio"] = round(res["t_skew"] / max(res["t_uniform"], 1e-9), 2)
        out["gram"][name] = res
        print(name, res, flush=True)

    ab("gram_duplication", lambda d: gram_duplication(d, n=3))
    ab("gram_duplication_WINDOW_FORM", lambda d: gram_duplication_window_form(d))
    ab("gram_novelty", lambda d: gram_novelty(d, n=3))
    ab("gram_novelty_WINDOW_FORM", lambda d: gram_novelty_window_form(d))
    ab(
        "rarity_decontaminate",
        lambda d: decontaminate_rarity(
            d.filter(F.col("doc_id") % 97 != 0),
            d.filter(F.col("doc_id") % 97 == 0),
            n=3,
        ),
    )
    # the biggest window partition the old form would have to sort on
    # one task (= hot-gram document frequency at this volume)
    skew_docs = spark.read.parquet(paths["docs_skew"])
    hot_df = (
        skew_docs.filter(F.col("text").contains("zzq hotgram zzmarker")).count()
    )
    out["gram"]["hot_gram_df"] = hot_df
    print("hot_gram_df (old form: rows through ONE window task):", hot_df, flush=True)

    # ---- hot-series events corpus: 8x stacked; copies 0..n/2-1 are
    # remapped onto ONE metric ('hot') so it holds 50% of all points
    ev = load_table(spark, "/root/testdata/sf0.1", "events").select(
        F.col("event_type").alias("metric"),
        F.unix_millis("ts").alias("ts"),
        "value",
    )
    lohi = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    mid = int(lohi["lo"]) + (int(lohi["hi"] - lohi["lo"]) + HOUR_MS) // 2
    stacked = ev.crossJoin(copies)
    write("ev_uniform", stacked.select("metric", "ts", "value"))
    write(
        "ev_skew",
        stacked.select(
            F.when(F.col("copy") < n // 2, F.lit("hot"))
            .otherwise(F.col("metric"))
            .alias("metric"),
            "ts",
            "value",
        ),
    )

    from ticktock_spark.operators.correlate import acf
    from ticktock_spark.operators.drift import wasserstein_drift
    from ticktock_spark.operators.robust import (
        mad_outliers,
        seasonal_strength,
        theil_sen,
    )
    from ticktock_spark.operators.rolling import mean_shift_score
    from ticktock_spark.operators.summary import (
        fano_factor,
        histogram_quantiles,
        value_histogram,
    )

    def ab_ev(name, fn):
        res = {}
        for lbl in ("uniform", "skew"):
            d = spark.read.parquet(paths[f"ev_{lbl}"])
            t0 = time.monotonic()
            res[f"rows_{lbl}"] = fn(d).count()
            res[f"t_{lbl}"] = round(time.monotonic() - t0, 2)
        res["ratio"] = round(res["t_skew"] / max(res["t_uniform"], 1e-9), 2)
        out["series"][name] = res
        print(name, res, flush=True)

    ab_ev("mad_outliers_q180", lambda d: mad_outliers(bucket_means(d), ["metric"]))
    ab_ev(
        "theilsen_q181",
        lambda d: theil_sen(bucket_means(d, HOUR_MS), ["metric"], HOUR_MS),
    )
    ab_ev(
        "seasonal_strength_q182",
        lambda d: seasonal_strength(bucket_means(d), ["metric"]),
    )
    ab_ev(
        "wasserstein_q183",
        lambda d: wasserstein_drift(
            d, F.col("ts") < F.lit(mid), group_cols=["metric"]
        ),
    )
    ab_ev("fano_q188", lambda d: fano_factor(d, ["metric"], bucket_ms=MIN_MS))
    ab_ev(
        "histogram_quantile_q194",
        lambda d: histogram_quantiles(
            value_histogram(d, ["metric"], width=10.0), [0.5, 0.99], width=10.0
        ),
    )
    ab_ev(
        "acf_q170",
        lambda d: acf(bucket_means(d), ["metric"], max_lag=60, bucket_ms=MIN_MS),
    )
    ab_ev(
        "changepoint_q171",
        lambda d: mean_shift_score(bucket_means(d), ["metric"]),
    )
    # r10: the RAW-POINT ops the r9 stress skipped (verdict "what's
    # wrong #1") — one series holding 50% of all points. Since the
    # segment-stitch rewrite their lag windows partition on (series,
    # day-slice), so the hot series fans across slices instead of one
    # sort task; ratios must stay ~1.
    from ticktock_spark.operators.summary import (
        compressibility_audit,
        interarrival_percentiles,
    )

    ab_ev(
        "interarrival_q195",
        lambda d: interarrival_percentiles(d, ["metric"]),
    )
    ab_ev(
        "compress_audit_q203",
        lambda d: compressibility_audit(d, ["metric"]),
    )

    flagged = {
        k: v["ratio"]
        for sec in ("gram", "series")
        for k, v in out[sec].items()
        if isinstance(v, dict) and v.get("ratio", 0) > 2
        and not k.endswith("_WINDOW_FORM")
    }
    out["flagged_over_2x"] = flagged
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(json.dumps(run(n)))


if __name__ == "__main__":
    main()


