"""Data-scaling check for the round-9 operators (the r8 two-axis
recipe, tools/robust_scale_stress.py):

- TIMELINE axis (8× time-shifted events): every op must stay ~linear —
  interarrival / gap_report / compress_audit pay one per-series sort,
  flatline / seasonal_envelope / rollup_error are bucket-scale.
- POINTS axis (8× same-timestamp copies): the bucket-mean-fed ops
  (flatline, seasonal_envelope, rollup_error) must stay ~flat beyond
  the scan — their work is bounded by BUCKET count, which this axis
  does not grow. Point-scale ops (value_precision, compress_audit,
  interarrival) are honestly linear here and measured as such.
- DOCS axis (8× Caesar-shifted fresh-id docs): vocab_coverage is one
  token groupBy + a count-of-counts walk (corpus-linear, tiny window);
  dedup_yield is the q34 LSH + verify pass + a 3-row re-bin
  (candidate-bounded, never all-pairs).

Usage: python tools/round9_scale_stress.py [N]   (default 8)
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

SCRATCH = "/root/repo/.scratch/round9_scale"
MIN_MS = 60_000
HOUR_MS = 3_600_000


def bucket_means(d, bucket_ms=MIN_MS):
    # the canonical exact-decimal implementation — measure the operator
    # shape production routes, never a drifted inline copy
    from ticktock_spark.operators.summary import exact_bucket_means

    return exact_bucket_means(d, ["metric"], bucket_ms)


def run(n: int = 8) -> dict:
    """Programmatic entry (the @pytest.mark.scale tier asserts on the
    returned dict); main() wraps it for the CLI."""
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    out: dict = {"n": n, "ops": {}}
    paths: dict[str, str] = {}

    ev = load_table(spark, "/root/testdata/sf0.1", "events").select(
        F.col("event_type").alias("metric"),
        F.unix_millis("ts").alias("ts"),
        "value",
        F.col("event_id").cast("long").alias("seq"),
    )
    lohi = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    span = int(lohi["hi"] - lohi["lo"]) + HOUR_MS
    copies = spark.range(n).withColumnRenamed("id", "copy")
    shifted = ev.crossJoin(copies).select(
        "metric",
        (F.col("ts") + F.col("copy") * span).alias("ts"),
        "value",
        (F.col("seq") * n + F.col("copy")).alias("seq"),
    )
    stacked = ev.crossJoin(copies).select(
        "metric", "ts", "value", (F.col("seq") * n + F.col("copy")).alias("seq")
    )
    for tag, frame in (("ev_1", ev), (f"ev_shift_{n}", shifted),
                       (f"ev_stack_{n}", stacked)):
        p = f"{SCRATCH}/{tag}x.parquet"
        frame.repartition(32).write.mode("overwrite").parquet(p)
        paths[tag] = p

    from ticktock_spark.operators.robust import seasonal_envelope
    from ticktock_spark.operators.summary import (
        compressibility_audit,
        flatline_runs,
        gap_report,
        interarrival_percentiles,
        rollup_error_audit,
        value_precision_audit,
    )

    def measure(name, fn, tag_1, tag_n):
        res = {}
        for lbl, tag in (("1", tag_1), (str(n), tag_n)):
            d = spark.read.parquet(paths[tag])
            t0 = time.monotonic()
            cnt = fn(d).count()
            res[f"t{lbl}x"] = round(time.monotonic() - t0, 2)
            res[f"rows{lbl}x"] = cnt
        res["ratio"] = round(res[f"t{n}x"] / max(res["t1x"], 1e-9), 1)
        out["ops"][name] = res
        print(name, res, flush=True)

    shift = f"ev_shift_{n}"
    stack = f"ev_stack_{n}"
    measure("interarrival_timeline",
            lambda d: interarrival_percentiles(d, ["metric"]), "ev_1", shift)
    measure("gap_report_timeline",
            lambda d: gap_report(d, ["metric"]), "ev_1", shift)
    measure("compress_audit_timeline",
            lambda d: compressibility_audit(d, ["metric"], seq_col="seq"),
            "ev_1", shift)
    measure("value_precision_timeline",
            lambda d: value_precision_audit(d, ["metric"]), "ev_1", shift)
    measure("flatline_timeline",
            lambda d: flatline_runs(bucket_means(d), ["metric"]),
            "ev_1", shift)
    measure("seasonal_envelope_timeline",
            lambda d: seasonal_envelope(bucket_means(d, HOUR_MS), ["metric"]),
            "ev_1", shift)
    measure("rollup_error_timeline",
            lambda d: rollup_error_audit(d, ["metric"]), "ev_1", shift)
    # points axis: bucket-fed ops must be ~flat beyond the scan
    measure("flatline_points",
            lambda d: flatline_runs(bucket_means(d), ["metric"]),
            "ev_1", stack)
    measure("seasonal_envelope_points",
            lambda d: seasonal_envelope(bucket_means(d, HOUR_MS), ["metric"]),
            "ev_1", stack)
    measure("rollup_error_points",
            lambda d: rollup_error_audit(d, ["metric"]), "ev_1", stack)

    # docs axis
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    lo, up = string.ascii_lowercase, string.ascii_uppercase
    pert = F.col("text")
    for c in range(1, n):
        sh = c * 3 % 25 + 1
        pert = F.when(
            F.col("copy") == c,
            F.translate(F.col("text"), lo + up,
                        lo[sh:] + lo[:sh] + up[sh:] + up[:sh]),
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

    from ticktock_spark.pipeline.dedup import dedup_yield_curve
    from ticktock_spark.pipeline.text import vocab_coverage

    measure("vocab_coverage_docs",
            lambda d: vocab_coverage(d), "docs_1", f"docs_{n}")
    measure("dedup_yield_docs",
            lambda d: dedup_yield_curve(d), "docs_1", f"docs_{n}")
    # r10 (verdict ask #3): CANDIDATE-PAIR counts at 1x/N x — wall
    # clock hides the number that actually predicts 100x cost for the
    # LSH+verify class (the windowed-containment evidence pattern:
    # candidates 11.9x vs quadratic 64x). Same knobs dedup_yield_curve
    # passes to minhash_lsh_candidates.
    from ticktock_spark.pipeline.dedup import minhash_lsh_candidates

    for lbl, tag in (("1", "docs_1"), (str(n), f"docs_{n}")):
        d = spark.read.parquet(paths[tag])
        cnt = minhash_lsh_candidates(
            d, num_hashes=8, bands=4, k=5
        ).count()
        out["ops"]["dedup_yield_docs"][f"candidates{lbl}x"] = cnt
    dy = out["ops"]["dedup_yield_docs"]
    dy["candidates_ratio"] = round(
        dy[f"candidates{n}x"] / max(dy["candidates1x"], 1), 1
    )
    print("dedup_yield candidates:", dy[f"candidates{n}x"], "at",
          f"{n}x vs", dy["candidates1x"], "at 1x →",
          dy["candidates_ratio"], "x (quadratic would be",
          n * n, "x)", flush=True)

    flagged = {
        k: v["ratio"] for k, v in out["ops"].items()
        if v["ratio"] > 2 * n  # grossly super-linear
    }
    out["flagged_superlinear"] = flagged
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(json.dumps(run(n)))


if __name__ == "__main__":
    main()
