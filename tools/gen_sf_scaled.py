"""Synthesize an N× scaled copy of a testdata sf dir (default: sf0.1 ×10
≈ "sf1") for full-corpus bench scaling runs — the r9 verdict's ask #4:
per-op 8× stress axes can hide cross-op interactions (cache pressure,
AQE coalescing) that one corpus-wide headline run surfaces.

Recipes keep the data semantically honest at N× so per-query ratios are
interpretable (growth ≈ N for scans, never fabricated quadratics):

- region / nation: copied verbatim (TPC-H dims don't scale).
- customer / supplier / part / orders / lineitem: N copies with every
  key domain shifted by copy × 10_000_000, consistently across tables
  (referential integrity holds within each copy; joins stay 1:1).
- events: N user-shifted copies in the SAME time window — N× the
  series per metric, per-series cadence and bucket counts unchanged.
  This is the realistic sf growth shape (a bigger fleet emits more
  series over the same month, not a 10× longer month), it keeps
  metric-pinned TSDB queries seeing real N× growth, and it respects
  per-series bucket guards (theil_sen max_buckets) that a timeline
  stretch would trip.
- documents: N Caesar-shifted copies with fresh doc_ids — cross-copy
  shingles differ, so dedup/gram ops see real corpus growth, not
  planted duplicate blowup (the robust_scale_stress recipe).
- embeddings: N copies with a per-copy deterministic ±1 sign mask
  multiplied elementwise — norms and within-copy geometry preserved,
  cross-copy cosines scrambled, so near-dup/ANN ops see N× genuinely
  distinct vectors instead of N-cliques of exact duplicates.

Usage: python tools/gen_sf_scaled.py [N] [src_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 /root/repo/.scratch/sf1
Then: SPARK_GRAFT_SF_DIR=/root/repo/.scratch/sf1 python bench.py
"""

from __future__ import annotations

import random
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ticktock_spark.session import get_spark

STRIDE = 10_000_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scratch/sf1"
    spark = get_spark(app_name="gen-sf-scaled")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(out, ignore_errors=True)
    copies = spark.range(n).withColumnRenamed("id", "copy")

    def write(name, df, parts=64):
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: {df.count()} rows", flush=True)

    def read(name):
        return spark.read.parquet(f"{src}/{name}.parquet")

    shift = lambda c: (F.col(c) + F.col("copy") * STRIDE).alias(c)  # noqa: E731

    # dims copied verbatim
    for t in ("region", "nation"):
        write(t, read(t), parts=1)

    write("customer", read("customer").crossJoin(copies).select(
        shift("c_custkey"), "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"))
    write("supplier", read("supplier").crossJoin(copies).select(
        shift("s_suppkey"), "s_name", "s_nationkey", "s_acctbal"), parts=4)
    write("part", read("part").crossJoin(copies).select(
        shift("p_partkey"), "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice"), parts=8)
    write("orders", read("orders").crossJoin(copies).select(
        shift("o_orderkey"), shift("o_custkey"), "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"))
    write("lineitem", read("lineitem").crossJoin(copies).select(
        shift("l_orderkey"), shift("l_partkey"), shift("l_suppkey"),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"))

    write("events", read("events").crossJoin(copies).select(
        shift("event_id"), "ts", shift("user_id"), "event_type",
        "value", "props"))

    import string

    lo_a, up_a = string.ascii_lowercase, string.ascii_uppercase
    # The per-copy Caesar shift c*3 % 25 + 1 cycles with period 25, so a
    # 26th copy would be byte-identical to copy 1 — planted exact-dup
    # cliques that break the "real corpus growth, not planted
    # duplicates" guarantee. Hard-stop rather than silently plant them.
    if n > 25:
        raise SystemExit(
            "documents recipe supports n <= 25 distinct copies (the "
            "alphabet-shift perturbation repeats with period 25); "
            f"got n={n}. Extend the perturbation before scaling further."
        )
    pert = F.col("text")
    for c in range(1, n):
        sh = c * 3 % 25 + 1
        pert = F.when(
            F.col("copy") == c,
            F.translate(
                F.col("text"), lo_a + up_a,
                lo_a[sh:] + lo_a[:sh] + up_a[sh:] + up_a[:sh],
            ),
        ).otherwise(pert)
    write("documents", read("documents").crossJoin(copies).select(
        shift("doc_id"), pert.alias("text"), "lang", "source", "n_chars"),
        parts=32)

    emb = read("embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    rng = random.Random(1001)
    masks = [
        (c, [1.0] * dim if c == 0
         else [float(rng.choice((-1, 1))) for _ in range(dim)])
        for c in range(n)
    ]
    masks_df = spark.createDataFrame(
        masks, "copy long, mask array<double>"
    )
    write("embeddings", emb.crossJoin(copies)
          .join(F.broadcast(masks_df), "copy")
          .select(
              shift("vec_id"),
              F.zip_with(
                  "embedding", "mask",
                  lambda x, m: (x * m).cast("float"),
              ).alias("embedding"),
              "label",
          ), parts=8)
    print(f"wrote {out} at {n}x {src}", flush=True)


if __name__ == "__main__":
    main()
