"""Sampled lsh_audit differential at an arbitrary SF dir.

`lsh_audit`'s exact ground truth enumerates every shared-shingle pair;
its contract (pipeline/dedup.py docstring) is to run at full scale on a
deterministic hash_sample slice and read the ratios as corpus
estimates. On the gen_sf_scaled corpora the full-corpus audit is
infeasible by construction — the synthetic documents are a near-clique
(30% of ALL doc pairs have Jaccard >= 0.2 at sf0.1), so the truth-pair
mass is quadratic in the corpus and the sf1 run writes ~80 GB of
shuffle before local disk runs out. This script verifies the operator
AT ITS PRODUCTION SHAPE: both engines audit the same md5-hash sample
(`pipeline.sample.hash_sample`, engine-agnostic by construction), so
the differential is exact, not statistical.

    python tools/audit_sample_diff.py /root/repo/.scratch/sf1 0.1
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import ticktock_spark.pipeline.queries  # noqa: F401 — registers q134
from ticktock_spark.pipeline import dedup as dd
from ticktock_spark.pipeline.sample import _thr, hash_sample
from ticktock_spark.queries import ORACLES
from ticktock_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    seed = "s0"

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sample = hash_sample(docs, rate, id_col="doc_id", seed=seed)
    n_docs = sample.count()  # driver-bound: one scalar

    from pyspark.sql import functions as F

    from ticktock_spark.pipeline.queries import q6

    t0 = time.monotonic()
    got = (
        dd.lsh_audit(sample, threshold=0.2)
        .select(
            "n_truth", "n_cand", "n_hit",
            q6(F.col("precision")).alias("precision"),
            q6(F.col("recall")).alias("recall"),
        )
        .toPandas()  # driver-bound: lsh_audit returns exactly one row
    )
    t_spark = time.monotonic() - t0

    con = duckdb.connect()
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    con.sql("SET memory_limit='48GB'")
    src = f"{sf_dir}/documents.parquet"
    import os

    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    # the same deterministic draw hash_sample makes — md5 is md5
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{src}' "
        f"WHERE substring(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 8)"
        f" < '{_thr(rate)}'"
    )
    t0 = time.monotonic()
    exp = con.sql(ORACLES["q134_lsh_audit"]).df()
    t_oracle = time.monotonic() - t0

    cols = sorted(got.columns)
    ok = sorted(exp.columns) == cols and len(got) == len(exp) == 1
    if ok:
        for c in cols:
            a, b = got[c].iloc[0], exp[c].iloc[0]
            same = (
                a == b
                or (isinstance(a, float) and math.isnan(a) and math.isnan(b))
            )
            if not same:
                ok = False
                print(f"MISMATCH {c}: spark={a!r} oracle={b!r}")
    row = {c: got[c].iloc[0] for c in cols} if len(got) else {}
    print(
        f"{'OK' if ok else 'MISMATCH'} q134_lsh_audit sampled rate={rate} "
        f"({n_docs} docs, spark {t_spark:.1f}s / oracle {t_oracle:.1f}s): {row}"
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
