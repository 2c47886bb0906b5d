"""3-dimensional Z-order pruning measurement (r6 verdict ask #8).

Lays out the sf0.1 documents table three ways — linear sort by n_chars,
2-D Morton (n_chars, lang), 3-D Morton (n_chars, lang, source) — with
small row groups, then counts CANDIDATE ROW GROUPS per single-dimension
predicate from parquet column-chunk min/max stats (the exact statistic
engines prune scans with). The question the table answers: does adding
a third interleaved dimension keep pruning on all three axes, and what
does it cost the first two (bit budget per dim is unchanged at 16 here,
but the curve is coarser per axis).

Usage: python tools/zorder3_stress.py [sf_dir]  → one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ticktock_spark.operators.zorder import scale_to_bits, zorder_key_n
from ticktock_spark.schema import load_table
from ticktock_spark.session import get_spark

SCRATCH = "/root/repo/.scratch/zorder3"


def bucket16(col):
    """Stable 16-bit bucket for a low-cardinality string dim (the
    md5-derived bucket the 2-D layout used)."""
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long")


def candidate_groups(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(matching, total) row groups whose [min,max] intersects [lo,hi]."""
    import pyarrow.parquet as pq
    import glob

    match = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                match += 1
            elif not (st.max < lo or st.min > hi):
                match += 1
    return match, total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "100000")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars",
        bucket16(F.col("lang")).alias("lang_b"),
        bucket16(F.col("source")).alias("src_b"),
    ).persist()
    lohi = d.agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")).first()
    nc = scale_to_bits(F.col("n_chars"), float(lohi["lo"]), float(lohi["hi"]))

    layouts = {
        "linear_nchars": F.col("n_chars").cast("long"),
        "z2_nchars_lang": zorder_key_n([nc, F.col("lang_b")]),
        "z3_nchars_lang_source": zorder_key_n(
            [nc, F.col("lang_b"), F.col("src_b")]
        ),
    }
    # small row groups so stats resolve (same as the 2-D measurement);
    # parquet.block.size is a Hadoop conf, not a writer option
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("parquet.block.size", str(64 * 1024))
    out: dict = {"row_group_bytes": 64 * 1024, "layouts": {}}
    langs = [r["lang"] for r in d.select("lang").distinct().collect()]
    srcs = [r["source"] for r in d.select("source").distinct().collect()]
    lang_pick, src_pick = sorted(langs)[0], sorted(srcs)[0]
    lb = d.filter(F.col("lang") == lang_pick).select("lang_b").first()["lang_b"]
    sb = d.filter(F.col("source") == src_pick).select("src_b").first()["src_b"]
    # a ~decile length slice
    q = d.approxQuantile("n_chars", [0.4, 0.5], 0.0)
    for name, key in layouts.items():
        path = f"{SCRATCH}/{name}"
        (
            d.withColumn("__zk", key)
            .repartitionByRange(1, "__zk")
            .sortWithinPartitions("__zk")
            .drop("__zk")
            .write.mode("overwrite")
            .parquet(path)
        )
        out["layouts"][name] = {
            f"lang={lang_pick}": candidate_groups(path, "lang_b", lb, lb),
            f"source={src_pick}": candidate_groups(path, "src_b", sb, sb),
            "n_chars_decile": candidate_groups(path, "n_chars", q[0], q[1]),
        }
    print(json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
