"""Streaming eval-set decontamination: exact batch parity.

The twin reuses the batch operator inside foreachBatch, so parity must
be EXACT (same rows, same counts) — per-doc verdicts depend only on the
doc's own text and the static bench gram set, never on batch
boundaries. Proven twice: planted synthetic fixtures (hand-checkable
hits) and the q173 fixture over the real sf0.001 documents table split
across two micro-batches.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ticktock_spark.pipeline.dedup import benchmark_grams, decontaminate
from ticktock_spark.schema import load_table
from ticktock_spark.streaming.decontaminate import streaming_decontaminate


def _write_batches(tmp_path, batches):
    (tmp_path / "in").mkdir(exist_ok=True)
    for i, rows in enumerate(batches):
        with open(tmp_path / "in" / f"b{i}.jsonl", "w") as f:
            for did, text in rows:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        os.utime(tmp_path / "in" / f"b{i}.jsonl", (1000 + i, 1000 + i))


def _run(spark, tmp_path, bench_df, n, hash_grams=False):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    bench = benchmark_grams(bench_df, n=n).persist()
    q = streaming_decontaminate(
        stream,
        bench_df,
        str(tmp_path / "clean"),
        str(tmp_path / "report"),
        str(tmp_path / "ckpt"),
        n=n,
        hash_grams=hash_grams,
        bench_grams_df=bench,
    )
    q.awaitTermination(180)
    bench.unpersist()
    report = spark.read.parquet(str(tmp_path / "report"))
    clean = spark.read.parquet(str(tmp_path / "clean"))
    return report, clean


def test_streaming_decontaminate_planted(spark, tmp_path):
    # bench holds 'the quick brown fox'; docs 1 and 3 (different
    # micro-batches) each share a word 3-gram with it, docs 2/4 don't
    bench_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    b0 = [(1, "he saw the quick brown dog run"), (2, "entirely clean text one")]
    b1 = [(3, "quick brown fox indeed they said"), (4, "another clean doc here")]
    _write_batches(tmp_path, [b0, b1])

    report, clean = _run(spark, tmp_path, bench_df, n=3)
    got = {r["doc_id"]: (r["n_hits"], r["n_grams"]) for r in report.collect()}
    # doc 1: grams of 7 words = 5 distinct; hit 'the quick brown'
    # doc 3: 4 distinct grams; hit 'quick brown fox'
    assert got == {1: (1, 5), 3: (1, 4)}
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 4]
    # epoch partitioning: each micro-batch wrote its own partition
    assert {r["__epoch"] for r in report.collect()} == {0, 1}


def test_streaming_decontaminate_matches_batch_q173_fixture(spark, tmp_path):
    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    bench_df = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0)

    rows = [(r["doc_id"], r["text"]) for r in train.collect()]
    half = len(rows) // 2
    _write_batches(tmp_path, [rows[:half], rows[half:]])

    report, clean = _run(spark, tmp_path, bench_df, n=3, hash_grams=True)

    want = {
        r["doc_id"]: (r["n_hits"], r["n_grams"])
        for r in decontaminate(train, bench_df, n=3, hash_grams=True).collect()
    }
    got = {r["doc_id"]: (r["n_hits"], r["n_grams"]) for r in report.collect()}
    assert got == want
    assert clean.count() == len(rows) - len(want)
    # clean ∪ flagged = the whole stream, disjoint
    flagged_ids = set(got)
    clean_ids = {r["doc_id"] for r in clean.collect()}
    assert not (flagged_ids & clean_ids)
    assert flagged_ids | clean_ids == {did for did, _ in rows}
