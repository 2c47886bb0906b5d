"""Streaming intake novelty gate: exact batch parity.

Novelty is defined by arrival order (first occurrence = min doc id), so
when documents stream in id order the concatenated per-epoch reports
must EQUAL ``gram_novelty`` over the full corpus — not approximately,
row for row. Proven on a planted fixture (hand-checkable counts) and on
the real sf0.001 documents table split across three micro-batches,
plus an index-maintenance check (replayed grams never re-enter)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ticktock_spark.pipeline.dedup import gram_novelty
from ticktock_spark.schema import load_table
from ticktock_spark.streaming.novelty import (
    batch_novelty,
    streaming_novelty_gate,
)


def _write_batches(tmp_path, batches):
    (tmp_path / "in").mkdir(exist_ok=True)
    for i, rows in enumerate(batches):
        with open(tmp_path / "in" / f"b{i}.jsonl", "w") as f:
            for did, text in rows:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        os.utime(tmp_path / "in" / f"b{i}.jsonl", (1000 + i, 1000 + i))


def _run(spark, tmp_path):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    q = streaming_novelty_gate(
        stream,
        str(tmp_path / "report"),
        str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
        n=3,
    )
    q.awaitTermination(180)
    return (
        spark.read.parquet(str(tmp_path / "report")),
        spark.read.parquet(str(tmp_path / "index")),
    )


def test_streaming_novelty_planted(spark, tmp_path):
    b0 = [(1, "one two three four")]
    b1 = [(2, "one two three four"),          # exact restatement → 0
          (3, "one two three brand new")]     # 3 grams, 2 novel
    _write_batches(tmp_path, [b0, b1])
    report, index = _run(spark, tmp_path)
    got = {r["doc_id"]: (r["n_grams"], r["n_new"]) for r in report.collect()}
    assert got == {1: (2, 2), 2: (2, 0), 3: (3, 2)}
    # index holds each gram once, attributed to its true first doc
    idx = {r["gram"]: r["first_id"] for r in index.collect()}
    assert len(idx) == 4 and index.count() == 4
    assert idx["one two three"] == 1
    assert idx["three brand new"] == 3


def test_streaming_novelty_matches_batch_q185(spark, tmp_path):
    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    rows = sorted(
        ((r["doc_id"], r["text"]) for r in d.collect()), key=lambda t: t[0]
    )
    third = len(rows) // 3
    _write_batches(
        tmp_path, [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    )
    report, _ = _run(spark, tmp_path)
    want = {
        (r["doc_id"], r["n_grams"], r["n_new"], r["novelty"])
        for r in gram_novelty(d, n=3).collect()
    }
    got = {
        (r["doc_id"], r["n_grams"], r["n_new"], r["novelty"])
        for r in report.collect()
    }
    assert got == want  # exact parity, values included
    assert {r["__epoch"] for r in report.collect()} == {0, 1, 2}


def test_batch_novelty_respects_standing_index(spark):
    # a gram already indexed is never novel, whoever holds it now
    index = spark.createDataFrame(
        [("one two three", 0)], "gram string, first_id long"
    )
    batch = spark.createDataFrame(
        [(5, "one two three four")], "doc_id long, text string"
    )
    report, new_grams = batch_novelty(batch, index, n=3)
    r = report.first()
    assert (r["n_grams"], r["n_new"]) == (2, 1)  # only 'two three four'
    assert [g["gram"] for g in new_grams.collect()] == ["two three four"]
    # and with no index at all, everything in the batch is fair game
    report2, new2 = batch_novelty(batch, None, n=3)
    assert report2.first()["n_new"] == 2
    assert new2.count() == 2
