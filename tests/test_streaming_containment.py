"""Streaming quote screen: planted recall + exact batch parity.

The planted fixture mirrors the q169 one: a short arrival that is a
verbatim tile-aligned excerpt of a standing long doc (only join #3
can catch it), a long arrival embedding a standing short doc at a tile
boundary (only join #2), and an exact copy of a standing doc (plain
LSH, join #1). Parity: the union of streaming epochs must equal the
batch ``containment_pairs(corpus ∪ arrivals, windowed=True)`` output
restricted to cross (arrival, corpus) pairs — value-for-value.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ticktock_spark.pipeline.dedup import containment_pairs
from ticktock_spark.streaming.containment import (
    corpus_containment_state,
    streaming_quote_screen,
)

_W = [f"w{i:03d}" for i in range(200)]  # distinct filler vocabulary


def _doc(words):
    return " ".join(words)


def _fixture():
    long_doc = _W[0:60]                      # corpus long article, 60 words
    short_doc = _W[100:124]                  # corpus short doc, 24 words
    corpus = [
        (1, _doc(long_doc)),
        (2, _doc(short_doc)),
        (3, _doc(_W[150:190])),              # unrelated corpus doc
    ]
    # arrival 101: words 13..36 of the long doc — exactly the corpus
    # tile starting at 13 (stride 12), so whole(101) collides with
    # tile(1) in every band; whole-doc LSH alone provably misses it
    quote = long_doc[12:36]
    # arrival 102: 12 filler words + the corpus short doc at positions
    # 13..36 + filler — its own tile at 13 equals doc 2 exactly
    embed = _W[190:200] + _W[140:142] + _W[100:124] + _W[124:140]
    batch0 = [(101, _doc(quote)), (103, corpus[2][1])]  # 103 = exact copy
    batch1 = [(102, _doc(embed)), (104, _doc(_W[60:100]))]  # 104 clean
    return corpus, batch0, batch1


def test_streaming_quote_screen_planted_and_batch_parity(spark, tmp_path):
    corpus_rows, b0, b1 = _fixture()
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")

    (tmp_path / "in").mkdir(exist_ok=True)
    for i, rows in enumerate([b0, b1]):
        with open(tmp_path / "in" / f"b{i}.jsonl", "w") as f:
            for did, text in rows:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        os.utime(tmp_path / "in" / f"b{i}.jsonl", (1000 + i, 1000 + i))

    state = corpus_containment_state(corpus)
    state = tuple(fr.persist() for fr in state)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    q = streaming_quote_screen(
        stream, state, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        threshold=0.8,
    )
    q.awaitTermination(180)
    got_rows = spark.read.parquet(str(tmp_path / "out")).collect()
    got = {
        (r["new_id"], r["corpus_id"]): (
            r["inter"], r["n_new"], r["n_corpus"],
            round(r["containment"], 12), r["contained"],
        )
        for r in got_rows
    }

    # planted recall: the tile-aligned quote, the embedded short doc,
    # and the exact copy — each at containment 1.0
    assert (101, 1) in got and got[(101, 1)][3] == 1.0
    assert got[(101, 1)][4] == "new"          # the arrival is the quote
    assert (102, 2) in got and got[(102, 2)][3] == 1.0
    assert got[(102, 2)][4] == "corpus"       # the standing doc is inside
    assert (103, 3) in got and got[(103, 3)][3] == 1.0
    assert got[(103, 3)][4] == "both"
    assert not any(nid == 104 for nid, _ in got)

    # exact batch parity on cross pairs: arrivals have ids > 100
    union = corpus.unionByName(
        spark.createDataFrame(b0 + b1, "doc_id long, text string")
    )
    ref = containment_pairs(union, threshold=0.8, windowed=True)
    want = {}
    for r in ref.collect():
        a, b = r["id_a"], r["id_b"]
        if (a > 100) == (b > 100):
            continue  # within-side pair: out of the intake screen's scope
        new_id, corpus_id = (a, b) if a > 100 else (b, a)
        n_new, n_corpus = (
            (r["n_a"], r["n_b"]) if a > 100 else (r["n_b"], r["n_a"])
        )
        side = {"a": "new" if a > 100 else "corpus",
                "b": "new" if b > 100 else "corpus",
                "both": "both"}[r["contained"]]
        want[(new_id, corpus_id)] = (
            r["inter"], n_new, n_corpus,
            round(r["containment"], 12), side,
        )
    assert got == want
    # epoch partitioning: both micro-batches contributed
    assert {r["__epoch"] for r in got_rows} == {0, 1}
    for fr in state:
        fr.unpersist()
