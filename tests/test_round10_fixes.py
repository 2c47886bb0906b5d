"""Round-10 hardening regressions (the four ADVICE items).

1. streaming/liveness.py — finiteness is a separate state flag, not a
   sentinel inside the micro-value domain: a REAL reading whose micro
   form equals i64 min must start and extend runs like any other value.
2. pipeline/dedup.py dedup_yield_curve — the threshold re-bin is
   join-free (the old F.broadcast(left) hint on a left-outer join could
   not be honored and silently broadcast the PAIR table), and
   ``bucket_cap`` is wired through to minhash_lsh_candidates.
3. tools/gen_registry.py — staleness compares round NUMBERS, not
   file-count indexes.
4. pipeline/text.py vocab_coverage — bad K values fail loudly.
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# 1. liveness: no sentinel collision
# ---------------------------------------------------------------------------

# the finite double whose 1e-6-grid micro form is exactly i64 min — the
# value the old sentinel encoding confused with NaN/Inf
SENTINEL_VALUE = -(2**63) / 1_000_000.0


def test_liveness_finite_value_at_i64_min_micro_forms_runs(spark, tmp_path):
    """A NaN followed by two identical REAL readings near -9.22e12 must
    produce run lengths 1, 1, 2 (the real value starts a run and the
    duplicate extends it). Under the old sentinel encoding the first
    real reading 'extended' the NaN's pseudo-run instead."""
    import os

    from pyspark.sql import functions as F

    from ticktock_spark.streaming.liveness import streaming_liveness

    rows = [
        ("a", 1_000_000, 0, "nan"),
        ("a", 2_000_000, 1, repr(SENTINEL_VALUE)),
        ("a", 3_000_000, 2, repr(SENTINEL_VALUE)),
    ]
    (tmp_path / "in").mkdir(exist_ok=True)
    f = tmp_path / "in" / "b0.txt"
    f.write_text("\n".join(f"{s} {us} {q} {v}" for s, us, q, v in rows))
    os.utime(f, (1_000_000_000, 1_000_000_000))
    lines = spark.readStream.format("text").load(str(tmp_path / "in"))
    p = F.split("value", " ")
    stream = lines.select(
        p.getItem(0).alias("series"),
        p.getItem(1).cast("long").alias("us"),
        p.getItem(2).cast("long").alias("seq"),
        p.getItem(3).cast("double").alias("value"),
    )
    q = (
        streaming_liveness(stream, min_run=2)
        .writeStream.format("memory")
        .queryName("live_sentinel_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r["us"], r["run_len"], r["flatline"])
        for r in spark.sql(
            "select * from live_sentinel_out order by us"
        ).collect()
    ]
    assert got == [
        (1_000_000, 1, False),  # NaN carries no identity
        (2_000_000, 1, False),  # real value STARTS a run (old code: 2)
        (3_000_000, 2, True),   # and the duplicate extends it
    ]


# ---------------------------------------------------------------------------
# 2. dedup_yield_curve: join-free re-bin + bucket_cap pass-through
# ---------------------------------------------------------------------------

def test_dedup_yield_rebin_has_no_nested_loop_join(spark):
    """The threshold re-bin must be join-free: the old plan carried a
    BroadcastNestedLoopJoin that built the PAIR table (the F.broadcast
    hint on the preserved side of a left-outer join is unsatisfiable,
    so Spark broadcast the other side) — a driver-memory hazard when
    the pair table is large. The LSH candidate pipeline's equi-joins
    (sort-merge on banded keys) are the legitimate remainder."""
    from ticktock_spark.pipeline.dedup import dedup_yield_curve

    docs = spark.createDataFrame(
        [(i, f"some text body number {i} padded with shared words") for i in range(8)],
        "doc_id long, text string",
    )
    plan = dedup_yield_curve(docs)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    # every remaining join is an equi-join inside the candidate pipeline
    # (keyed on doc ids / band keys), never on the threshold column
    for line in plan.splitlines():
        if "Join" in line:
            assert "threshold" not in line, line


def test_dedup_yield_bucket_cap_passes_through(spark):
    """bucket_cap reaches minhash_lsh_candidates: with every doc
    identical, cap=1 leaves at most one member per band bucket, so zero
    candidate pairs survive — while the uncapped run verifies them all."""
    from ticktock_spark.pipeline.dedup import dedup_yield_curve

    text = "identical corpus body repeated verbatim in every document here"
    docs = spark.createDataFrame(
        [(i, text) for i in range(6)], "doc_id long, text string"
    )
    uncapped = {r["threshold"]: r["n_pairs"]
                for r in dedup_yield_curve(docs, thresholds=[0.9]).collect()}
    capped = {r["threshold"]: r["n_pairs"]
              for r in dedup_yield_curve(
                  docs, thresholds=[0.9], bucket_cap=1).collect()}
    assert uncapped[0.9] > 0
    assert capped[0.9] == 0
    # the dry threshold still reports its (t, 0, 0, 0) row under the cap
    assert set(capped) == {0.9}


# ---------------------------------------------------------------------------
# 3. gen_registry staleness: round numbers, not file counts
# ---------------------------------------------------------------------------

def test_registry_staleness_survives_a_round_gap(tmp_path, monkeypatch):
    """With CORRECTNESS files r1, r2, r9 present (a gap), the stale
    threshold must key off max round (9) — entries last seen r2 are
    stale, r9 is fresh — not off the file count (3 files would have
    called r2-vintage entries fresh)."""
    import re

    files = {"CORRECTNESS_r01.json": 1, "CORRECTNESS_r02.json": 2,
             "CORRECTNESS_r09.json": 9}
    round_of = {
        i: re.search(r"_r(\d+)", f).group(1)
        for i, f in enumerate(sorted(files))
    }
    # last_seen maps entry → FILE INDEX (the _verified_history contract)
    last_seen = {"old_entry": 0, "gapped_entry": 1, "fresh_entry": 2}
    # mirror tools/gen_registry.py's fixed arithmetic
    max_round = max((int(r) for r in round_of.values()), default=0)
    stale = sorted(
        n for n in last_seen if int(round_of[last_seen[n]]) <= max_round - 3
    )
    assert stale == ["gapped_entry", "old_entry"]
    # under the OLD file-count arithmetic (len(files) - 3 == 0) every
    # entry would have been called fresh
    assert [n for n in last_seen
            if int(round_of[last_seen[n]]) <= len(files) - 3] == []


# ---------------------------------------------------------------------------
# 4. vocab_coverage: bad ks fail loudly
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bad", [[0], [-5], [10, 10], [True], [2.5]])
def test_vocab_coverage_rejects_bad_ks(spark, bad):
    from ticktock_spark.pipeline.text import vocab_coverage

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="vocab_coverage"):
        vocab_coverage(docs, ks=bad)
