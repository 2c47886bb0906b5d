"""Connected components (large-star/small-star) vs a brute-force
union-find, plus the sampling/splitting and sessionization operators."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from ticktock_spark.pipeline.cluster import connected_components, dedup_clusters


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id label per node
    return {n: find(n) for n in parent}


def _labels(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = connected_components(df).collect()
    lab = {r["node"]: r["cluster_id"] for r in got}
    assert len(got) == len(lab), "duplicate node labels emitted"
    return lab


def test_cc_chain_and_star(spark):
    # a chain (worst case for naive propagation), a clique, a self-pair
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (11, 12), (20, 20)]
    lab = _labels(spark, pairs)
    assert {lab[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert {lab[i] for i in (10, 11, 12)} == {10}
    # self-pairs carry no linkage and are dropped — 20 is a singleton,
    # labeled (like all singletons) by dedup_clusters' docs join
    assert 20 not in lab


@pytest.mark.parametrize("seed", [0, 1])
def test_cc_random_graphs(spark, seed):
    rng = random.Random(seed)
    nodes = rng.sample(range(1000), 60)
    pairs = [tuple(rng.sample(nodes, 2)) for _ in range(70)]
    assert _labels(spark, pairs) == _union_find(pairs)


def test_dedup_clusters_singletons_and_sizes(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "id_a long, id_b long")
    got = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert {i: got[i]["cluster_id"] for i in range(6)} == {
        0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1,
    }
    assert got[3]["cluster_size"] == 3 and not got[3]["is_canonical"]
    assert got[1]["is_canonical"] and got[0]["is_canonical"]
    assert sum(1 for r in got.values() if r["is_canonical"]) == 4


def test_hash_sample_deterministic_and_sized(spark):
    from ticktock_spark.pipeline.sample import hash_sample, split_assign

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = sorted(r["doc_id"] for r in hash_sample(df, 0.3).collect())
    b = sorted(r["doc_id"] for r in hash_sample(df.repartition(7), 0.3).collect())
    assert a == b, "sampling must not depend on partitioning"
    assert 0.25 < len(a) / 2000 < 0.35
    # rate edges
    assert hash_sample(df, 0.0).count() == 0
    assert hash_sample(df, 1.0).count() == 2000

    out = split_assign(df, {"train": 8, "valid": 1, "test": 1}).groupBy("split").count()
    counts = {r["split"]: r["count"] for r in out.collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert sum(counts.values()) == 2000
    assert counts["train"] > 1400  # ~1600 expected
    # splits are disjoint by construction (single assignment column); the
    # stable-under-growth property: a subset keeps its assignments
    sub = split_assign(df.filter("doc_id < 500"), {"train": 8, "valid": 1, "test": 1})
    full = split_assign(df, {"train": 8, "valid": 1, "test": 1}).filter("doc_id < 500")
    assert sorted(map(tuple, sub.collect())) == sorted(map(tuple, full.collect()))


def test_sessionize_gap_boundaries(spark):
    from ticktock_spark.pipeline.sessions import session_stats, sessionize

    M = 60_000_000  # µs per minute
    rows = [
        # user 7: events at t=0, 10min, 45min (gap 35min > 30min → new session)
        (1, 0, 7, 1.0),
        (2, 10 * M // 1000, 7, 2.0),  # ts in ms here? use epoch-ms longs
        (3, 45 * M // 1000, 7, 3.0),
        # user 8: single event
        (4, 0, 8, 9.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts long, user_id long, value double")
    s = sessionize(df, gap_ms=30 * 60_000)
    idx = {r["event_id"]: r["session_idx"] for r in s.collect()}
    assert idx == {1: 1, 2: 1, 3: 2, 4: 1}
    stats = session_stats(df, gap_ms=30 * 60_000)
    r = {(x["user_id"], x["session_idx"]): x for x in stats.collect()}
    assert r[(7, 1)]["n_events"] == 2 and r[(7, 1)]["sum_value"] == 3.0
    assert r[(7, 1)]["duration_us"] == 10 * M
    assert r[(7, 2)]["n_events"] == 1 and r[(8, 1)]["sum_value"] == 9.0


def test_sample_monotone_subset(spark):
    """Growing the rate only ADDS rows (thresholds are nested), so
    sample(r1) ⊆ sample(r2) for r1 < r2 — the property that makes
    hash sampling usable for reproducible scaling ladders."""
    from ticktock_spark.pipeline.sample import hash_sample

    df = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
    small = {r["doc_id"] for r in hash_sample(df, 0.1).collect()}
    big = {r["doc_id"] for r in hash_sample(df, 0.4).collect()}
    assert small < big


def test_scale_plan_shapes(spark):
    """Pin the physical-plan properties the 100 TB story depends on:
    - quality top-k: partial WindowGroupLimit BEFORE the exchange
      (shuffle carries ≤ k·partitions rows per stratum);
    - sessionize: exactly ONE exchange (windows + agg share the
      user partitioning);
    - stratified sample: no exchange at all (pure scan-side filter)."""
    from ticktock_spark.pipeline import sample as sp, sessions as ss, text as tx
    from ticktock_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    events = load_table(spark, "/root/testdata/sf0.001", "events")

    plan = (
        tx.quality_topk_per_stratum(docs, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.index("Partial") > plan.index("Exchange") or (
        "WindowGroupLimit" in plan and "Partial" in plan
    )

    plan = (
        ss.session_stats(events)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan

    plan = (
        sp.stratified_sample(docs, {"en": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_funnel_stages(spark):
    from ticktock_spark.pipeline import sessions as ssn

    rows = [
        # user 1: full ordered funnel
        (1, "signup", 100), (1, "view", 200), (1, "click", 300), (1, "purchase", 400),
        # user 2: view BEFORE signup doesn't count; no later view → stage 1
        (2, "view", 50), (2, "signup", 100), (2, "click", 200),
        # user 3: signup + two views (earliest-after wins), no click
        (3, "signup", 10), (3, "view", 30), (3, "view", 20),
        # user 4: never signed up → excluded
        (4, "view", 10), (4, "purchase", 20),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, us long")
    got = {r["user_id"]: r for r in
           ssn.funnel_stages(ev, ["signup", "view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1]["t_signup"], got[1]["t_view"], got[1]["t_click"],
            got[1]["t_purchase"], got[1]["stage"]) == (100, 200, 300, 400, 4)
    assert got[2]["t_view"] is None and got[2]["stage"] == 1
    assert got[3]["t_view"] == 20 and got[3]["t_click"] is None and got[3]["stage"] == 2


def test_cohort_retention(spark):
    from ticktock_spark.pipeline import sessions as ssn

    DAY = 86_400 * 1_000_000
    T0 = 1_704_067_200 * 1_000_000  # 2024-01-01 UTC
    rows = [
        (1, T0), (1, T0 + 8 * DAY),            # cohort 01-01: week 0 and 1
        (2, T0 + 2 * DAY), (2, T0 + 2 * DAY + 1),  # cohort 01-03: week 0 twice → once
        (3, T0), (3, T0 + 20 * DAY),           # cohort 01-01: week 0 and 2
    ]
    ev = spark.createDataFrame(rows, "user_id long, us long")
    got = {(r["cohort_date"], r["week_offset"]): r["n_users"]
           for r in ssn.cohort_retention(ev).collect()}
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-03", 0): 1,
    }


def test_leakage_safe_split(spark):
    """Every cluster lands wholly in one split; singletons match plain
    split_assign on their own id; weights are respected loosely."""
    from ticktock_spark.pipeline import cluster as cl
    from ticktock_spark.pipeline import sample as sp

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(50)], "id_a long, id_b long"
    )
    w = {"train": 0.8, "valid": 0.1, "test": 0.1}
    got = {r["doc_id"]: r for r in cl.leakage_safe_split(docs, pairs, w).collect()}
    for i in range(50):  # paired docs share cluster and split
        assert got[i]["cluster_id"] == got[i + 100]["cluster_id"] == i
        assert got[i]["split"] == got[i + 100]["split"]
    # singletons (50..99, 150..199) = plain split_assign on own id
    plain = {
        r["doc_id"]: r["split"]
        for r in sp.split_assign(docs, w).collect()
    }
    for i in list(range(50, 100)) + list(range(150, 200)):
        assert got[i]["split"] == plain[i]
    assert {r["split"] for r in got.values()} == {"train", "valid", "test"}


def test_funnel_matches_naive_on_random_events(spark):
    """Randomized differential: the join-chain funnel equals a per-user
    brute-force walk."""
    import random

    from ticktock_spark.pipeline import sessions as ssn

    rng = random.Random(7)
    stages = ["signup", "view", "click", "purchase"]
    types = stages + ["error"]
    rows = [
        (e, rng.randrange(20), types[rng.randrange(5)], rng.randrange(1000))
        for e in range(600)
    ]
    ev = spark.createDataFrame(
        [(u, t, us) for (_, u, t, us) in rows],
        "user_id long, event_type string, us long",
    )
    got = {r["user_id"]: r for r in ssn.funnel_stages(ev, stages).collect()}

    by_user: dict = {}
    for _, u, t, us in rows:
        by_user.setdefault(u, []).append((t, us))
    for u, evs in by_user.items():
        cur = None
        expected = {}
        for s in stages:
            cands = [us for (t, us) in evs if t == s and (cur is None or us > cur)]
            if cur is not None and not expected:
                pass
            nxt = min(cands) if cands else None
            if s == stages[0]:
                cur = nxt
            elif cur is not None:
                cur = nxt
            expected[s] = cur
            if cur is None:
                for s2 in stages[stages.index(s) + 1:]:
                    expected[s2] = None
                break
        if expected[stages[0]] is None:
            assert u not in got
            continue
        r = got[u]
        for s in stages:
            assert r[f"t_{s}"] == expected[s], (u, s, dict(r.asDict()), expected)


def test_prepare_corpus_composition(spark):
    """Pins the release composition: failing-quality docs never reach
    dedup; an exact-dup group collapses to its min id with the copy
    count BEFORE the source cap (a mega-duplicated page consumes one
    cap slot, not n); the cap drops the per-source overflow; every
    surviving doc gets exactly one split."""
    from ticktock_spark.pipeline.sample import prepare_corpus

    good = " ".join(
        ["the quick brown fox jumps over the lazy dog and runs far"] * 6
    )  # 66 words, stopword-rich, all-alpha
    other = " ".join(
        ["his big cat sat on that warm mat and then slept well"] * 6
    )
    third = " ".join(
        ["we saw the old ship sail out into the open bay today"] * 6
    )
    rows = [
        (1, good, "en", "s1"),
        (2, good, "en", "s1"),    # exact dup of 1
        (3, good, "en", "s1"),    # exact dup of 1
        (4, other, "en", "s1"),
        (5, third, "en", "s1"),
        (6, "too short", "en", "s1"),          # fails word count
        (7, "x " * 60, "en", "s2"),            # fails stopwords/alpha ratio
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")

    out = {r["doc_id"]: r for r in prepare_corpus(df, source_cap=2).collect()}
    # quality failures gone entirely
    assert 6 not in out and 7 not in out
    # dup group -> canonical id 1 with 3 copies; ids 2,3 gone
    assert 2 not in out and 3 not in out
    # s1 has 3 canonical survivors (1, 4, 5) but cap=2 keeps exactly 2
    assert len(out) == 2 and all(r["source"] == "s1" for r in out.values())
    kept = sorted(out)
    for did in kept:
        r = out[did]
        assert r["source_total"] == 3 and r["pick"] in (1, 2)
        assert r["split"] in ("train", "valid", "test")
    if 1 in out:
        assert out[1]["n_copies"] == 3


def test_event_transitions_counts_and_probs(spark):
    import datetime as dt

    from ticktock_spark.pipeline.sessions import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view -> click -> buy ; user 2: view -> click -> view
        (1, t0, 1, "view"), (2, t0.replace(minute=1), 1, "click"),
        (3, t0.replace(minute=2), 1, "buy"),
        (4, t0, 2, "view"), (5, t0.replace(minute=1), 2, "click"),
        (6, t0.replace(minute=2), 2, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {(r["event_type"], r["next_type"]): r for r in event_transitions(ev).collect()}
    assert out[("view", "click")]["n"] == 2
    assert out[("view", "click")]["p"] == 1.0   # both views lead to click
    assert out[("click", "buy")]["n"] == 1
    assert out[("click", "buy")]["p"] == 0.5
    assert out[("click", "view")]["p"] == 0.5
    assert ("buy", None) not in out  # terminal events emit no pair


def test_session_transitions_respect_gaps(spark):
    import datetime as dt

    from ticktock_spark.pipeline.sessions import session_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1 session 1: view->click; then a 2h gap; session 2: buy->view
        (1, t0, 1, "view"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click"),
        (3, t0 + dt.timedelta(hours=2, minutes=2), 1, "buy"),
        (4, t0 + dt.timedelta(hours=2, minutes=3), 1, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["event_type"], r["next_type"]): r["n"]
        for r in session_transitions(ev, gap_ms=1_800_000).collect()
    }
    assert out == {("view", "click"): 1, ("buy", "view"): 1}
    # the cross-gap click->buy pair must NOT appear
    assert ("click", "buy") not in out


def test_cohort_funnel_counts(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from ticktock_spark.pipeline.sessions import cohort_funnel

    t0 = dt.datetime(2024, 1, 1)
    w = dt.timedelta(days=8)  # lands in the next epoch week
    rows = [
        # cohort A: u1 full funnel, u2 stops at view
        (1, t0, 1, "signup"), (2, t0 + dt.timedelta(minutes=1), 1, "view"),
        (3, t0 + dt.timedelta(minutes=2), 1, "click"),
        (4, t0 + dt.timedelta(minutes=3), 1, "purchase"),
        (5, t0, 2, "signup"), (6, t0 + dt.timedelta(minutes=1), 2, "view"),
        # cohort B (a week later): u3 signup only
        (7, t0 + w, 3, "signup"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).select("user_id", "event_type", F.unix_micros("ts").alias("us"))
    out = sorted(
        cohort_funnel(ev, ["signup", "view", "click", "purchase"]).collect(),
        key=lambda r: r["cohort_week"],
    )
    assert len(out) == 2
    a, b = out
    assert (a["n_users"], a["n_signup"], a["n_view"], a["n_click"], a["n_purchase"]) == (2, 2, 2, 1, 1)
    assert (b["n_users"], b["n_signup"], b["n_view"]) == (1, 1, 0)
