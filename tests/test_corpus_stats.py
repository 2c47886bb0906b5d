"""Semantic tests for the round-8 batch-2 statistics: Fano burstiness,
daily top movers, length Gini, source word entropy, 1-NN label
agreement — handcrafted inputs with known answers (cross-engine
exactness is pinned by test_oracle.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

DAY = 86_400_000
MIN = 60_000


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(metric=m, ts=ts, value=float(v)) for m, ts, v in rows]
    )


# ---------------------------------------------------------------------------
# q188 fano — via the registry callable shape (operator is inline)
# ---------------------------------------------------------------------------

def _fano(spark, counts_per_bucket):
    """Build a metric with the given per-1m-bucket event counts and
    read back its Fano factor through the PRODUCT operator."""
    from ticktock_spark.operators.summary import fano_factor

    rows = []
    for b, c in enumerate(counts_per_bucket):
        for k in range(c):
            rows.append(("m", b * MIN + k, 1.0))
    out = fano_factor(_events(spark, rows), ["metric"], bucket_ms=MIN)
    return out.first()["fano"]


def test_fano_regular_arrivals_below_one(spark):
    # perfectly regular: 2 events every bucket → variance 0 → fano 0
    assert _fano(spark, [2] * 10) == 0.0


def test_fano_bursty_above_one(spark):
    # nearly all events in the last bucket, one anchoring the span start
    burst = [1] + [0] * 8 + [19]
    f = _fano(spark, burst)
    # var/mean = (n·Σc²−(Σc)²)/(n·Σc) = (10·362−400)/200 = 16.1
    assert f > 10
    assert f == pytest.approx(16.1)


def test_fano_counts_empty_buckets_inside_span(spark):
    # [1, gap, 1]: the empty middle bucket must enter n via min/max
    f = _fano(spark, [1, 0, 1])
    # n=3, sc=2, sc2=2 → (6−4)/6 = 1/3
    assert f == pytest.approx(1 / 3)


# ---------------------------------------------------------------------------
# q189 top movers
# ---------------------------------------------------------------------------

def test_daily_top_movers_finds_the_planted_jump(spark):
    from ticktock_spark.operators.summary import daily_top_movers

    # 6 days flat at 10, then a +50 jump, then flat; a GAP day (day 3
    # missing) must break the comparison, not fake a jump
    rows = []
    for d in range(8):
        if d == 3:
            continue
        v = 10.0 if d < 6 else 60.0
        rows.append(("m", d * DAY, v))
    out = daily_top_movers(_events(spark, rows), ["metric"], k=3).collect()
    top = next(r for r in out if r["rank"] == 1)
    assert top["ts"] == 6 * DAY
    assert top["delta"] == pytest.approx(50.0)
    # days 3/4 have no adjacent-day rows (the gap breaks both sides)
    assert all(r["ts"] not in (3 * DAY, 4 * DAY) for r in out)


# ---------------------------------------------------------------------------
# q191 gini
# ---------------------------------------------------------------------------

def _docs_sized(spark, sizes, source="s"):
    return spark.createDataFrame(
        [Row(doc_id=i, source=source, n_chars=int(x))
         for i, x in enumerate(sizes)]
    )


def test_gini_equal_sizes_zero(spark):
    from ticktock_spark.pipeline.text import length_gini

    out = length_gini(_docs_sized(spark, [50] * 8)).first()
    assert out["gini"] == 0.0


def test_gini_concentration_approaches_one(spark):
    from ticktock_spark.pipeline.text import length_gini

    # one doc holds (almost) all mass among n=10 → G ≈ (n−1)/n = 0.9
    out = length_gini(_docs_sized(spark, [0] * 9 + [1000])).first()
    assert out["gini"] == pytest.approx(0.9, abs=1e-6)


def test_gini_orders_sources_by_inequality(spark):
    from ticktock_spark.pipeline.text import length_gini

    even = _docs_sized(spark, [100] * 10, "even")
    skew = _docs_sized(spark, [10] * 9 + [910], "skew")
    out = {r["source"]: r["gini"]
           for r in length_gini(even.union(skew)).collect()}
    assert out["even"] == 0.0 and out["skew"] > 0.5


# ---------------------------------------------------------------------------
# q192 entropy
# ---------------------------------------------------------------------------

def test_entropy_uniform_vs_template(spark):
    from ticktock_spark.pipeline.text import source_word_entropy

    # diverse: 16 distinct words once each → H = ln 16
    # template: one word 16 times → H = 0
    docs = spark.createDataFrame(
        [Row(doc_id=0, source="diverse",
             text=" ".join(f"w{i}" for i in range(16))),
         Row(doc_id=1, source="template", text=" ".join(["spam"] * 16))]
    )
    out = {r["source"]: r for r in source_word_entropy(docs).collect()}
    assert out["diverse"]["vocab"] == 16
    assert out["diverse"]["entropy"] == pytest.approx(math.log(16), abs=1e-5)
    assert out["template"]["vocab"] == 1
    assert out["template"]["entropy"] == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# q190 1-NN label agreement
# ---------------------------------------------------------------------------

def test_knn_agreement_separated_clusters(spark):
    # two tight, orthogonal clusters → every 1-NN stays in-cluster;
    # exercised through the REGISTRY callable (the product path)
    import os
    import tempfile

    import ticktock_spark.pipeline.queries  # noqa: F401 — registers q190
    from ticktock_spark.queries import QUERIES as Q

    rows = []
    for i in range(4):
        rows.append((i, [10.0 + i, 0.0, 0.1 * i], 0))
        rows.append((10 + i, [0.0, 10.0 + i, 0.1 * i], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    root = tempfile.mkdtemp()
    df.write.parquet(os.path.join(root, "embeddings.parquet"))
    out = {r["label"]: r
           for r in Q["q190_knn_label_agreement"](spark, root).collect()}
    assert out[0]["agreement"] == 1.0 and out[1]["agreement"] == 1.0
    assert out[0]["n"] == 4 and out[1]["n"] == 4


# ---------------------------------------------------------------------------
# q193 nearest-centroid agreement / q194 histogram quantile
# ---------------------------------------------------------------------------

def test_centroid_probe_linear_clusters(spark):
    # two tight orthogonal clusters: centroid probe is perfect
    import ticktock_spark.pipeline.queries  # noqa: F401 — registers q193
    from ticktock_spark.queries import QUERIES as Q

    import tempfile, os
    rows = []
    for i in range(6):
        rows.append((i, [10.0 + i, 0.0, 0.0], 0))
        rows.append((10 + i, [0.0, 10.0 + i, 0.0], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    root = tempfile.mkdtemp()
    df.write.parquet(os.path.join(root, "embeddings.parquet"))
    out = {r["label"]: r for r in
           Q["q193_centroid_agreement"](spark, root).collect()}
    assert out[0]["agreement"] == 1.0 and out[1]["agreement"] == 1.0


def test_centroid_probe_sees_multimodal_gap(spark):
    # label 0 is BIMODAL (two opposite lobes): its centroid collapses
    # toward the origin and loses to label 1's coherent cluster for one
    # lobe, while 1-NN (q190's relation) would stay in-lobe — the
    # diagnostic gap the docstring promises
    import ticktock_spark.pipeline.queries  # noqa: F401 — registers q193
    from ticktock_spark.queries import QUERIES as Q

    import tempfile, os
    rows = []
    for i in range(4):
        rows.append((i, [10.0, float(i), 0.0], 0))          # lobe A
        rows.append((10 + i, [-10.0, -float(i), 0.0], 0))   # lobe B
        rows.append((20 + i, [0.0, 0.0, 10.0 + i], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    root = tempfile.mkdtemp()
    df.write.parquet(os.path.join(root, "embeddings.parquet"))
    out = {r["label"]: r for r in
           Q["q193_centroid_agreement"](spark, root).collect()}
    assert out[1]["agreement"] == 1.0       # coherent class unaffected
    assert out[0]["agreement"] < 1.0        # bimodal class leaks


def test_histogram_quantile_exact_on_known_bins(spark):
    # 100 values 0..99 → bins 0..9 of 10 each; p50: target 50 lands at
    # bin 5's boundary: cum(bin4)=50 >= 50 → est = 40 + 10*(50-40)/10 = 50
    from ticktock_spark.queries import QUERIES as Q

    import tempfile, os
    rows = [("m", 1_704_067_200_000 + i * 1000, float(i), 1, i)
            for i in range(100)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, value double, user_id long,"
              " event_id long"
    ).select(
        "event_type",
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        "user_id", "value", "event_id",
    )
    root = tempfile.mkdtemp()
    df.write.parquet(os.path.join(root, "events.parquet"))
    out = {r["q"]: r["est"]
           for r in Q["q194_histogram_quantile"](spark, root).collect()}
    assert out[0.5] == 50.0
    assert out[0.9] == 90.0
    # p99: target 99 → bin 9 (cum 100, prev 90): 90 + 10*(99-90)/10 = 99
    assert out[0.99] == 99.0


def test_centroid_probe_string_labels_and_tiebreak(spark):
    # label_col is a generic parameter: STRING labels must work, and an
    # exact cosine tie must resolve to the LEXICALLY smallest label —
    # the min_by over (−cosine, label) is an ascending MIN comparison,
    # orderable for any type (the old struct(cosine, −label) tiebreak
    # was numeric-only and raised AnalysisException on strings)
    from ticktock_spark.pipeline.similarity import centroid_label_agreement

    rows = [
        (1, [1.0, 0.0], "news"), (2, [1.0, 0.0], "news"),
        # "blog"'s centroid is IDENTICAL to "news"'s direction → every
        # vector ties between the two centroids → pred = "blog" (< "news")
        (3, [2.0, 0.0], "blog"), (4, [2.0, 0.0], "blog"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = {r["label"]: r for r in centroid_label_agreement(df).collect()}
    assert out["blog"]["agreement"] == 1.0   # ties resolve to "blog"
    assert out["news"]["agreement"] == 0.0   # ...so "news" loses them
    assert out["news"]["n"] == 2
