"""Classifier-evaluation tests: hand-computed tie-corrected AUC,
confusion metrics at threshold, degenerate single-class guards, and
null-row exclusion (pipeline/classify.py classifier_eval)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ticktock_spark.pipeline.classify import classifier_eval


def _eval(spark, rows, threshold=0.5):
    df = spark.createDataFrame(rows, "score double, y boolean")
    return classifier_eval(df, threshold=threshold).collect()[0]


def test_auc_with_ties_hand_computed(spark):
    """P=2, N=3 with one tied score: U = 3 (0.9 beats all negs)
    + 2.5 (0.8 beats two negs, ties one) = 5.5 → AUC = 5.5/6."""
    r = _eval(
        spark,
        [(0.9, True), (0.8, False), (0.8, True), (0.3, False), (0.1, False)],
    )
    assert abs(r["auc"] - 11 / 12) < 1e-12
    assert (r["n_pos"], r["n_neg"]) == (2, 3)
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 0, 2)
    assert abs(r["precision"] - 2 / 3) < 1e-12
    assert r["recall"] == 1.0
    assert abs(r["f1"] - 0.8) < 1e-12
    assert abs(r["accuracy"] - 0.8) < 1e-12


def test_perfect_and_inverted_rankings(spark):
    perfect = _eval(spark, [(0.9, True), (0.8, True), (0.2, False)])
    assert perfect["auc"] == 1.0
    inverted = _eval(spark, [(0.1, True), (0.2, True), (0.9, False)])
    assert inverted["auc"] == 0.0
    all_tied = _eval(spark, [(0.5, True), (0.5, False), (0.5, False)])
    assert abs(all_tied["auc"] - 0.5) < 1e-12


def test_single_class_yields_null_ratios(spark):
    r = _eval(spark, [(0.9, False), (0.1, False)])
    assert r["auc"] is None and r["recall"] is None and r["f1"] is None
    assert (r["n_pos"], r["n_neg"]) == (0, 2)
    # no predicted positives at a high threshold → precision NULL
    r2 = _eval(spark, [(0.1, True), (0.2, False)], threshold=0.9)
    assert r2["precision"] is None and r2["tp"] == 0


def test_grouped_eval_partitions_slices(spark):
    """group_cols computes an independent report per slice — each
    group's AUC matches the ungrouped AUC of that slice alone."""
    rows = [
        ("a", 0.9, True), ("a", 0.8, False), ("a", 0.3, False),
        ("b", 0.2, True), ("b", 0.7, False),
    ]
    df = spark.createDataFrame(rows, "src string, score double, y boolean")
    got = {
        r["src"]: r
        for r in classifier_eval(df, group_cols=["src"]).collect()
    }
    assert got["a"]["auc"] == 1.0 and got["b"]["auc"] == 0.0
    for src in ("a", "b"):
        solo = classifier_eval(df.filter(F.col("src") == src)).collect()[0]
        assert got[src]["auc"] == solo["auc"]
        assert got[src]["tp"] == solo["tp"]


def test_calibration_bins(spark):
    """Bin edges, counts, pos_rate, and micro-unit mean are exact; a
    score of 1.0 clamps into the top bin."""
    from ticktock_spark.pipeline.classify import calibration_bins

    df = spark.createDataFrame(
        [(0.05, False), (0.08, True), (0.95, True), (1.0, True)],
        "score double, y boolean",
    )
    got = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert set(got) == {0, 9}
    b0 = got[0]
    assert (b0["n"], b0["n_pos"]) == (2, 1) and b0["pos_rate"] == 0.5
    assert abs(b0["mean_score"] - 0.065) < 1e-12
    assert (b0["lo"], b0["hi"]) == (0.0, 0.1)
    b9 = got[9]
    assert (b9["n"], b9["n_pos"]) == (2, 2) and b9["pos_rate"] == 1.0
    assert abs(b9["mean_score"] - 0.975) < 1e-12


def test_null_scores_and_labels_excluded(spark):
    df = spark.createDataFrame(
        [(0.9, True), (None, True), (0.4, None), (0.2, False)],
        "score double, y boolean",
    )
    r = classifier_eval(df).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (1, 1)
    assert r["auc"] == 1.0


def test_threshold_sweep_counts(spark):
    from pyspark.sql import functions as F

    from ticktock_spark.pipeline.classify import threshold_sweep

    scored = spark.createDataFrame(
        [(0.1, True), (0.3, False), (0.5, True), (0.7, False), (0.9, True), (None, True)],
        "score double, y boolean",
    )
    out = {r["threshold"]: r for r in threshold_sweep(scored, (0.4, 0.8)).collect()}
    r4 = out[0.4]
    # kept at 0.4: 0.5T, 0.7F, 0.9T → tp=2 fp=1; dropped: 0.1T, 0.3F → fn=1 tn=1
    assert (r4["n"], r4["tp"], r4["fp"], r4["fn"], r4["tn"]) == (5, 2, 1, 1, 1)
    assert r4["precision"] == 2 / 3 and r4["recall"] == 2 / 3
    assert r4["kept_frac"] == 3 / 5
    r8 = out[0.8]
    assert (r8["tp"], r8["fp"], r8["fn"], r8["tn"]) == (1, 0, 2, 2)
    assert r8["precision"] == 1.0 and r8["recall"] == 1 / 3
