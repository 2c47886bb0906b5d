"""Pipeline operator unit tests: MinHash engine parity, near-dup
detection on fabricated duplicates, SimHash locality."""

from __future__ import annotations

from pyspark.sql import functions as F

from ticktock_spark.pipeline import dedup as dd

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
    (3, "a completely different document about spark query processing engines"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (5, "numbers 12345 and punctuation!!! everywhere, truly everywhere..."),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_minhash_engine_parity(spark):
    """The hashlib mapInPandas stage must be bit-identical to the
    pure-expression specification (same md5 inputs, same minima)."""
    d = _docs(spark)
    a = {tuple(r) for r in dd.minhash_lsh_candidates(d, engine="pandas").collect()}
    b = {tuple(r) for r in dd.minhash_lsh_candidates(d, engine="sql").collect()}
    assert a == b
    assert a, "fabricated dups must produce at least one candidate pair"


def test_minhash_finds_near_dups(spark):
    cand = {(r["id_a"], r["id_b"]) for r in dd.minhash_lsh_candidates(_docs(spark)).collect()}
    assert (1, 4) in cand  # exact dup agrees on every band
    # near-dup pair should surface; unrelated docs should not pair with 3
    assert not any(3 in p for p in cand)


def test_verify_jaccard_on_candidates(spark):
    d = _docs(spark)
    cand = dd.minhash_lsh_candidates(d)
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dd.verify_jaccard(d, cand).collect()}
    assert out[(1, 4)] == 1.0  # identical shingle sets
    if (1, 2) in out:
        assert 0.2 <= out[(1, 2)] < 1.0


def test_simhash_locality(spark):
    s = dd.simhash_dedup(_docs(spark)).collect()
    groups = {r["simhash"]: r for r in s}
    # exact duplicates collapse into one simhash group of size 2
    assert any(r["n_docs"] == 2 for r in s)
    # near-dups (1 vs 2) differ in few bits
    raw = {
        r["doc_id"]: r["simhash"]
        for r in _docs(spark).select(
            "doc_id", dd.simhash32(F.col("text")).alias("simhash")
        ).collect()
    }
    hamming_12 = sum(a != b for a, b in zip(raw[1], raw[2]))
    hamming_13 = sum(a != b for a, b in zip(raw[1], raw[3]))
    assert hamming_12 < hamming_13
