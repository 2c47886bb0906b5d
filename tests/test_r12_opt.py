"""Round-12 optimization regression tests."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F


def test_query_matrix_cap_fails_loudly(spark, monkeypatch):
    """An oversized query frame must raise at build time, not OOM the
    driver mid-collect (r11 verdict ask #6: the broadcast-query kernels
    collected the query side with no named cardinality bound)."""
    from ticktock_spark.pipeline import similarity as sim

    df = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    monkeypatch.setattr(sim, "MAX_QUERY_ROWS", 4)
    with pytest.raises(ValueError, match="MAX_QUERY_ROWS"):
        sim.cosine_scores(df, df.withColumnRenamed("vec_id", "query_id"))
    # at or under the cap the kernels build normally
    monkeypatch.setattr(sim, "MAX_QUERY_ROWS", 10)
    out = sim.cosine_scores(
        df, df.withColumnRenamed("vec_id", "query_id")
    )
    assert out.count() == 90  # 10x10 minus self-pairs


def test_cosine_topk_partials_matches_full_scores(spark):
    """cosine_topk_partials + the downstream rank cut must equal
    cosine_scores + the same cut — including exact-twin ties (the
    vec_id tiebreak), NaN-cosine rows (zero-norm-free but inf
    components) and k larger than a block. Random vectors with planted
    exact twins across a multi-partition corpus."""
    import random

    from pyspark.sql import Window

    from ticktock_spark.pipeline import similarity as sim

    rng = random.Random(1212)
    rows = []
    for i in range(120):
        v = [round(rng.uniform(-1, 1), 3) for _ in range(8)]
        rows.append((i, v))
    # planted exact twins: same vector, different ids (tiebreak matters)
    for j, src in enumerate((3, 7, 11, 13)):
        rows.append((200 + j, rows[src][1]))
    # an inf-component vector: norm inf -> cosine NaN against others
    rows.append((300, [float("inf")] + [0.0] * 7))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(5)
    q = df.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    for k in (1, 7, 500):  # 500 > corpus: partials must degrade to full
        full = (
            sim.cosine_scores(df, q)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        part = (
            sim.cosine_topk_partials(df, q, k=k)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        import math

        canon = lambda df_: sorted(  # noqa: E731
            tuple(
                "NaN"
                if isinstance(x, float) and math.isnan(x)
                else x
                for x in r
            )
            for r in df_.toPandas().itertuples(index=False)
        )
        a, b = canon(full), canon(part)
        assert a == b, f"k={k}: first diff {[x for x in zip(a, b) if x[0] != x[1]][:2]}"


def test_cosine_argmax_partials_nan_ranks_last(spark):
    """A NaN cosine crosses Arrow as SQL NULL, and the global
    max_by(vec_id, struct(cosine, -vec_id)) ranks NULL below every
    finite cosine — so the kernel must too. r11's form ranked NaN FIRST
    (Spark's raw NaN-is-largest order, unreachable through Arrow): a
    block containing one NaN-cosine row emitted it as the block winner
    and silently suppressed the block's finite candidates. Planted: an
    inf-component corpus vector (NaN against every query) spread into a
    multi-partition corpus, plus an all-NaN query (zero-norm) whose
    winner must be the min-id NULL row."""
    import random

    from ticktock_spark.pipeline import similarity as sim

    rng = random.Random(77)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(6)])
        for i in range(80)
    ]
    rows.append((300, [float("inf")] + [0.0] * 5))
    # range partitioning pins the NaN row (vec_id 300) into the SAME
    # block as the upper-id rows — including the planted global winner
    # below — so the old kernel's NaN-first suppression is guaranteed
    # to bite, not left to hash placement
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartitionByRange(2, "vec_id")
    q_rows = [(5000, rows[70][1])]  # exact twin of row 70: winner, cos 1.0
    q_rows += [(int(r[0]), r[1]) for r in rows[:3]]
    q_rows.append((999, [0.0] * 6))  # zero-norm: NaN against everything
    q = spark.createDataFrame(
        q_rows, "query_id long, embedding array<double>"
    )
    tail = lambda scored: scored.groupBy("query_id").agg(  # noqa: E731
        F.max_by(
            "vec_id", F.struct(F.col("cosine"), (-F.col("vec_id")))
        ).alias("nn")
    )
    full = sorted(map(tuple, tail(sim.cosine_scores(df, q)).collect()))
    part = sorted(
        map(tuple, tail(sim.cosine_argmax_partials(df, q)).collect())
    )
    assert full == part, (full, part)
    # the exact-twin query's winner is its twin (finite beats the
    # same-block NaN), the all-NaN query's the min corpus id (NULL
    # group tiebreak)
    assert dict(full)[5000] == 70
    assert dict(full)[999] == 0


def test_banded_kernel_grows_past_initial_capacity(spark):
    """The vectorized MinHash kernel must survive > 2^14 distinct
    shingles per task THROUGH SPARK (not just in-process): r11's form
    kept the piece matrix in a closure variable rebound via `nonlocal`
    from a sibling function, which works in-process but came back from
    the worker-side deserialization as SEPARATE cells — every task that
    grew past the initial capacity crashed np.take (reproduced on the
    sf1 tier, invisible at sf0.1 where tasks stay under 2^14). The
    in-process call is the ground truth (band keys pinned to the sql
    engine by the existing parity tests); this pins spark == in-process
    at a cardinality that exercises the growth path.
    """
    from ticktock_spark.pipeline.dedup import _banded_pandas

    import hashlib

    docs = [
        " ".join(
            hashlib.md5(f"{i},{j}".encode()).hexdigest()[:12]
            for j in range(30)
        )
        for i in range(700)
    ]
    pdf = pd.DataFrame({"doc_id": list(range(700)), "norm": docs})
    # sanity: the input really exceeds the kernel's initial 2^14 piece
    # capacity, so the growth path is exercised
    distinct = set()
    for d in docs:
        distinct.update(d[i : i + 5] for i in range(len(d) - 4))
    assert len(distinct) > (1 << 14)

    kernel = lambda: _banded_pandas(8, 4, 2, "doc_id", k=5)  # noqa: E731
    got = (
        spark.createDataFrame(pdf)
        .repartition(1)
        .mapInPandas(kernel(), schema="doc_id bigint, band int, key string")
        .toPandas()
    )
    exp = pd.concat(list(kernel()(iter([pdf]))))
    assert sorted(map(tuple, got.itertuples(index=False))) == sorted(
        map(tuple, exp.itertuples(index=False))
    )
