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
