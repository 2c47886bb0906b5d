"""Similarity search over embedding columns (array<float>).

- brute_force_knn: exact cosine top-k. The query side is broadcast (k
  query vectors are small); the corpus is scanned once; per-partition
  top-k then a tiny global top-k — no all-to-all shuffle. This is the
  baseline and the verification oracle for approximate variants.
- ivf_knn: IVF-style approximate search. Centroids (from a provided
  assignment column or computed by averaging per bucket) are broadcast;
  each query probes its nearest `nprobe` centroids and only scans those
  buckets. At 100 TB: corpus bucketed/partitioned by centroid id on
  storage → partition pruning makes a query touch nprobe/nlist of the
  data.

Dot products use F.aggregate (sequential fold → deterministic order,
bit-stable) over zip_with, entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    queries: (query_id, embedding). Output: query_id, vec_id, cosine, rank.
    Ties broken by vec_id for determinism.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    joined = corpus.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_scores(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    quantize: bool = True,
) -> DataFrame:
    """(query_id, vec_id, cosine) for every corpus × query pair, scored
    as an Arrow-batched numpy block product.

    The query matrix (small — top-k searches have few queries) is
    broadcast; each corpus partition scores against it with sequential
    per-dimension float64 accumulation, so values are bit-identical to
    the SQL fold the DuckDB oracles use (same rationale and kernel shape
    as cosine_neardup_pairs). Self-pairs (vec_id == query_id) are
    excluded, matching brute_force_knn.
    """
    import numpy as np
    import pandas as pd

    qpdf = queries.select(query_id_col, vec_col).toPandas()
    q_ids = qpdf[query_id_col].to_numpy(dtype=np.int64)
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    dim = Q.shape[1]
    acc = np.zeros(len(q_ids))
    for d in range(dim):
        acc = acc + Q[:, d] * Q[:, d]
    q_norms = np.sqrt(acc)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, Q, q_norms))

    def block(batches):
        b_qids, b_Q, b_qnorms = bc.value
        for pdf_in in batches:
            if len(pdf_in) == 0:
                continue
            c_ids = pdf_in[id_col].to_numpy(dtype=np.int64)
            C = np.stack(pdf_in[vec_col].to_numpy()).astype(np.float64)
            dots = np.zeros((len(c_ids), len(b_qids)))
            for d in range(dim):
                dots += C[:, d : d + 1] * b_Q[:, d]
            acc_c = np.zeros(len(c_ids))
            for d in range(dim):
                acc_c += C[:, d] * C[:, d]
            cos = dots / (np.sqrt(acc_c)[:, None] * b_qnorms[None, :])
            if quantize:
                cos = np.floor(cos * 1_000_000.0 + 0.5) / 1_000_000.0
            keep = c_ids[:, None] != b_qids[None, :]
            ci, qj = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "query_id": b_qids[qj],
                    "vec_id": c_ids[ci],
                    "cosine": cos[ci, qj],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        block, schema="query_id long, vec_id long, cosine double"
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = True,
) -> DataFrame:
    """All-pairs cosine near-duplicates: (id_a < id_b, cosine ≥ threshold).

    Dense pairwise linear algebra is the one place the built-in array
    expressions genuinely can't compete: fold/zip_with are interpreted
    per element per pair (CodegenFallback, no codegen), which makes an
    expression-based n² cosine O(n²·dim) *interpreter* steps. This runs
    as an Arrow-batched ``mapInPandas`` block product instead: the corpus
    matrix is broadcast once, each partition's rows score against it in
    numpy — vectorized across pairs but accumulated SEQUENTIALLY over the
    vector dimension in float64, so every partial sum rounds exactly like
    a SQL engine's left-to-right fold and results stay bit-identical to
    the DuckDB oracle.

    Scale: fine to ~1M × small-dim broadcast; beyond that, block the
    corpus into chunks and union one such scan per chunk (work stays
    distributed over corpus partitions either way). The smarter scale
    path is pruning candidates first (IVF buckets / sign-random-
    projection LSH) and running this exact kernel only within buckets.
    """
    import numpy as np
    import pandas as pd

    pdf = corpus.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    dim = M.shape[1]
    # sequential-fold norms: acc += x*x over dims, left to right
    acc = np.zeros(len(ids))
    for d in range(dim):
        acc = acc + M[:, d] * M[:, d]
    norms = np.sqrt(acc)
    bc = corpus.sparkSession.sparkContext.broadcast((ids, M, norms))

    def block(batches):
        b_ids, b_M, b_norms = bc.value
        for pdf_in in batches:
            if len(pdf_in) == 0:
                continue
            a_ids = pdf_in[id_col].to_numpy(dtype=np.int64)
            A = np.stack(pdf_in[vec_col].to_numpy()).astype(np.float64)
            dots = np.zeros((len(a_ids), len(b_ids)))
            for d in range(dim):
                dots += A[:, d : d + 1] * b_M[:, d]
            # a_norm computed the same sequential way
            acc_a = np.zeros(len(a_ids))
            for d in range(dim):
                acc_a += A[:, d] * A[:, d]
            cos = dots / (np.sqrt(acc_a)[:, None] * b_norms[None, :])
            if quantize:
                cos = np.floor(cos * 1_000_000.0 + 0.5) / 1_000_000.0
            keep = (a_ids[:, None] < b_ids[None, :]) & (cos >= threshold)
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {"id_a": a_ids[ai], "id_b": b_ids[bj], "cosine": cos[ai, bj]}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        block, schema="id_a long, id_b long, cosine double"
    )


def srp_bucketed(
    corpus: DataFrame,
    nbits: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach a sign-random-projection LSH bucket key to each vector.

    ``nbits`` fixed hyperplanes (deterministic from ``seed``) → one bit
    per sign of the projection → an integer bucket in [0, 2^nbits).
    Nearby vectors (small angle) agree on most signs, so they land in the
    same or Hamming-adjacent buckets. At 100 TB the bucket is a storage
    partition/cluster key: a query touches only its probed buckets, and
    the hyperplanes are a (nbits × dim) constant that ships to every
    executor for free — unlike IVF there is no centroid training pass.
    """
    import numpy as np
    import pandas as pd

    first = corpus.select(vec_col).first()
    dim = len(first[0])
    planes = np.random.default_rng(seed).standard_normal((nbits, dim))
    bc = corpus.sparkSession.sparkContext.broadcast(planes)
    weights = 1 << np.arange(nbits, dtype=np.int64)

    def stage(batches):
        P = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (M @ P.T) >= 0.0
            pdf = pdf[[id_col, vec_col]].copy()
            pdf["bucket"] = (bits * weights).sum(axis=1)
            yield pdf

    vec_type = dict(corpus.dtypes)[vec_col]
    id_type = dict(corpus.dtypes)[id_col]
    return corpus.select(id_col, vec_col).mapInPandas(
        stage, schema=f"{id_col} {id_type}, {vec_col} {vec_type}, bucket long"
    )


def srp_lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nbits: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k via SRP-LSH with Hamming≤1 multiprobe.

    Query signatures and their nbits+1 probe buckets (exact bucket plus
    every single-bit flip) are computed driver-side — the query set is
    small — and broadcast onto the bucketed corpus; the exact cosine runs
    only within probed buckets (~(nbits+1)/2^nbits of the corpus).
    Deterministic for a fixed seed. Output: query_id, vec_id, cosine,
    rank — same shape as brute_force_knn, which is its recall oracle.
    """
    import numpy as np

    spark = corpus.sparkSession
    bucketed = srp_bucketed(corpus, nbits=nbits, seed=seed, id_col=id_col, vec_col=vec_col)

    qpdf = queries.select(query_id_col, vec_col).toPandas()
    first_dim = len(qpdf[vec_col].iloc[0])
    planes = np.random.default_rng(seed).standard_normal((nbits, first_dim))
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    sigs = ((Q @ planes.T) >= 0.0) @ (1 << np.arange(nbits, dtype=np.int64))
    probe_rows = []
    for qid, sig, vec in zip(qpdf[query_id_col], sigs, qpdf[vec_col]):
        buckets = {int(sig)} | {int(sig) ^ (1 << b) for b in range(nbits)}
        probe_rows += [(int(qid), int(b), [float(x) for x in vec]) for b in sorted(buckets)]
    probes = spark.createDataFrame(
        probe_rows, f"{query_id_col} long, bucket long, __qvec array<double>"
    )

    cand = bucketed.join(F.broadcast(probes), "bucket").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = cand.select(
        query_id_col, id_col, cosine(F.col(vec_col), F.col("__qvec")).alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_centroids(corpus: DataFrame, bucket_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Per-bucket mean vector (the coarse quantizer). The testdata's
    `label` column stands in for a k-means assignment; at scale run a few
    Lloyd iterations with the same groupBy-average."""
    dim = F.size(F.col(vec_col))
    exploded = corpus.select(bucket_col, F.posexplode(vec_col).alias("i", "x"))
    cent = (
        exploded.groupBy(bucket_col, "i")
        .agg(F.avg("x").alias("c"))
        .groupBy(bucket_col)
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("ic"))
        .select(bucket_col, F.transform("ic", lambda s: s["c"]).alias("centroid"))
    )
    return cent


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest centroids per query,
    then exact cosine within those buckets only."""
    cent = ivf_centroids(corpus, bucket_col, vec_col)
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
    probe_scores = q.crossJoin(F.broadcast(cent)).select(
        query_id_col,
        bucket_col,
        F.col("__qvec"),
        cosine(F.col("__qvec"), F.col("centroid")).alias("cscore"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cscore").desc(), F.col(bucket_col))
    probes = probe_scores.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= nprobe)
    candidates = corpus.join(
        F.broadcast(probes.select(query_id_col, bucket_col, "__qvec")), on=bucket_col
    ).filter(F.col(id_col) != F.col(query_id_col))
    scored = candidates.select(
        query_id_col, id_col, cosine(F.col(vec_col), F.col("__qvec")).alias("cosine")
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)
