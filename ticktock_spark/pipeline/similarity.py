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
