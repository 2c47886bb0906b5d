"""Connected components over near-duplicate pairs → dedup clusters.

Pair-emitting dedup (MinHash-LSH → Jaccard verify, SimHash, embedding
near-dup) is only half the job: to actually deduplicate a corpus the
pairs must be closed into clusters and one canonical doc kept per
cluster. This module does that closure with the alternating
large-star / small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) — the standard O(log n)-round,
shuffle-bounded formulation:

  large-star: every node points its LARGER neighbors at the minimum of
              its neighborhood (incl. itself);
  small-star: every node points its smaller neighbors (and itself) at
              that minimum.

Each round is a groupBy-min + co-partitioned join — state per node is
one long, no adjacency lists are ever collected (no collect_set, no
driver participation), so a degree-10^7 node (an exact-dup mega cluster)
costs a hash-agg, not a memory blowup. Rounds converge in O(log n);
real near-dup graphs (many small clusters + a few stars) converge in
2-4 rounds. Lineage is truncated per round with localCheckpoint so the
plan doesn't grow unboundedly.

At convergence every component is a star centered at its minimum node
id — the cluster id. This matches the greedy min-id canonicalization the
reference-style dedup pipelines use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    # symmetrize; m(u) = min(N(u) ∪ {u}); emit (v, m(u)) for v > u
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient u > v; m(u) = min(N(u)); emit (x, m(u)) for x ∈ N(u) ∪ {u}, x ≠ m
    d = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    neigh = (
        d.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = mins.select("u", F.col("m").alias("v"))
    return neigh.union(self_edge)


def _canon(edges: DataFrame) -> DataFrame:
    return (
        edges.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """(id_a, id_b) undirected pairs → (node, cluster_id) with
    cluster_id = min node id in the component. Only nodes appearing in
    a real (non-self) pair are emitted — self-pairs carry no linkage and
    singletons are trivially their own cluster; callers left-join if they
    need them labeled (dedup_clusters does).

    Convergence check: canonical edge count + xxhash64 checksum stable
    across a round (collision odds negligible; a false positive would
    need two different edge sets with equal count AND equal hash sum).

    Iteration pattern: each round's edge set is lazily
    localCheckpoint'ed and then materialized by the SAME action that
    computes the convergence signature — one Spark job per round, and
    the checkpoint physically truncates lineage (a star-graph round
    references its input twice, so without truncation the plan tree
    grows exponentially; plain persist() only caches the physical scan,
    the logical tree still explodes).

    ``stats``: optional dict filled with {"rounds": k, "final_edges": n}
    — round-count evidence for the O(log n) claim (tools/scale_stress
    reports it per run).
    """

    def _sig(df: DataFrame) -> tuple:
        # driver-bound: single signature row (n, hash-sum)
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: sum of 64-bit hashes overflows long
            # under ANSI mode; decimal(38,0) absorbs any realistic count
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("chk"),
        ).collect()[0]
        return (r["n"], r["chk"])

    edges = _canon(
        pairs.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
    ).localCheckpoint(eager=False)
    prev_sig = _sig(edges)  # materializes the checkpoint
    for rounds in range(1, max_iter + 1):
        edges = _canon(_small_star(_large_star(edges))).localCheckpoint(eager=False)
        sig = _sig(edges)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    if stats is not None:
        stats["rounds"] = rounds
        stats["final_edges"] = prev_sig[0]
    # stars: u > v = center. members = u side; centers label themselves.
    members = edges.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    centers = edges.select(F.col("v").alias("node"), F.col("v").alias("cluster_id")).distinct()
    return members.union(centers)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Full closure: near-dup pairs → (doc_id, cluster_id, cluster_size,
    is_canonical). Docs with no pair are singleton clusters of
    themselves. Downstream dedup = ``filter(is_canonical)``.

    The docs join is a broadcast-or-shuffle on id — at 100 TB the pair
    graph is tiny relative to the corpus (near-dup rate ≪ 1), so AQE
    broadcasts the labels side.
    """
    labels = connected_components(pairs, src, dst)
    joined = docs.select(F.col(id_col).cast("long").alias("node")).join(
        labels, "node", "left"
    )
    labeled = joined.select(
        F.col("node").alias(id_col),
        F.coalesce("cluster_id", "node").alias("cluster_id"),
    )
    sizes = labeled.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labeled.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )


def keep_best_per_cluster(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Quality-aware canonical selection: label every doc with its
    near-dup cluster (connected components over ``pairs``) and keep the
    highest-``score_col`` doc per cluster (ties → lowest id), instead of
    dedup_clusters' blind min-id rule. This is the curation-grade dedup:
    when a page and its mirror differ only in boilerplate, the cleaner
    copy survives.

    Output: (id, cluster_id, score, is_kept) for every doc — filter
    ``is_kept`` for the deduplicated corpus.

    Scale shape: same as dedup_clusters (tiny label side joined to the
    corpus) plus one per-cluster window; cluster sizes are bounded by
    near-dup group sizes, so the window partitions are small.
    """
    from pyspark.sql import Window

    labels = connected_components(pairs, src, dst)
    labeled = (
        docs.select(F.col(id_col).cast("long").alias("node"), F.col(score_col))
        .join(labels, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("cluster_id", "node").alias("cluster_id"),
            score_col,
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return labeled.withColumn("is_kept", F.row_number().over(w) == 1)


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Train/valid/test assignment where every near-dup CLUSTER lands in
    one split — the leakage guard: hashing doc ids independently would
    scatter near-identical documents across train and test, leaking eval
    content into training. Assignment hashes the cluster id (min member
    id) through the same deterministic md5 ranges as
    ``sample.split_assign``, so singleton docs get exactly the plain
    assignment and clustered docs inherit their cluster's.

    Output: (id, cluster_id, split). Same scale shape as dedup_clusters
    (tiny label side) + the scan-side split expression.
    """
    from ticktock_spark.pipeline.sample import split_assign

    labels = connected_components(pairs, "id_a", "id_b")
    labeled = (
        docs.select(F.col(id_col).cast("long").alias("node"))
        .join(labels, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("cluster_id", "node").alias("cluster_id"),
        )
    )
    return split_assign(
        labeled, weights, id_col="cluster_id", seed=seed, out_col=out_col
    )


def split_leakage_audit(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Measure the leakage a NAIVE per-document hash split would commit:
    assign every doc independently via ``sample.split_assign`` (exactly
    q45's rule), then count verified near-dup pairs by the (unordered)
    pair of splits their endpoints land in. Off-diagonal rows — a
    train/test or train/valid pair — are eval items whose near-copy
    would be trained on; ``leakage_safe_split`` exists to drive them to
    zero, and this audit is the evidence (run it on both assignments:
    cluster-keyed splitting yields no off-diagonal rows by
    construction).

    Output: (split_lo, split_hi, n_pairs) — split names ordered
    lexically within the pair so the matrix is triangular.

    Scale shape: the split is a scan-side md5 expression; the audit
    joins the PAIR table (candidate-verified, pair-scale — orders of
    magnitude below corpus scale) twice against the tiny (id, split)
    projection, then one count per split-pair cell.
    """
    from ticktock_spark.pipeline.sample import split_assign

    s = split_assign(
        docs.select(F.col(id_col)), weights, id_col=id_col, seed=seed
    ).select(F.col(id_col).alias("node"), F.col("split"))
    a = s.select(F.col("node").alias("id_a"), F.col("split").alias("sa"))
    b = s.select(F.col("node").alias("id_b"), F.col("split").alias("sb"))
    j = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    return (
        j.groupBy(
            F.least("sa", "sb").alias("split_lo"),
            F.greatest("sa", "sb").alias("split_hi"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
