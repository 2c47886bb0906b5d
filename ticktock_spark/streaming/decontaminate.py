"""Streaming eval-set decontamination: the live intake-time twin of
``pipeline.dedup.decontaminate`` (q173/q177).

Why a stream twin: decontamination is the screen most likely to run
over the FULL corpus, and in a production intake pipeline the cheapest
place to run it is before a document is ever admitted — the same
argument as the dedup intake gate (streaming/dedup_lsh.py). The eval
suite is STATIC for any given release, so the screen is stateless:
every document's verdict depends only on its own text and the fixed
benchmark gram set. That makes ``foreachBatch`` + the BATCH operator
the exact architecture — per-doc n-grams live in one row, so running
``decontaminate`` on each micro-batch IS the global semantics
restricted to that batch's docs (no cross-batch state, no watermark),
and parity with the nightly batch job holds by construction because it
is literally the same function.

Per-batch cost: the benchmark side is derived ONCE up front
(``benchmark_grams``) and persisted by the caller — each micro-batch
pays one explode + one hash join at batch scale, never bench-derivation
cost. ``hash_grams=True`` applies the q177 narrow-shuffle engine
per batch (8-byte keys; a 64-bit collision only ADDS a hit — the
screen stays conservative).

Replay idempotence: clean docs and the contamination report are
partitioned by ``__epoch`` and written with DYNAMIC partition
overwrite, so a crash-replayed micro-batch rewrites its own partitions
instead of double-admitting documents (the streaming_chunk_dedup sink
discipline). Output is deterministic given the batch + the static
bench set, so the rewritten epoch is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ticktock_spark.pipeline.dedup import benchmark_grams, decontaminate


def streaming_decontaminate(
    doc_stream: DataFrame,
    benchmark: DataFrame,
    clean_path: str,
    report_path: str,
    checkpoint: str,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = False,
    bench_grams_df: DataFrame | None = None,
):
    """Admit clean documents to ``clean_path``; quarantine every doc
    sharing any word ``n``-gram with ``benchmark`` into ``report_path``
    as the (id, n_hits, n_grams, hit_ratio) audit report — the batch
    operator's exact output, epoch by epoch.

    Pass ``bench_grams_df`` (persisted ``benchmark_grams`` output, or a
    parquet read of it) to skip re-deriving the bench side here; with
    neither persisted nor materialized, each micro-batch would re-run
    the benchmark explode — correct but wasteful.

    Returns the StreamingQuery.
    """
    bench = (
        benchmark_grams(benchmark, n=n, bench_text_col=text_col)
        if bench_grams_df is None
        else bench_grams_df
    )

    def screen(batch: DataFrame, epoch_id: int) -> None:
        # the report feeds BOTH the quarantine write and the clean-side
        # anti-join — persist so the screen subtree runs once per epoch
        batch.persist()
        report = decontaminate(
            batch,
            None,
            n=n,
            text_col=text_col,
            id_col=id_col,
            hash_grams=hash_grams,
            bench_grams_df=bench,
        ).persist()
        try:
            (
                report.withColumn("__epoch", F.lit(epoch_id))
                .write.partitionBy("__epoch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(report_path)
            )
            clean = batch.join(
                report.select(id_col), id_col, "left_anti"
            )
            (
                clean.withColumn("__epoch", F.lit(epoch_id))
                .write.partitionBy("__epoch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(clean_path)
            )
        finally:
            report.unpersist()
            batch.unpersist()

    return (
        doc_stream.writeStream.foreachBatch(screen)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
