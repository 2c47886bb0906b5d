"""Streaming intake novelty gate: the live twin of
``pipeline.dedup.gram_novelty`` (q185).

Why a stream twin: novelty is DEFINED by arrival order (a gram's first
occurrence = its minimum doc id = ingest order), so the streaming form
isn't an approximation of the batch operator — it is the same quantity
computed incrementally. A standing gram→first-doc index carries the
"everything seen so far" side; each micro-batch scores its documents
against (index ∪ the batch's own earlier docs) and then contributes its
first-occurrence grams to the index. When documents arrive in id order,
the concatenated per-epoch reports are EXACTLY ``gram_novelty`` over
the full corpus — parity by definition, pinned in
tests/test_streaming_novelty.py.

Per-batch cost: one explode over the batch (never the corpus), one
gram-keyed groupBy at batch scale, one join against the standing index
(gram-keyed — at 100 TB the index is a bucketed table and this is the
classic stream-static join). The corpus is never rescanned; that is
the point of maintaining the index instead of recomputing q185
nightly.

Replay idempotence: both the report and the index APPEND are
partitioned by ``__epoch`` and written with dynamic partition
overwrite (the streaming_chunk_dedup sink discipline) — a
crash-replayed micro-batch rewrites its own partitions bit-identically
(its verdicts depend only on strictly earlier epochs + the batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ticktock_spark.pipeline.dedup import _doc_grams


def batch_novelty(
    batch: DataFrame,
    index_df: DataFrame | None,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Score one batch against a standing (gram, first_id) index.

    Returns ``(report, new_grams)``: the per-doc
    (id, n_grams, n_new, novelty) report — a gram is new for a doc iff
    it is absent from the index AND this doc is its first holder within
    the batch — and the (gram, first_id) rows the batch adds to the
    index (its first-occurrence grams not already indexed).
    """
    dg = _doc_grams(batch, n, text_col, id_col)
    bf = dg.groupBy("gram").agg(F.min(id_col).alias("batch_first"))
    if index_df is not None:
        seen = index_df.select("gram").distinct()
        bf = bf.join(seen.withColumn("__seen", F.lit(1)), "gram", "left")
    else:
        bf = bf.withColumn("__seen", F.lit(None).cast("int"))
    marked = dg.join(bf, "gram")
    is_new = F.col("__seen").isNull() & (
        F.col("batch_first") == F.col(id_col)
    )
    report = (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count(F.when(is_new, 1)).cast("long").alias("n_new"),
        )
        .select(
            id_col,
            "n_grams",
            "n_new",
            (F.col("n_new").cast("double") / F.col("n_grams")).alias(
                "novelty"
            ),
        )
    )
    new_grams = (
        bf.filter(F.col("__seen").isNull())
        .select("gram", F.col("batch_first").alias("first_id"))
    )
    return report, new_grams


def streaming_novelty_gate(
    doc_stream: DataFrame,
    report_path: str,
    index_path: str,
    checkpoint: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Maintain the gram index and emit per-doc novelty reports, epoch
    by epoch. Returns the StreamingQuery (availableNow trigger)."""

    def gate(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        # existence check through the Hadoop FS (works for s3://hdfs://
        # too), NOT a broad except around the read: a transient read
        # failure must fail the epoch (and be retried by the stream),
        # never be mistaken for "no index yet" — that mistake would
        # score every gram as novel AND rewrite already-indexed grams
        # with wrong first_ids, permanently.
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(index_path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            full_index = spark.read.parquet(index_path)
            # checkpoint/index lifetime guard: an index partition from a
            # FUTURE epoch means the checkpoint was reset while the
            # index was kept — epoch ids restarted at 0 and the
            # partition overwrites below would clobber standing history
            ahead = full_index.filter(
                F.col("__epoch") > F.lit(epoch_id)
            ).limit(1)
            if ahead.count() > 0:
                raise RuntimeError(
                    f"novelty index at {index_path} holds epochs beyond"
                    f" {epoch_id}: the checkpoint was reset while the"
                    " index was kept. The index and checkpoint share a"
                    " lifetime — restart with a fresh index_path (or"
                    " restore the checkpoint) instead of silently"
                    " rewriting first-doc attributions."
                )
            index_df = full_index.filter(F.col("__epoch") < F.lit(epoch_id))
        else:
            index_df = None  # first epoch: no index yet
        batch.persist()
        report, new_grams = batch_novelty(
            batch, index_df, n=n, text_col=text_col, id_col=id_col
        )
        try:
            (
                report.withColumn("__epoch", F.lit(epoch_id))
                .write.partitionBy("__epoch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(report_path)
            )
            (
                new_grams.withColumn("__epoch", F.lit(epoch_id))
                .write.partitionBy("__epoch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(index_path)
            )
        finally:
            batch.unpersist()

    return (
        doc_stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
