"""Streaming inverted-index maintenance: each micro-batch of documents
becomes its own index segment.

The batch layout (pipeline/retrieval.py) was designed for exactly this:
segments are dynamic-partition-overwritten, so an epoch REPLAY rewrites
its own `segment=e<epoch>` directories byte-for-byte instead of
double-counting — effectively-once index maintenance without any
transaction log. Queries (bm25_index_topk) see every committed segment
immediately: df comes from a count window over the pruned scan and the
per-segment stats rows are summed at read time, so nothing goes stale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ticktock_spark.pipeline.retrieval import append_inverted_index


def streaming_index_append(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Maintain a standing BM25 inverted index from a document stream.

    foreachBatch → append_inverted_index(segment=f"e{epoch}"): one scan
    of the micro-batch, postings shuffled once on (tok, doc), the
    standing segments never read or rewritten. State lives entirely in
    the index layout — the stream itself is stateless, so there is no
    watermark and no state store to size.

    Contract (inherited from append_inverted_index): doc ids are
    disjoint across batches — screen re-deliveries with
    incremental_exact_dedup upstream if the source can repeat them.

    Returns the StreamingQuery.
    """

    def add_segment(batch: DataFrame, epoch_id: int) -> None:
        append_inverted_index(
            batch, index_path, segment=f"e{epoch_id}",
            text_col=text_col, id_col=id_col,
        )

    return (
        doc_stream.writeStream.foreachBatch(add_segment)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
