"""Structured Streaming ingest: the write path.

Replaces the reference's listener→responder→page-buffer pipeline
(`src/core/tcp.cpp`, `src/core/ts.cpp:276-421`) and its WAL
(`src/utils/append.cpp`): sources (socket for dev, Kafka/files in prod)
stream lines through the same parsers as batch, append to the
`datapoints` table partitioned by `dt`, with exactly-once via
checkpointing — crash recovery comes from the sink's checkpoint/WAL
rather than a custom append log.

Out-of-order data needs no special OOO page (`ts.cpp:365-421`): rows land
where they land and query-time dedup (`max_by(value, seq)`) reproduces
last-wins; `seq` is assigned from the streaming batch id + row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ticktock_spark.sources.parsers import (
    influx_lines_to_datapoints,
    json_lines_to_datapoints,
    put_lines_to_datapoints,
)

FORMATS = {
    "put": put_lines_to_datapoints,
    "json": json_lines_to_datapoints,
    "influx": influx_lines_to_datapoints,
}


def _finalize_datapoints(dps: DataFrame) -> DataFrame:
    """Attach seq + dt to a parsed datapoint stream.

    seq = micro-batch wall clock (µs): later batches win dedup ties,
    matching last-write-wins at batch granularity. (The batch path uses
    monotonically_increasing_id, which streaming disallows; the
    reference's sub-batch tie-break is its page index, which has no
    streaming analogue.)
    """
    return dps.withColumns(
        {
            "seq": F.unix_micros(F.current_timestamp()),
            "dt": F.to_date(F.timestamp_millis(F.col("ts"))),
        }
    )


def kafka_records_to_datapoints(records: DataFrame, fmt: str = "put") -> DataFrame:
    """Kafka-shaped records (binary `value` column) → canonical datapoints.

    One record = one protocol line; `fmt` selects the parser, mirroring
    the reference's two-listener protocol split (`src/core/tcp.cpp:514-534`
    port A = telnet put, port B line protocol via the TCS_SECOND flag;
    `conf/tt.conf:11-16`). Factored out of stream_kafka_lines so tests can
    drive it with a batch frame when no broker/connector is available.
    """
    lines = records.select(F.col("value").cast("string").alias("value"))
    return _finalize_datapoints(FORMATS[fmt](lines))


def stream_kafka_lines(
    spark: SparkSession,
    brokers: str,
    topics: str,
    fmt: str = "put",
    starting_offsets: str = "latest",
) -> DataFrame:
    """Production ingest: Kafka topic(s) of protocol lines → canonical
    datapoints stream (SURVEY §2.1 maps `tcp.cpp` listeners to "socket
    (dev) or Kafka (prod)"). Exactly-once to the parquet sink comes from
    the sink checkpoint tracking Kafka offsets — the streaming analogue of
    the reference's WAL (`src/utils/append.cpp`).

    Requires the spark-sql-kafka connector on the classpath; everything
    after `.load()` is the same parser pipeline as file/socket ingest.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return kafka_records_to_datapoints(raw, fmt)


def stream_put_lines(
    spark: SparkSession,
    path: str | None = None,
    host: str | None = None,
    port: int | None = None,
    fmt: str = "put",
) -> DataFrame:
    """readStream (file dir or socket) → canonical datapoints stream."""
    if path is not None:
        lines = spark.readStream.format("text").load(path).withColumnRenamed("value", "value")
    elif host is not None and port is not None:
        lines = spark.readStream.format("socket").option("host", host).option("port", port).load()
    else:
        raise ValueError("need path or host/port")
    return _finalize_datapoints(FORMATS[fmt](lines))


def write_datapoints_stream(
    dps: DataFrame, out_path: str, checkpoint: str, trigger_once: bool = False
):
    """Append stream → dt-partitioned parquet (the `datapoints` table)."""
    w = (
        dps.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("dt")
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def load_series_dim(spark: SparkSession, series_path: str) -> DataFrame:
    """Read the ingest-maintained series dimension, collapsing the rare
    duplicate a replayed foreachBatch can append (at-least-once side
    effects): consumers always see one row per skey."""
    return spark.read.parquet(series_path).dropDuplicates(["skey"])


def write_datapoints_stream_with_series(
    dps: DataFrame,
    out_path: str,
    checkpoint: str,
    series_path: str,
    trigger_once: bool = False,
):
    """foreachBatch twin of write_datapoints_stream that also maintains the
    series dimension at ingest time — the streaming analogue of
    TsdbStore.add discovering new series, mirroring how the reference
    registers a series in its metric map the first time a point for it
    arrives (`src/core/tsdb.cpp:401-507`).

    Per batch: append the datapoints, distill the batch's distinct series
    (O(batch series), map-side), anti-join against the existing dim (the
    dim is O(total series) — small — so this stays cheap at 100 TB of
    points), append only the new skeys. Series appends are idempotent
    under batch replay up to duplicate rows, which load_series_dim
    collapses.
    """
    from pyspark.errors import AnalysisException

    from ticktock_spark.schema import series_dim_from

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        # unpersist in finally: a failed write raises out of foreachBatch
        # and Structured Streaming retries with a FRESH batch_df — without
        # this, every failed attempt's cached blocks stay resident
        try:
            batch_df.write.mode("append").partitionBy("dt").parquet(out_path)
            new = series_dim_from(batch_df)
            spark = batch_df.sparkSession
            try:
                existing = spark.read.parquet(series_path).select("skey")
                new = new.join(existing, "skey", "left_anti")
            except AnalysisException:
                pass  # first batch: no dim yet
            new.write.mode("append").parquet(series_path)
        finally:
            batch_df.unpersist()

    w = (
        dps.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
