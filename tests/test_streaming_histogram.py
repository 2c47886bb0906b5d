"""Streaming value histogram: batch parity of the bin counts and
bit-exact live quantile reads (the q174/q194 pair running live)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ticktock_spark.streaming.histogram import (
    histogram_quantiles,
    streaming_histogram,
)

T0 = 1_704_067_200_000


def _stream(spark, tmp_path, chunks):
    (tmp_path / "in").mkdir(exist_ok=True)
    for bi, chunk in enumerate(chunks):
        f = tmp_path / "in" / f"b{bi}.txt"
        f.write_text("\n".join(f"{m} {ts} {v}" for m, ts, v in chunk))
        os.utime(f, (1_000_000_000 + bi, 1_000_000_000 + bi))
    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(tmp_path / "in"))
    )
    p = F.split("value", " ")
    return lines.select(
        p.getItem(0).alias("metric"),
        p.getItem(1).cast("long").alias("ts"),
        p.getItem(2).cast("double").alias("value"),
    )


def test_streaming_histogram_matches_batch_and_quantiles(spark, tmp_path):
    rows = [("lat", T0 + i * 60_000, round(i * 0.97, 2)) for i in range(200)]
    half = len(rows) // 2
    stream = _stream(spark, tmp_path, (rows[:half], rows[half:]))
    q = (
        streaming_histogram(stream, width=10.0)
        .writeStream.format("memory")
        .queryName("hist_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    live = spark.table("hist_out")

    batch = spark.createDataFrame(rows, "metric string, ts long, value double")
    want = {
        (r["metric"], r["bin"]): r["n"]
        for r in batch.groupBy(
            "metric",
            F.floor(F.col("value") / F.lit(10.0)).cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    got = {(r["metric"], r["bin"]): r["n"] for r in live.collect()}
    assert got == want  # bin-for-bin batch parity

    # live quantile read == the q194 arithmetic over the same state
    est = {
        r["q"]: r["est"]
        for r in histogram_quantiles(live, [0.5, 0.99], width=10.0).collect()
    }
    # uniform ramp 0..193.03: p50 within one bin of the true median
    assert est[0.5] == pytest.approx(0.97 * 99.5, abs=10.0)
    assert est[0.99] == pytest.approx(0.97 * 198, abs=10.0)


def test_streaming_histogram_windowed_late_data(spark, tmp_path):
    # windowed mode: a late-but-inside-watermark point revises ITS
    # window's bins, not the global ones
    rows = [("m", T0 + i * 60_000, float(5 + 10 * (i % 2)))
            for i in range(10)]
    late = [("m", T0 + 60_000, 95.0)]  # lands in window 0
    stream = _stream(spark, tmp_path, (rows[:5], rows[5:] + late))
    q = (
        streaming_histogram(
            stream, width=10.0, window_length="5 minutes", watermark="1 hour"
        )
        .writeStream.format("memory")
        .queryName("whist_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("whist_out").collect()
    w0 = {r["bin"]: r["n"] for r in out if r["window_start"] == T0}
    assert w0[9] == 1  # the late 95.0 revised window 0
    # every window covers 5 minutes and bins are non-negative counts
    assert all(r["window_end"] - r["window_start"] == 300_000 for r in out)
    assert sum(r["n"] for r in out) == 11


def test_late_data_revises_quantile_reads_to_batch(spark, tmp_path):
    """The r8 verdict's OOO ask: out-of-order points arriving WITHIN the
    watermark must revise not just the bins (test above) but the
    QUANTILE READS — the final live state's histogram_quantile estimates
    must equal, bit-for-bit, the batch answer computed over all points
    including the late ones (same state, same q194 arithmetic — the
    reference's whole out-of-order story in SURVEY §1.3 is that late
    data lands in its timestamp's bucket, not its arrival's)."""
    # epoch 1: in-order ramp across two 5-minute windows
    rows = [("m", T0 + i * 30_000, float(3 * i)) for i in range(20)]
    # epoch 2: late points targeting WINDOW 0 (ts inside [T0, T0+5m)),
    # values chosen to move window 0's p50/p99 visibly
    late = [("m", T0 + 90_000, 200.0), ("m", T0 + 120_000, 210.0),
            ("m", T0 + 150_000, 220.0)]
    stream = _stream(spark, tmp_path, (rows, late))
    q = (
        streaming_histogram(
            stream, width=10.0, window_length="5 minutes", watermark="1 hour"
        )
        .writeStream.format("memory")
        .queryName("qrev_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    live = spark.table("qrev_out")

    from ticktock_spark.operators.summary import value_histogram

    batch = spark.createDataFrame(
        rows + late, "metric string, ts long, value double"
    ).withColumn("window_start", (F.col("ts") - F.col("ts") % 300_000))
    bhist = value_histogram(batch, ["metric", "window_start"], width=10.0)

    def reads(hist):
        return {
            (r["metric"], r["window_start"], r["q"]): (r["n"], r["est"])
            for r in histogram_quantiles(
                hist, [0.5, 0.99], width=10.0,
                group_cols=["metric", "window_start"],
            ).collect()
        }

    got = reads(live.select("metric", "window_start", "bin", "n"))
    want = reads(bhist)
    assert got == want  # bit-exact revision, late points included
    # and the late data actually moved window 0's p99 (sanity that the
    # assertion above is not vacuous)
    assert got[("m", T0, 0.99)][1] > 200.0
