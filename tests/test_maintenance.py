"""Retention purge + compaction over a dt-partitioned datapoints table."""

from __future__ import annotations

import datetime as dt

from ticktock_spark.maintenance import (
    compact_partition,
    list_day_partitions,
    retention_purge,
)
from pyspark.sql import functions as F

from ticktock_spark.sources.parsers import put_lines_to_datapoints

DAY_MS = 86_400_000
T0 = 1_704_067_200_000  # 2024-01-01


def _write_table(spark, tmp_path, n_batches=3):
    # batch-managed dt-partitioned table; each loop iteration appends its
    # own files so partitions hold several small files (compaction fodder)
    path = str(tmp_path / "t")
    for b in range(n_batches):
        lines = spark.createDataFrame(
            [(f"put m {T0 + d * DAY_MS + b * 1000} {float(b)} host=a",) for d in range(3)],
            "value string",
        )
        dps = put_lines_to_datapoints(lines).withColumn(
            "dt", F.to_date(F.timestamp_millis(F.col("ts")))
        )
        dps.repartition(2).write.mode("append").partitionBy("dt").parquet(path)
    return path


def test_retention_purge(spark, tmp_path):
    path = _write_table(spark, tmp_path)
    assert list_day_partitions(path) == ["2024-01-01", "2024-01-02", "2024-01-03"]
    purged = retention_purge(path, keep_days=2, today=dt.date(2024, 1, 4))
    assert purged == ["2024-01-01"]
    assert list_day_partitions(path) == ["2024-01-02", "2024-01-03"]
    # remaining data still readable
    assert spark.read.parquet(path).count() == 6


def test_compact_partition(spark, tmp_path):
    path = _write_table(spark, tmp_path)
    part = f"{path}/dt=2024-01-02"
    import glob

    before = len(glob.glob(f"{part}/*.parquet"))
    n = compact_partition(spark, path, "2024-01-02")
    after = len(glob.glob(f"{part}/*.parquet"))
    assert n == 3 and after == 1 and before >= after
    # table intact after the swap
    got = spark.read.parquet(path)
    assert got.count() == 9
    assert got.filter("dt = '2024-01-02'").count() == 3
