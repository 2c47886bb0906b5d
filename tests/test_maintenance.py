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


def test_compact_partition_clusters_by_series(spark, tmp_path):
    """Clustered compaction rewrites the day partition sorted by
    (canonical series key, ts) — per-series contiguous, time-ordered, the
    Parquet twin of the reference's defragmented page layout."""
    path = str(tmp_path / "t")
    rows = []
    # interleave two series out of time order across appended files
    for b in range(3):
        for h in ("b", "a"):
            rows.append((f"put m {T0 + (5 - b) * 1000} {float(b)} host={h}",))
    for i in range(0, len(rows), 2):
        lines = spark.createDataFrame(rows[i : i + 2], "value string")
        dps = put_lines_to_datapoints(lines).withColumn(
            "dt", F.to_date(F.timestamp_millis(F.col("ts")))
        )
        dps.write.mode("append").partitionBy("dt").parquet(path)

    n = compact_partition(spark, path, "2024-01-01")
    assert n == 6
    got = spark.read.parquet(f"{path}/dt=2024-01-01").select(
        "metric", F.col("tags")["host"].alias("h"), "ts"
    )
    # file order (no sort in the read) must already be series-then-ts
    ordered = [tuple(r) for r in got.collect()]
    assert ordered == sorted(ordered), ordered
    # and the table still answers queries identically
    assert spark.read.parquet(path).filter("dt = '2024-01-01'").count() == 6


def test_compact_partition_recovers_from_post_swap_crash(spark, tmp_path):
    """Crash window after the swap completed but before cleanup: a stale
    .compact-old next to a valid partition must be dropped, not wedge
    every later compaction with ENOTEMPTY."""
    import shutil

    path = _write_table(spark, tmp_path)
    part = tmp_path / "t" / "dt=2024-01-02"
    # simulate the interrupted run: completed swap, leftover old copy
    shutil.copytree(part, part.with_name(part.name + ".compact-old"))
    n = compact_partition(spark, path, "2024-01-02")
    assert n == 3
    assert not part.with_name(part.name + ".compact-old").exists()
    assert spark.read.parquet(path).filter("dt = '2024-01-02'").count() == 3
