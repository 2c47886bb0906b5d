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


def test_zorder_key_bit_interleave(spark):
    from pyspark.sql import functions as F

    from ticktock_spark.operators.zorder import scale_to_16bit, zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (65535, 65535), (0b1010, 0b0101)],
        "a long, b long",
    )
    got = [
        r["k"]
        for r in df.select(
            zorder_key(F.col("a"), F.col("b")).alias("k")
        ).collect()
    ]

    def interleave(a, b):
        k = 0
        for i in range(16):
            k |= ((a >> i) & 1) << (2 * i)
            k |= ((b >> i) & 1) << (2 * i + 1)
        return k

    want = [interleave(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (65535, 65535), (0b1010, 0b0101)]]
    assert got == want
    assert want[3] == (1 << 32) - 1  # full interleave saturates 32 bits

    # scaling clamps and hits the extremes
    s = spark.createDataFrame([(0,), (50,), (100,)], "v long").select(
        scale_to_16bit(F.col("v"), 0.0, 100.0).alias("s")
    )
    vals = [r["s"] for r in s.collect()]
    assert vals[0] == 0 and vals[2] == 65535 and 0 < vals[1] < 65535


def test_zorder_key_n_generalizes(spark):
    """zorder_key_n equals the 2-D mask-spread key bit-for-bit at
    (n=2, bits=16), and at n=3 matches a per-bit reference interleave;
    default widths keep the key positive (15 bits at n=4)."""
    from ticktock_spark.operators.zorder import zorder_key, zorder_key_n

    vals = [(0, 0, 0), (1, 2, 3), (65535, 0, 65535), (0b1010, 0b0101, 0b1111)]
    df = spark.createDataFrame(vals, "a long, b long, c long")
    two = df.select(
        zorder_key(F.col("a"), F.col("b")).alias("k2"),
        zorder_key_n([F.col("a"), F.col("b")]).alias("kn"),
    ).collect()
    assert all(r["k2"] == r["kn"] for r in two)

    def interleave(dims, bits, n):
        k = 0
        for d, v in enumerate(dims):
            for i in range(bits):
                k |= ((v >> i) & 1) << (i * n + d)
        return k

    three = [
        r["k"]
        for r in df.select(
            zorder_key_n([F.col("a"), F.col("b"), F.col("c")]).alias("k")
        ).collect()
    ]
    assert three == [interleave(v, 16, 3) for v in vals]
    four = df.select(
        zorder_key_n([F.col("a"), F.col("b"), F.col("c"), F.col("a")]).alias("k")
    ).collect()
    assert all(0 <= r["k"] < (1 << 60) for r in four)


def test_compact_partition_zorder_layout(spark, tmp_path):
    """zorder=True compaction rewrites the day partition ordered by the
    (series-hash, scaled-ts) Morton key — row content identical to the
    linear-cluster rewrite, file order monotone in the z-key."""
    from ticktock_spark.operators.zorder import scale_to_bits, zorder_key_n
    from ticktock_spark.schema import series_skey_col

    path = str(tmp_path / "t")
    rows = []
    for b in range(6):
        for h in ("b", "a", "c"):
            rows.append((f"put m {T0 + (17 * b % 7) * 1000} {float(b)} host={h}",))
    for i in range(0, len(rows), 3):
        lines = spark.createDataFrame(rows[i : i + 3], "value string")
        dps = put_lines_to_datapoints(lines).withColumn(
            "dt", F.to_date(F.timestamp_millis(F.col("ts")))
        )
        dps.write.mode("append").partitionBy("dt").parquet(path)
    before = spark.read.parquet(path).collect()

    n = compact_partition(spark, path, "2024-01-01", zorder=True)
    assert n == len(rows)
    after = spark.read.parquet(path)
    assert sorted(map(str, before)) == sorted(map(str, after.collect()))
    # physical order is monotone in the recomputed z-key
    lohi = after.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    keys = [
        r["k"]
        for r in spark.read.parquet(f"{path}/dt=2024-01-01")
        .select(
            zorder_key_n(
                [
                    F.xxhash64(series_skey_col()).bitwiseAND(F.lit(0xFFFF)),
                    scale_to_bits(F.col("ts"), float(lohi["lo"]), float(lohi["hi"])),
                ]
            ).alias("k")
        )
        .collect()
    ]
    assert keys == sorted(keys)


def test_compact_partition_zorder_empty_partition(spark, tmp_path):
    """zorder=True on an empty (but existing) day partition must not
    raise on the NULL ts min/max — it falls back to the linear path,
    which handles zero rows (compact_partition's empty-range guard)."""
    path = str(tmp_path / "t")
    lines = spark.createDataFrame(
        [(f"put m {T0} 1.0 host=a",)], "value string"
    )
    dps = put_lines_to_datapoints(lines)
    # a schema-only partition dir: zero rows, real parquet footer
    dps.limit(0).write.parquet(f"{path}/dt=2024-01-05")
    n = compact_partition(spark, path, "2024-01-05", zorder=True)
    assert n == 0
    assert spark.read.parquet(path).count() == 0
