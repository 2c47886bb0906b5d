"""Housekeeping dataflow ops (SURVEY §2.11).

Reference:
- retention purge: drop day partitions older than a threshold
  (`src/core/tsdb.cpp:3389-3429`, `tsdb.retention.threshold`).
- compaction: rewrite a partition compactly
  (`src/core/tsdb.cpp:3431-3658`) — in Spark this is rewriting a `dt`
  partition's many small files into few large ones (the reference's
  page-defragmentation has no other analogue; Parquet+ZSTD already
  stores columns compressed).

Both operate on a batch-managed dt-partitioned parquet `datapoints`
table. They are metadata-scale operations: purge touches only the file
listing; compaction reads and rewrites exactly one day partition, never
the whole table.

Caveat: a directory written by a Structured Streaming file sink carries a
`_spark_metadata` transaction log that pins the file listing — deleting
or rewriting files behind it breaks batch reads. Purge/compact such a
table only after migrating it to batch management
(:func:`adopt_streaming_table`, after a clean stream stop), or use a
table format with transactional DELETE/OPTIMIZE (Delta/Iceberg) where
these two operations are built in.
"""

from __future__ import annotations

import datetime as _dt
import shutil
from pathlib import Path

from pyspark.sql import SparkSession


def list_day_partitions(table_path: str) -> list[str]:
    """Sorted `dt=YYYY-MM-DD` partition values present in the table."""
    root = Path(table_path)
    return sorted(
        p.name.split("=", 1)[1]
        for p in root.iterdir()
        if p.is_dir() and p.name.startswith("dt=")
    )


def retention_purge(
    table_path: str,
    keep_days: int,
    today: _dt.date | None = None,
    spark: SparkSession | None = None,
) -> list[str]:
    """Remove day partitions older than ``keep_days`` (tsdb.cpp:3389-3429).

    Returns the purged partition values. Purely a partition-directory
    delete — no data scan, exactly like the reference removing whole Tsdb
    day directories.

    Pass ``spark`` to invalidate cached plans/listings for ``table_path``
    after the delete. Note the limit: refreshByPath refreshes *cached*
    plans only — an uncached DataFrame created before the purge still
    binds the old file listing and fails on its next action. Re-create
    such DataFrames after purging (TsdbStore.purge does this for the
    HTTP store's base).
    """
    today = today or _dt.date.today()
    cutoff = today - _dt.timedelta(days=keep_days)
    purged = []
    for dt_val in list_day_partitions(table_path):
        if _dt.date.fromisoformat(dt_val) < cutoff:
            shutil.rmtree(Path(table_path) / f"dt={dt_val}")
            purged.append(dt_val)
    if purged and spark is not None:
        spark.catalog.refreshByPath(table_path)
    return purged


def compact_partition(
    spark: SparkSession, table_path: str, dt_val: str, target_files: int = 1,
    cluster: bool = True, zorder: bool = False,
) -> int:
    """Rewrite one day partition into ``target_files`` files
    (tsdb.cpp:3431-3658). Returns the row count rewritten.

    Streaming ingest appends a file per micro-batch; compaction folds
    them so later scans open O(1) files per partition. The rewrite is
    scoped to the single partition directory (read → rewrite →
    atomic-ish swap), so cost is proportional to one day of data.

    With ``cluster`` (default), rows are range-partitioned and sorted by
    (canonical series key, ts) — the Parquet analogue of the reference's
    defragmentation, which rewrites each series' pages contiguously and
    time-ordered (`src/core/tsdb.cpp:3431-3658` walking per-series pages;
    in-order page layout `include/ts.h:91-94`). Clustering is what makes
    the layout scale-ready: row-group min/max stats on `metric`/`ts`
    become effective scan-skipping predicates, a series' points land in
    few row groups instead of every micro-batch file, and sorted
    metric/tag columns dictionary+RLE compress far better. ``cluster=False``
    keeps the plain coalesce for non-datapoints tables.

    ``zorder=True`` swaps the (series, ts) linear sort for a Morton key
    over (16-bit series-hash bucket, 16-bit min/max-scaled ts) —
    `operators/zorder.py` — so row-group stats prune on BOTH a
    series-equality predicate and a time-range predicate at once
    (measured in SCALE.md). The linear sort remains the default: it is
    strictly better when every query is series-first (the reference's
    access pattern); the Z-layout is for mixed series/time-sliced scans.
    """
    part_dir = Path(table_path) / f"dt={dt_val}"
    old = part_dir.with_name(part_dir.name + ".compact-old")
    if old.is_dir():
        if not part_dir.is_dir():
            # crash between the two renames — the data is intact in
            # .compact-old; restore it before proceeding
            old.rename(part_dir)
        else:
            # crash after the swap completed but before cleanup: part_dir
            # holds the full compacted copy, .compact-old is the stale
            # original — drop it or the rename below hits ENOTEMPTY
            shutil.rmtree(old)
    if not part_dir.is_dir():
        raise FileNotFoundError(part_dir)
    df = spark.read.parquet(str(part_dir))
    n = df.count()
    if cluster and {"metric", "tags", "ts"} <= set(df.columns):
        from ticktock_spark.schema import series_skey_col

        use_zorder = zorder
        if use_zorder:
            from pyspark.sql import functions as F

            from ticktock_spark.operators.zorder import (
                scale_to_bits,
                zorder_key_n,
            )

            # ts bounds are partition-scoped (one day): two driver
            # numbers, same discipline as the documents-side layout
            # driver-bound: two scalars (partition ts lo/hi)
            lohi = df.agg(
                F.min("ts").alias("lo"), F.max("ts").alias("hi")
            ).first()
            if n == 0 or lohi["lo"] is None:
                # empty (but existing) partition: no ts range to scale —
                # fall through to the linear path, which handles it
                use_zorder = False
            else:
                key = zorder_key_n(
                    [
                        F.xxhash64(series_skey_col()).bitwiseAND(
                            F.lit(0xFFFF)
                        ),
                        scale_to_bits(
                            F.col("ts"), float(lohi["lo"]), float(lohi["hi"])
                        ),
                    ]
                )
                df = (
                    df.withColumn("__zk", key)
                    .repartitionByRange(target_files, "__zk")
                    .sortWithinPartitions("__zk")
                    .drop("__zk")
                )
        if not use_zorder:
            df = (
                df.withColumn("__skey", series_skey_col())
                .repartitionByRange(target_files, "__skey", "ts")
                .sortWithinPartitions("__skey", "ts")
                .drop("__skey")
            )
    else:
        df = df.coalesce(target_files)
    tmp = part_dir.with_name(part_dir.name + ".compact-tmp")
    df.write.mode("overwrite").parquet(str(tmp))
    # drop _SUCCESS etc. markers; keep only parquet parts
    for extra in tmp.iterdir():
        if not extra.name.endswith(".parquet") and extra.name != "_SUCCESS":
            extra.unlink()
    part_dir.rename(old)
    tmp.rename(part_dir)
    shutil.rmtree(old)
    # invalidate cached plans/listings for the table. Cached-only: a
    # pre-existing UNCACHED DataFrame still binds the vanished file names
    # and must be re-created by its owner (the HTTP store re-points base)
    spark.catalog.refreshByPath(table_path)
    return n


def adopt_streaming_table(spark: SparkSession, table_path: str) -> bool:
    """Migrate a Structured-Streaming file-sink table to batch management
    by dropping the sink's ``_spark_metadata`` transaction log, so the
    file listing comes from the directory again and
    :func:`retention_purge` / :func:`compact_partition` become safe.

    One-way, and only valid after the writing stream has STOPPED cleanly:
    while the log exists, batch reads trust it and ignore files from
    uncommitted batches — dropping it makes every file in the directory
    visible, so an unclean stop could resurrect a half-written batch
    (restart the stream once more with availableNow to drain + commit
    before adopting). A restarted stream must write to a fresh directory;
    this table is batch-owned from here on. Returns whether a sink log
    was present.
    """
    md = Path(table_path) / "_spark_metadata"
    existed = md.is_dir()
    if existed:
        shutil.rmtree(md)
        spark.catalog.refreshByPath(table_path)
    return existed


def source_fingerprint(path: str) -> str:
    """Content key for a parquet source (file OR Spark-written directory):
    md5 over the sorted (relative-name, size, mtime_ns) of its data files.
    Used to key derived-table caches (:func:`persisted_rollup_1h`) so a
    regenerated source (same path, new content — e.g. a reseeded fuzz
    dir) never serves a stale derivation."""
    import hashlib
    import os

    p = Path(path)
    parts: list[str] = []
    files = sorted(p.rglob("*.parquet")) if p.is_dir() else [p]
    for f in files:
        st = f.stat()
        parts.append(f"{f.name}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5(";".join(parts).encode()).hexdigest()[:16]


def persisted_rollup_1h(
    spark: SparkSession,
    dps,
    cache_key: str,
    base_dir: str = "/tmp/ticktock_rollup_cache",
):
    """Materialize the hourly rollup of ``dps`` as a day-partitioned
    parquet table (once per ``cache_key``) and return a DataFrame READING
    that table — the production shape of §2.8 rollup routing.

    The reference accumulates rollups at ingest time and stores them as
    their own files (`src/agg/rollup.cpp:199-276`); a routed query reads
    rollup storage, never the raw points. The in-memory
    ``TsdbContext.materialize_rollups()`` twin derives the rollup lazily
    from the raw DataFrame, which is correct but makes a routed plan
    still SCAN the raw source. This persisted form is what a 100 TB
    deployment runs: the routed plan's only file scan is the (3-4 orders
    smaller) rollup table, and the fallback splice's day filters become
    partition pruning on its ``dt`` partition column.

    Build is atomic (write to a tmp dir, rename into place): concurrent
    builders race benignly — the loser discards its build. Content is
    exactly ``materialize_rollups``'s rollup_1h plus the ``dt`` partition
    column derived from bucket_ts (an hourly bucket never crosses a day
    boundary, so dt identifies the day partition that produced it).
    """
    import os

    from pyspark.sql import functions as F

    from ticktock_spark.plans.planner import TsdbContext

    path = Path(base_dir) / cache_key / "rollup_1h"
    if not path.is_dir():
        ctx = TsdbContext(dps)
        ctx.materialize_rollups()
        tmp = Path(f"{path}.build-{os.getpid()}")
        (
            ctx.rollup_1h.withColumn(
                "dt", F.to_date(F.timestamp_millis(F.col("bucket_ts")))
            )
            .write.partitionBy("dt")
            .mode("overwrite")
            .parquet(str(tmp))
        )
        try:
            tmp.rename(path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the publish race
    return spark.read.parquet(str(path))
