"""SparkSession factory with scale-minded defaults.

Defaults chosen for the local[32] test harness but expressed so the same
config is correct on a 1000-executor cluster: AQE on (runtime re-plan,
skew-join handling, partition coalescing), modest advisory partition sizes,
Arrow enabled for the (rare) Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ticktock-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver-generated testdata parquet has used TIMESTAMP(NANOS)
        # (vectorized reader rejects it → read as long ns, normalized in
        # schema.load_table) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
        # (would infer as TIMESTAMP_NTZ → read as TIMESTAMP_LTZ instead so
        # unix_millis & friends apply; session tz UTC keeps the epoch value
        # identical to DuckDB's naive read)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # a query SERVER cycles through many distinct plans; the default
        # 100-entry generated-class cache thrashes once the working set
        # exceeds it, and every arrival then pays WholeStageCodegen
        # recompilation (measured: a 19-query round-robin doubled the
        # decimal-rollup queries, 0.37 s warm → 0.73 s evicted; static
        # conf, so it must be set at session build)
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
