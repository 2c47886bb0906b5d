"""Bucketing evidence for the 100 TB co-location story.

At cluster scale the repeated cost in the TSDB/query path is the shuffle
on the series (or user) key before every join/aggregation. Spark's
bucketed tables pre-hash rows into a fixed number of buckets at WRITE
time; a bucket-aligned join or aggregation then reads co-located data
and skips the exchange entirely. These tests pin that the plans we rely
on actually elide the Exchange when the storage layout provides it —
the same guarantee a 1000-executor job needs so that a daily
events ⋈ profile join (or per-user sessionization) doesn't reshuffle
100 TB every run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ticktock_spark.schema import load_table


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS users_bucketed")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"), "value"
    )
    (
        ev.write.mode("overwrite")
        .bucketBy(8, "user_id")
        .sortBy("user_id", "us")
        .option("path", str(wh / "ev"))
        .saveAsTable("ev_bucketed")
    )
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    (
        users.write.mode("overwrite")
        .bucketBy(8, "user_id")
        .option("path", str(wh / "users"))
        .saveAsTable("users_bucketed")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS users_bucketed")


def test_bucketed_join_elides_both_exchanges(bucketed):
    spark = bucketed
    # tiny test tables would otherwise broadcast (which bypasses bucketed
    # reads entirely); at real scale neither side broadcasts and the
    # sort-merge path below is exactly what runs
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("ev_bucketed").join(spark.table("users_bucketed"), "user_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_elides_exchange(bucketed):
    spark = bucketed
    agg = spark.table("ev_bucketed").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["user_id"]: r["n"] for r in agg.collect()}
    assert sum(got.values()) == 1000


def test_unbucketed_join_pays_exchanges(bucketed):
    """Control: the same join without bucketing shuffles at least one
    side — the cost bucketing removes."""
    spark = bucketed
    ev = spark.table("ev_bucketed").localCheckpoint()  # strip bucketing info
    users = spark.table("users_bucketed").localCheckpoint()
    plan = (
        ev.join(users.hint("merge"), "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in plan, plan
