"""Query catalog: one entry per operator class from SURVEY.md §2, each with
a DuckDB oracle-SQL twin.

Every pair is written to be *bit-identical* across Spark and DuckDB:

- accumulations over raw 2-decimal values go through exact DECIMAL sums,
  cast to DOUBLE only at the end;
- derived floats (avg, stddev, rate) are canonicalized with
  ``floor(x*1e6 + 0.5)/1e6`` — plain double ops that both engines evaluate
  identically (unlike ``round()``, whose half-even/BigDecimal behavior
  differs between engines);
- order-dependent picks (first/last/dedup) use a scalar composite key
  ``ts*100000 + seq`` so arg_max/max_by are deterministic.

The TSDB queries treat the driver's `events` table as the canonical
datapoint stream: metric=event_type, series key=user_id, seq=event_id
(see sources/events.py). Time constants cover the generated span
(2024-01-01 .. 2024-01-31 UTC).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ticktock_spark.operators import (
    aggregate_across_series,
    build_rollup,
    dedup_last_wins,
    downsample,
    fill_buckets,
    rate,
    top_bottom_n,
)
from ticktock_spark.operators.rollup import (
    downsample_from_rollup,
    rollup_daily_from_hourly,
    rollup_monthly_from_daily,
)
from ticktock_spark.pipeline.util import spread_scan
from ticktock_spark.schema import load_table

# --- time constants (UTC, epoch ms) ---
T0 = 1704067200000          # 2024-01-01
T_MID = 1705276800000       # 2024-01-15
T_END = 1706745600000       # 2024-02-01
FILL_START = 1704153600000  # 2024-01-02
FILL_END = 1704240000000    # 2024-01-03

MIN_MS, HOUR_MS, DAY_MS = 60_000, 3_600_000, 86_400_000

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# Bench-only workloads: measured by bench.py but deliberately NOT in the
# driver-verified registry (no DuckDB-expressible oracle AND their
# exactness is pinned elsewhere — see each entry's docstring).
BENCH_ONLY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def q6(c) -> F.Column:
    """Engine-neutral 6-decimal canonicalization (see module docstring)."""
    return F.floor(c * F.lit(1_000_000.0) + F.lit(0.5)) / F.lit(1_000_000.0)


_Q6 = "floor({x} * 1000000.0 + 0.5) / 1000000.0"


def _dps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → canonical datapoints with a bigint user_id series column."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_type").alias("metric"),
        F.unix_millis("ts").alias("ts"),
        F.col("value").cast("double").alias("value"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("seq"),
    )


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return load_table(spark, sf_dir, name)


_EV = "(SELECT event_type AS metric, epoch_ms(ts) AS ts, value, user_id, event_id AS seq FROM events)"


# ---------------------------------------------------------------------------
# §2.3 scans / predicates
# ---------------------------------------------------------------------------

@register(
    "q01_scan_tag_filter",
    f"""
    SELECT metric, ts, user_id, value
    FROM {_EV}
    WHERE metric = 'click' AND ts BETWEEN {T0} AND {T_MID}
      AND user_id IN (1, 2, 3)
    """,
)
def q01(spark, sf_dir):
    """Raw scan + time-range + tag literal_or filter (tsdb.cpp:2259-2322,
    tag.cpp:718-726). Pushdown: metric + ts predicates reach parquet."""
    d = _dps(spark, sf_dir)
    return d.filter(
        (F.col("metric") == "click")
        & F.col("ts").between(T0, T_MID)
        & F.col("user_id").isin(1, 2, 3)
    ).select("metric", "ts", "user_id", "value")


# ---------------------------------------------------------------------------
# §2.5 downsampling
# ---------------------------------------------------------------------------

@register(
    "q02_downsample_avg_1m",
    f"""
    SELECT metric, user_id, ts - ts % {MIN_MS} AS ts,
           {_Q6.format(x='avg(value)')} AS avg_value
    FROM {_EV} WHERE metric = 'click'
    GROUP BY 1, 2, 3
    """,
)
def q02(spark, sf_dir):
    """1m-avg downsample per series (down.cpp:314-383)."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "click")
    ds = downsample(d, ["metric", "user_id"], MIN_MS, "avg")
    return ds.select("metric", "user_id", "ts", q6(F.col("value")).alias("avg_value"))


@register(
    "q03_downsample_sum_5m",
    f"""
    SELECT metric, user_id, ts - ts % {5 * MIN_MS} AS ts,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM {_EV} WHERE metric = 'purchase'
    GROUP BY 1, 2, 3
    """,
)
def q03(spark, sf_dir):
    """5m-sum downsample (down.cpp:658-699); exact decimal accumulation."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "purchase")
    d = d.withColumn("value", F.col("value").cast("decimal(18,2)"))
    ds = downsample(d, ["metric", "user_id"], 5 * MIN_MS, "sum")
    return ds.select("metric", "user_id", "ts", F.col("value").cast("double").alias("sum_value"))


@register(
    "q04_downsample_min_max_count_1h",
    f"""
    SELECT metric, user_id, ts - ts % {HOUR_MS} AS ts,
           min(value) AS min_value, max(value) AS max_value,
           count(value) AS cnt
    FROM {_EV} WHERE metric = 'view'
    GROUP BY 1, 2, 3
    """,
)
def q04(spark, sf_dir):
    """1h min/max/count downsamplers (down.cpp:386-427,510-595)."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "view")
    from ticktock_spark.operators.downsample import bucket_expr

    return d.groupBy("metric", "user_id", bucket_expr("ts", HOUR_MS).alias("ts")).agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count("value").alias("cnt"),
    )


@register(
    "q05_downsample_p95_10m",
    f"""
    WITH b AS (
      SELECT metric, user_id, ts - ts % {10 * MIN_MS} AS ts,
             list_sort(list(value)) AS vals
      FROM {_EV} WHERE metric = 'view'
      GROUP BY 1, 2, 3
    )
    SELECT metric, user_id, ts,
      CASE WHEN len(vals) = 1 THEN vals[1]
           WHEN 0.95 * (len(vals) + 1) < 1 THEN vals[1]
           WHEN 0.95 * (len(vals) + 1) >= len(vals) THEN vals[len(vals)]
           ELSE vals[CAST(floor(0.95 * (len(vals) + 1)) AS INT)]
                + (0.95 * (len(vals) + 1) - floor(0.95 * (len(vals) + 1)))
                  * (vals[CAST(floor(0.95 * (len(vals) + 1)) AS INT) + 1]
                     - vals[CAST(floor(0.95 * (len(vals) + 1)) AS INT)])
      END AS p95_value
    FROM b
    """,
)
def q05(spark, sf_dir):
    """10m-p95 downsample with OpenTSDB's R-6 index rule idx=q*(n+1)
    (down.cpp:598-655, aggregate.cpp:341-387)."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "view")
    ds = downsample(d, ["metric", "user_id"], 10 * MIN_MS, "p95")
    return ds.select("metric", "user_id", "ts", F.col("value").alias("p95_value"))


@register(
    "q17_downsample_dev_10m",
    f"""
    SELECT metric, user_id, ts - ts % {10 * MIN_MS} AS ts,
           {_Q6.format(x='coalesce(stddev_pop(value), 0.0)')} AS dev_value
    FROM {_EV} WHERE metric = 'purchase'
    GROUP BY 1, 2, 3
    """,
)
def q17(spark, sf_dir):
    """10m-dev downsample = population stddev (down.cpp:430-468,151-155)."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "purchase")
    ds = downsample(d, ["metric", "user_id"], 10 * MIN_MS, "dev")
    return ds.select("metric", "user_id", "ts", q6(F.col("value")).alias("dev_value"))


@register(
    "q18_downsample_first_last_1h",
    f"""
    SELECT metric, user_id, ts - ts % {HOUR_MS} AS ts,
           arg_min(value, ts * 100000 + seq) AS first_value,
           arg_max(value, ts * 100000 + seq) AS last_value
    FROM {_EV} WHERE metric = 'error'
    GROUP BY 1, 2, 3
    """,
)
def q18(spark, sf_dir):
    """1h first/last downsamplers, timestamp-ordered with seq tiebreak
    (down.cpp:471-507)."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "error")
    from ticktock_spark.operators.downsample import bucket_expr

    key = F.col("ts") * 100000 + F.col("seq")
    return d.groupBy("metric", "user_id", bucket_expr("ts", HOUR_MS).alias("ts")).agg(
        F.min_by("value", key).alias("first_value"),
        F.max_by("value", key).alias("last_value"),
    )


@register(
    "q16_0all_first_last",
    f"""
    SELECT metric, user_id,
           arg_min(value, ts * 100000 + seq) AS first_value,
           arg_max(value, ts * 100000 + seq) AS last_value,
           count(*) AS cnt
    FROM {_EV}
    GROUP BY 1, 2
    """,
)
def q16(spark, sf_dir):
    """0all downsample: whole range = one bucket (down.cpp:82,96-99;
    query_test.cpp:216-226 pins 0all-last/0all-avg)."""
    d = _dps(spark, sf_dir)
    key = F.col("ts") * 100000 + F.col("seq")
    return d.groupBy("metric", "user_id").agg(
        F.min_by("value", key).alias("first_value"),
        F.max_by("value", key).alias("last_value"),
        F.count(F.lit(1)).alias("cnt"),
    )


# ---------------------------------------------------------------------------
# §2.6 aggregation across series
# ---------------------------------------------------------------------------

@register(
    "q06_agg_sum_of_avg_1m",
    f"""
    WITH ds AS (
      SELECT metric, user_id, ts - ts % {MIN_MS} AS ts,
             floor(avg(value) * 1000000.0 + 0.5) AS scaled_avg
      FROM {_EV} WHERE metric = 'click'
      GROUP BY 1, 2, 3
    )
    SELECT metric, ts, sum(scaled_avg) / 1000000.0 AS sum_value,
           count(*) AS n_series
    FROM ds GROUP BY 1, 2
    """,
)
def q06(spark, sf_dir):
    """m=sum:1m-avg:click — per-series downsample then exact-timestamp
    cross-series sum (aggregate.cpp:140-215; no interpolation)."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "click")
    ds = downsample(d, ["metric", "user_id"], MIN_MS, "avg")
    scaled = ds.withColumn("value", F.floor(F.col("value") * 1_000_000.0 + F.lit(0.5)))
    out = scaled.groupBy("metric", "ts").agg(
        (F.sum("value") / F.lit(1_000_000.0)).alias("sum_value"),
        F.count(F.lit(1)).alias("n_series"),
    )
    return out


@register(
    "q19_agg_dev_p50_1h",
    f"""
    WITH ds AS (
      SELECT metric, user_id, ts - ts % {HOUR_MS} AS ts,
             {_Q6.format(x='avg(value)')} AS value
      FROM {_EV} WHERE metric = 'view'
      GROUP BY 1, 2, 3
    ), srt AS (
      SELECT metric, ts, list_sort(list(value)) AS vals,
             coalesce(stddev_samp(value), 0.0) AS sdev
      FROM ds GROUP BY 1, 2
    )
    SELECT metric, ts, {_Q6.format(x='sdev')} AS dev_value,
      {_Q6.format(x='''CASE WHEN len(vals) = 1 THEN vals[1]
           WHEN 0.50 * (len(vals) + 1) < 1 THEN vals[1]
           WHEN 0.50 * (len(vals) + 1) >= len(vals) THEN vals[len(vals)]
           ELSE vals[CAST(floor(0.50 * (len(vals) + 1)) AS INT)]
                + (0.50 * (len(vals) + 1) - floor(0.50 * (len(vals) + 1)))
                  * (vals[CAST(floor(0.50 * (len(vals) + 1)) AS INT) + 1]
                     - vals[CAST(floor(0.50 * (len(vals) + 1)) AS INT)])
      END''')} AS p50_value
    FROM srt
    """,
)
def q19(spark, sf_dir):
    """Cross-series dev (SAMPLE stddev, aggregate.cpp:263-294) and p50
    aggregators over 1h-avg downsampled series. Both aggregators evaluate
    in ONE hash aggregation over the shared downsample — a join of two
    separately-aggregated branches would recompute the scan+downsample
    twice."""
    from ticktock_spark.operators.aggregate import aggregator_expr

    d = _dps(spark, sf_dir).filter(F.col("metric") == "view")
    ds = downsample(d, ["metric", "user_id"], HOUR_MS, "avg")
    ds = ds.withColumn("value", q6(F.col("value")))
    return ds.groupBy("metric", "ts").agg(
        q6(aggregator_expr("dev")).alias("dev_value"),
        q6(aggregator_expr("p50")).alias("p50_value"),
    )


# ---------------------------------------------------------------------------
# §2.7 rate
# ---------------------------------------------------------------------------

_RATE_CTE = f"""
      SELECT metric, user_id, ts, value,
             lag(value) OVER (PARTITION BY metric, user_id ORDER BY ts) AS pv,
             lag(ts) OVER (PARTITION BY metric, user_id ORDER BY ts) AS pt
      FROM {_EV} WHERE metric = 'error'
"""


@register(
    "q07_rate",
    f"""
    WITH w AS ({_RATE_CTE})
    SELECT metric, user_id, ts,
           (value - pv) / ((ts - pt) / 1000.0) AS rate_value
    FROM w WHERE pt IS NOT NULL
    """,
)
def q07(spark, sf_dir):
    """Plain rate: (v1-v0)/Δt_sec at t1, first point dropped
    (rate.cpp:38-92)."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "error")
    r = rate(d, ["metric", "user_id"])
    return r.select("metric", "user_id", "ts", F.col("value").alias("rate_value"))


@register(
    "q08_rate_counter",
    f"""
    WITH w AS ({_RATE_CTE})
    SELECT metric, user_id, ts,
           CASE WHEN value - pv < 0
                THEN CASE WHEN (500.0 - pv + value) / ((ts - pt) / 1000.0) > 100.0
                          THEN 0.0
                          ELSE (500.0 - pv + value) / ((ts - pt) / 1000.0) END
                ELSE (value - pv) / ((ts - pt) / 1000.0) END AS rate_value
    FROM w WHERE pt IS NOT NULL
    """,
)
def q08(spark, sf_dir):
    """Counter rate with wrap (counterMax=500) and resetValue=100
    (rate.cpp:60-77)."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "error")
    r = rate(d, ["metric", "user_id"], counter=True, counter_max=500, reset_value=100)
    return r.select("metric", "user_id", "ts", F.col("value").alias("rate_value"))


@register(
    "q09_rate_drop_resets",
    f"""
    WITH w AS ({_RATE_CTE})
    SELECT metric, user_id, ts,
           (value - pv) / ((ts - pt) / 1000.0) AS rate_value
    FROM w WHERE pt IS NOT NULL AND value - pv >= 0
    """,
)
def q09(spark, sf_dir):
    """dropResets: decreases dropped but prev still advances
    (rate.cpp:60-62, the goto cont path)."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "error")
    r = rate(d, ["metric", "user_id"], counter=True, drop_resets=True)
    return r.select("metric", "user_id", "ts", F.col("value").alias("rate_value"))


# ---------------------------------------------------------------------------
# §2.6 top/bottom-N series
# ---------------------------------------------------------------------------

@register(
    "q10_top3_series",
    f"""
    WITH ds AS (
      SELECT user_id, ts - ts % {HOUR_MS} AS ts,
             {_Q6.format(x='avg(value)')} AS value
      FROM {_EV} WHERE metric = 'click'
      GROUP BY 1, 2
    ), tail AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
      FROM ds
    ), keys AS (
      SELECT user_id, max(value) AS rank_key FROM tail WHERE rn <= 3 GROUP BY 1
    ), chosen AS (
      SELECT user_id FROM keys ORDER BY rank_key DESC, user_id LIMIT 3
    )
    SELECT ds.user_id, ds.ts, ds.value
    FROM ds JOIN chosen USING (user_id)
    """,
)
def q10(spark, sf_dir):
    """top3: keep 3 whole series ranked by max of the LAST 3 downsampled
    points (aggregate.cpp:236-260, query.cpp:858-884)."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "click")
    ds = downsample(d, ["user_id"], HOUR_MS, "avg")
    ds = ds.withColumn("value", q6(F.col("value")))
    return top_bottom_n(ds, ["user_id"], 3, "top").select("user_id", "ts", "value")


# ---------------------------------------------------------------------------
# §2.5 fill
# ---------------------------------------------------------------------------

@register(
    "q11_fill_zero_1h",
    f"""
    WITH d AS (
      SELECT user_id, ts, value FROM {_EV}
      WHERE metric = 'signup' AND ts BETWEEN {FILL_START} AND {FILL_END}
    ), ds AS (
      SELECT user_id, ts - ts % {HOUR_MS} AS ts,
             {_Q6.format(x='avg(value)')} AS value
      FROM d GROUP BY 1, 2
    ), spine AS (
      SELECT u.user_id, g.ts
      FROM (SELECT DISTINCT user_id FROM d) u
      CROSS JOIN (SELECT unnest(generate_series({FILL_START}, {FILL_END}, {HOUR_MS})) AS ts) g
    )
    SELECT s.user_id, s.ts, coalesce(ds.value, 0.0) AS value
    FROM spine s LEFT JOIN ds ON s.user_id = ds.user_id AND s.ts = ds.ts
    """,
)
def q11(spark, sf_dir):
    """1h-avg-zero fill: complete bucket spine with 0.0 in gaps
    (down.cpp:107-127,248-311)."""
    d = _dps(spark, sf_dir).filter(
        (F.col("metric") == "signup") & F.col("ts").between(FILL_START, FILL_END)
    )
    ds = downsample(d, ["user_id"], HOUR_MS, "avg")
    ds = ds.withColumn("value", q6(F.col("value")))
    return fill_buckets(ds, ["user_id"], HOUR_MS, FILL_START, FILL_END, "zero").select(
        "user_id", "ts", "value"
    )


# ---------------------------------------------------------------------------
# §2.8 rollup
# ---------------------------------------------------------------------------

@register(
    "q12_rollup_1h",
    f"""
    SELECT metric, user_id, ts - ts % {HOUR_MS} AS bucket_ts,
           count(value) AS cnt, min(value) AS min_value, max(value) AS max_value,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM {_EV}
    GROUP BY 1, 2, 3
    """,
)
def q12(spark, sf_dir):
    """Hourly rollup build: per-series (cnt,min,max,sum) per 1h bucket
    (rollup.cpp:199-276)."""
    d = _dps(spark, sf_dir).withColumn("value", F.col("value").cast("decimal(18,2)"))
    r = build_rollup(d, ["metric", "user_id"])
    return r.select(
        "metric",
        "user_id",
        "bucket_ts",
        "cnt",
        F.col("min").cast("double").alias("min_value"),
        F.col("max").cast("double").alias("max_value"),
        F.col("sum").cast("double").alias("sum_value"),
    )


@register(
    "q13_rollup_daily_avg",
    f"""
    WITH r1h AS (
      SELECT metric, user_id, ts - ts % {HOUR_MS} AS bucket_ts,
             count(value) AS cnt,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM {_EV}
      GROUP BY 1, 2, 3
    )
    SELECT metric, user_id, bucket_ts - bucket_ts % {DAY_MS} AS ts,
           {_Q6.format(x='sum(sum_value) / sum(cnt)')} AS avg_value
    FROM r1h GROUP BY 1, 2, 3
    """,
)
def q13(spark, sf_dir):
    """1d-avg answered FROM the hourly rollup: avg = Σsum/Σcnt re-agg
    (query.cpp:1032-1091, rollup.cpp:288-325)."""
    d = _dps(spark, sf_dir).withColumn("value", F.col("value").cast("decimal(18,2)"))
    r1h = build_rollup(d, ["metric", "user_id"]).withColumn(
        "sum", F.col("sum").cast("double")
    )
    daily = downsample_from_rollup(r1h, ["metric", "user_id"], DAY_MS, "avg")
    return daily.select("metric", "user_id", "ts", q6(F.col("value")).alias("avg_value"))


@register(
    "q57_rollup_monthly",
    f"""
    WITH r1h AS (
      SELECT metric, user_id, ts - ts % {HOUR_MS} AS bucket_ts,
             count(value) AS cnt, min(value) AS mn, max(value) AS mx,
             sum(CAST(value AS DECIMAL(18,2))) AS s
      FROM {_EV}
      GROUP BY 1, 2, 3
    ),
    r1d AS (
      SELECT metric, user_id, bucket_ts - bucket_ts % {DAY_MS} AS bucket_ts,
             CAST(sum(cnt) AS BIGINT) AS cnt, min(mn) AS mn, max(mx) AS mx,
             sum(s) AS s
      FROM r1h GROUP BY 1, 2, 3
    )
    SELECT metric, user_id,
           epoch_ms(date_trunc('month', make_timestamp(bucket_ts * 1000)))
             AS bucket_ts,
           CAST(sum(cnt) AS BIGINT) AS cnt, min(mn) AS min_value,
           max(mx) AS max_value,
           CAST(sum(s) AS DOUBLE) AS sum_value
    FROM r1d GROUP BY 1, 2, 3
    """,
)
def q57(spark, sf_dir):
    """Calendar-month rollup derived hourly → daily → monthly by
    associative re-aggregation with TRUE month boundaries (date_trunc,
    not fixed 30d — src/utils/cal.cpp month files). Decimal-exact sums
    end to end."""
    d = _dps(spark, sf_dir).withColumn("value", F.col("value").cast("decimal(18,2)"))
    r1h = build_rollup(d, ["metric", "user_id"])
    r1d = rollup_daily_from_hourly(r1h, ["metric", "user_id"])
    r1m = rollup_monthly_from_daily(r1d, ["metric", "user_id"])
    return r1m.select(
        "metric",
        "user_id",
        "bucket_ts",
        "cnt",
        F.col("min").cast("double").alias("min_value"),
        F.col("max").cast("double").alias("max_value"),
        F.col("sum").cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# §1.3 duplicate semantics
# ---------------------------------------------------------------------------

@register(
    "q14_dedup_last_wins",
    f"""
    WITH dd AS (
      SELECT metric, user_id, ts, arg_max(value, seq) AS value
      FROM {_EV}
      GROUP BY 1, 2, 3
    )
    SELECT metric, count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM dd GROUP BY 1
    """,
)
def q14(spark, sf_dir):
    """Duplicate timestamps: last (highest ingest seq) wins
    (query.cpp:722-803; int_test3.py:1608-1652)."""
    d = _dps(spark, sf_dir)
    dd = dedup_last_wins(d, ["metric", "user_id"])
    dd = dd.withColumn("value", F.col("value").cast("decimal(18,2)"))
    return dd.groupBy("metric").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("value").cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# §2.3 tag-filter matrix over a real MAP<STRING,STRING> tags column
# ---------------------------------------------------------------------------

# Derived tag set: user=u<user_id>, host=h<user_id%10>, k=val<props.k>.
_TAGS_CTE = f"""
      SELECT event_type AS metric, epoch_ms(ts) AS ts, value, event_id AS seq,
             'u' || CAST(user_id AS VARCHAR) AS tag_user,
             'h' || CAST(user_id % 10 AS VARCHAR) AS tag_host,
             'val' || regexp_extract(props, '([0-9]+)', 1) AS tag_k
      FROM events
"""


def _tagged_dps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → canonical datapoints with a tags MAP<STRING,STRING> column
    (the reference's native data model, SURVEY §1.1)."""
    ev = _table(spark, sf_dir, "events")
    tags = F.create_map(
        F.lit("user"), F.concat(F.lit("u"), F.col("user_id").cast("string")),
        F.lit("host"), F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string")),
        F.lit("k"), F.concat(F.lit("val"), F.regexp_extract("props", r"([0-9]+)", 1)),
    )
    return ev.select(
        F.col("event_type").alias("metric"),
        F.unix_millis("ts").alias("ts"),
        F.col("value").cast("double").alias("value"),
        F.col("event_id").cast("long").alias("seq"),
        tags.alias("tags"),
    )


@register(
    "q22_tag_filter_matrix",
    f"""
    WITH t AS ({_TAGS_CTE})
    SELECT metric, tag_user, count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM t
    WHERE regexp_matches(tag_user, '(?i)^(?:U1.*)$')
      AND regexp_matches(tag_host, '^(?:h[0-4])$')
      AND NOT regexp_matches(tag_k, '^(?:val1|val2|val3)$')
    GROUP BY 1, 2
    """,
)
def q22(spark, sf_dir):
    """Tag-filter matrix on the MAP tags column: iwildcard + regexp +
    not_literal_or + explicit_tags conjunction, compiled to pushdown-able
    Column predicates (tag.cpp:692-796,853-873; tsdb.cpp:736-737)."""
    from ticktock_spark.plans.tagfilter import compile_tag_filters

    d = _tagged_dps(spark, sf_dir)
    pred = compile_tag_filters(
        F.col("tags"),
        {
            "user": "iwildcard(U1*)",
            "host": "regexp(h[0-4])",
            "k": "not_literal_or(val1|val2|val3)",
        },
        explicit_tags=True,  # series has exactly 3 tags — matches all here
    )
    return (
        d.filter(pred)
        .withColumn("value", F.col("value").cast("decimal(18,2)"))
        .groupBy("metric", F.col("tags")["user"].alias("tag_user"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").cast("double").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# §2.6 / §2.9 grouping-tag resolution + aggregateTags
# ---------------------------------------------------------------------------

@register(
    "q23_aggregate_tags",
    f"""
    WITH t AS ({_TAGS_CTE}),
    ds AS (
      SELECT metric, tag_user, tag_k, ts - ts % {HOUR_MS} AS ts,
             floor(avg(value) * 1000000.0 + 0.5) AS scaled_avg
      FROM t WHERE metric = 'view'
      GROUP BY 1, 2, 3, 4
    ),
    ser AS (SELECT DISTINCT metric, tag_user, tag_k FROM ds),
    ag AS (
      SELECT metric, tag_k,
             CASE WHEN count(DISTINCT tag_user) > 1 THEN 'user' ELSE '' END
               AS agg_tags
      FROM ser GROUP BY 1, 2
    )
    SELECT d.metric, d.tag_k, d.ts,
           sum(d.scaled_avg) / 1000000.0 AS sum_value,
           a.agg_tags
    FROM ds d JOIN ag a ON d.metric = a.metric AND d.tag_k = a.tag_k
    GROUP BY 1, 2, 3, 5
    """,
)
def q23(spark, sf_dir):
    """m=sum:1h-avg:view{k=*} — group on tag k; user varies within each
    group so it lands in aggregateTags (query.cpp:505-554,1683-1738).
    aggregateTags computed from the series dimension (tiny — broadcast
    joined back), never from the datapoint stream. At 100 TB the series
    dimension is a standing table maintained at ingest (SURVEY §1.1), not
    re-derived per query; here it's derived inline from a column-pruned
    scan + map-side-combinable distinct."""
    from ticktock_spark.operators.aggregate import aggregate_tags

    d = _tagged_dps(spark, sf_dir).filter(F.col("metric") == "view")
    d = d.select(
        "metric", "ts", "value",
        F.col("tags")["user"].alias("tag_user"),
        F.col("tags")["k"].alias("tag_k"),
        "tags",
    )
    ds = downsample(d, ["metric", "tag_user", "tag_k"], HOUR_MS, "avg")
    scaled = ds.withColumn("value", F.floor(F.col("value") * 1_000_000.0 + F.lit(0.5)))
    out = scaled.groupBy("metric", "tag_k", "ts").agg(
        (F.sum("value") / F.lit(1_000_000.0)).alias("sum_value")
    )
    series = d.select("metric", "tag_user", "tag_k").distinct().select(
        "metric",
        "tag_k",
        F.create_map(F.lit("user"), F.col("tag_user")).alias("tags"),
    )
    ag = aggregate_tags(series, "tags", ["metric", "tag_k"]).select(
        "metric", "tag_k", F.concat_ws(",", "aggregateTags").alias("agg_tags")
    )
    return out.join(F.broadcast(ag), ["metric", "tag_k"]).select(
        "metric", "tag_k", "ts", "sum_value", "agg_tags"
    )


# ---------------------------------------------------------------------------
# §2.5 fill (null policy) + §2.9 second-resolution output
# ---------------------------------------------------------------------------

@register(
    "q24_fill_null_sec",
    f"""
    WITH d AS (
      SELECT user_id, ts, value FROM {_EV}
      WHERE metric = 'signup' AND ts BETWEEN {FILL_START} AND {FILL_END}
    ), ds AS (
      SELECT user_id, ts - ts % {HOUR_MS} AS ts,
             {_Q6.format(x='avg(value)')} AS value
      FROM d GROUP BY 1, 2
    ), spine AS (
      SELECT u.user_id, g.ts
      FROM (SELECT DISTINCT user_id FROM d) u
      CROSS JOIN (SELECT unnest(generate_series({FILL_START}, {FILL_END}, {HOUR_MS})) AS ts) g
    )
    SELECT s.user_id, s.ts // 1000 AS ts_sec, ds.value AS value
    FROM spine s LEFT JOIN ds ON s.user_id = ds.user_id AND s.ts = ds.ts
    """,
)
def q24(spark, sf_dir):
    """1h-avg-null fill (gaps stay NULL, down.cpp:107-127) with
    second-resolution output timestamps (msResolution=false →
    ts/1000, query.cpp:665-677,1281-1284)."""
    d = _dps(spark, sf_dir).filter(
        (F.col("metric") == "signup") & F.col("ts").between(FILL_START, FILL_END)
    )
    ds = downsample(d, ["user_id"], HOUR_MS, "avg")
    ds = ds.withColumn("value", q6(F.col("value")))
    filled = fill_buckets(ds, ["user_id"], HOUR_MS, FILL_START, FILL_END, "null")
    return filled.select(
        "user_id", (F.col("ts") / 1000).cast("long").alias("ts_sec"), "value"
    )


# ---------------------------------------------------------------------------
# §2.6 bottom-N series
# ---------------------------------------------------------------------------

@register(
    "q25_bottom3_series",
    f"""
    WITH ds AS (
      SELECT user_id, ts - ts % {HOUR_MS} AS ts,
             {_Q6.format(x='avg(value)')} AS value
      FROM {_EV} WHERE metric = 'view'
      GROUP BY 1, 2
    ), tail AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
      FROM ds
    ), keys AS (
      SELECT user_id, min(value) AS rank_key FROM tail WHERE rn <= 3 GROUP BY 1
    ), chosen AS (
      SELECT user_id FROM keys ORDER BY rank_key ASC, user_id LIMIT 3
    )
    SELECT ds.user_id, ds.ts, ds.value
    FROM ds JOIN chosen USING (user_id)
    """,
)
def q25(spark, sf_dir):
    """bottom3: keep 3 whole series ranked by MIN of the last 3
    downsampled points (aggregate.cpp:390-414, query.cpp:858-884)."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "view")
    ds = downsample(d, ["user_id"], HOUR_MS, "avg")
    ds = ds.withColumn("value", q6(F.col("value")))
    return top_bottom_n(ds, ["user_id"], 3, "bottom").select("user_id", "ts", "value")


# ---------------------------------------------------------------------------
# §2.2 metadata / discovery
# ---------------------------------------------------------------------------

@register(
    "q51_rate_after_agg",
    f"""
    WITH ds AS (
      SELECT metric, user_id, ts - ts % {HOUR_MS} AS ts,
             floor(avg(value) * 1000000.0 + 0.5) AS scaled_avg
      FROM {_EV} WHERE metric = 'view'
      GROUP BY 1, 2, 3
    ),
    ag AS (
      SELECT metric, ts, sum(scaled_avg) / 1000000.0 AS value
      FROM ds GROUP BY 1, 2
    ),
    w AS (
      SELECT metric, ts, value,
             lag(value) OVER (PARTITION BY metric ORDER BY ts) AS pv,
             lag(ts) OVER (PARTITION BY metric ORDER BY ts) AS pt
      FROM ag
    )
    SELECT metric, ts,
           {_Q6.format(x='(value - pv) / ((ts - pt) / 1000.0)')} AS rate_value
    FROM w WHERE pt IS NOT NULL
    """,
)
def q51(spark, sf_dir):
    """Rate applied AFTER cross-series aggregation (the reference's
    rate-of-aggregate ordering, query.cpp RateOptions applied on the
    assembled aggregate — planner path plans/planner.py; distributed
    twin of the same composition: 1h-avg downsample → exact-timestamp
    sum across series → rate). Scaled-integer avg keeps the double sums
    order-free; rate quotient quantized to 6 decimals."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "view")
    ds = downsample(d, ["metric", "user_id"], HOUR_MS, "avg")
    scaled = ds.withColumn("value", F.floor(F.col("value") * 1_000_000.0 + F.lit(0.5)))
    agg = scaled.groupBy("metric", "ts").agg(
        (F.sum("value") / F.lit(1_000_000.0)).alias("value")
    )
    r = rate(agg, ["metric"])
    return r.select("metric", "ts", q6(F.col("value")).alias("rate_value"))


@register(
    "q15_suggest_and_lookup",
    f"""
    SELECT metric, user_id, count(*) AS cnt
    FROM {_EV}
    WHERE metric LIKE 's%' OR metric LIKE 'c%'
    GROUP BY 1, 2
    """,
)
def q15(spark, sf_dir):
    """/api/suggest prefix match + /api/search/lookup series enumeration
    (tsdb.cpp:2595-2713, query.cpp:1477-1602)."""
    d = _dps(spark, sf_dir)
    return (
        d.filter(F.col("metric").startswith("s") | F.col("metric").startswith("c"))
        .groupBy("metric", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# §2.8 rollup ROUTING + raw-fallback splice through the planner itself
# ---------------------------------------------------------------------------

_SERIES_SQL = "'host=' || tag_host || ',k=' || tag_k || ',user=' || tag_user"
# the planner's stepped range for a 2h downsample over [T0, T_END]
# (both are 2h-aligned): scan_hi = T_END + 2h - 1 (planner._stepped_range)
_Q26_HI = T_END + 2 * HOUR_MS - 1


def _persisted_view_rollup(spark, sf_dir):
    """The q26/q27 harness's PERSISTED hourly rollup of the metric='view'
    decimal datapoints: built once per source content into a parquet
    table (maintenance.persisted_rollup_1h), so the routed plans scan
    rollup storage — not events — exactly like a deployment where
    rollups are their own table (rollup.cpp ingest-time accumulation)."""
    from ticktock_spark.maintenance import persisted_rollup_1h, source_fingerprint

    d = _tagged_dps(spark, sf_dir).filter(F.col("metric") == "view")
    d = d.withColumn("value", F.col("value").cast("decimal(18,2)"))
    key = source_fingerprint(f"{sf_dir}/events.parquet") + "-view-dec"
    return d, persisted_rollup_1h(spark, d, key)


@register(
    "q26_rollup_routed_2h_avg",
    f"""
    WITH t AS ({_TAGS_CTE}),
    b AS (
      SELECT {_SERIES_SQL} AS series, ts - ts % {2 * HOUR_MS} AS ts,
             count(value) AS cnt, sum(CAST(value AS DECIMAL(18,2))) AS s
      FROM t
      WHERE metric = 'view' AND (ts - ts % {HOUR_MS}) BETWEEN {T0} AND {_Q26_HI}
      GROUP BY 1, 2
    )
    SELECT series, ts, {_Q6.format(x='CAST(s AS DOUBLE) / cnt')} AS avg_value
    FROM b
    """,
)
def q26(spark, sf_dir):
    """Answer-from-rollup ROUTING through the planner (query.cpp:1032-1091):
    a 2h-avg query with a PERSISTED rollup table must be served from the
    rollup_1h parquet (interval snapped to the 1h unit, avg = Σsum/Σcnt
    re-agg) and hash-equal the direct raw re-aggregation the oracle
    computes. DECIMAL-valued datapoints keep the Σ exact; the planner
    casts to double only after the final fold, so both engines see one
    deterministic decimal→double cast.
    tests/test_planner.py::test_q26_is_served_from_rollup pins that the
    raw table is NOT touched; test_routed_plan_scans_rollup_parquet_only
    pins that the physical plan's ONLY file scan is the rollup table."""
    from ticktock_spark.plans.planner import TsdbContext
    from ticktock_spark.plans.spec import QuerySpec

    d, r1h = _persisted_view_rollup(spark, sf_dir)
    ctx = TsdbContext(d, rollup_1h=r1h)
    spec = QuerySpec(metric="view", downsample="2h-avg")
    ds, _ = ctx._downsampled_series(spec, T0, T_END, [])
    return ds.select(
        F.col("__series").alias("series"), "ts", q6(F.col("value")).alias("avg_value")
    )


_Q27_INVALID = "2024-01-10"


@register(
    "q27_rollup_fallback_splice",
    f"""
    WITH t AS ({_TAGS_CTE}),
    valid AS (
      SELECT {_SERIES_SQL} AS series, ts - ts % {2 * HOUR_MS} AS ts,
             count(value) AS cnt, sum(CAST(value AS DECIMAL(18,2))) AS s
      FROM t
      WHERE metric = 'view' AND (ts - ts % {HOUR_MS}) BETWEEN {T0} AND {_Q26_HI}
        AND CAST(to_timestamp(ts / 1000) AS DATE) <> DATE '{_Q27_INVALID}'
      GROUP BY 1, 2
    ),
    redo AS (
      SELECT {_SERIES_SQL} AS series, ts, arg_max(value, seq) AS value
      FROM t
      WHERE metric = 'view' AND ts BETWEEN {T0} AND {_Q26_HI}
        AND CAST(to_timestamp(ts / 1000) AS DATE) = DATE '{_Q27_INVALID}'
      GROUP BY 1, 2
    ),
    invalid AS (
      SELECT series, ts - ts % {2 * HOUR_MS} AS ts,
             count(value) AS cnt, sum(CAST(value AS DECIMAL(18,2))) AS s
      FROM redo GROUP BY 1, 2
    ),
    unioned AS (
      SELECT * FROM valid UNION ALL SELECT * FROM invalid
    )
    SELECT series, ts, {_Q6.format(x='CAST(s AS DOUBLE) / cnt')} AS avg_value
    FROM unioned
    """,
)
def q27(spark, sf_dir):
    """ROLLUP_FALLBACK_RAW splice (query.cpp:1109-1238): one day partition
    is marked rollup-invalid (late/OOO data), so its buckets are re-
    aggregated from raw (with last-wins dedup) and spliced into the rollup
    stream; every other day is still served from the PERSISTED rollup_1h
    parquet, whose dt partition column turns the valid/invalid day split
    into partition pruning on both branches. The oracle computes the same
    union: rollup-equivalent agg for valid days + deduped re-agg for the
    invalidated day."""
    from ticktock_spark.plans.planner import TsdbContext
    from ticktock_spark.plans.spec import QuerySpec

    d, r1h = _persisted_view_rollup(spark, sf_dir)
    ctx = TsdbContext(d, rollup_1h=r1h, rollup_invalid_dts={_Q27_INVALID})
    spec = QuerySpec(metric="view", downsample="2h-avg")
    ds, _ = ctx._downsampled_series(spec, T0, T_END, [])
    return ds.select(
        F.col("__series").alias("series"), "ts", q6(F.col("value")).alias("avg_value")
    )


# ---------------------------------------------------------------------------
# §2.7 rate: resetValue with the DEFAULT counterMax (rate.cpp:60-77)
# ---------------------------------------------------------------------------

_RATE_CTE_PURCHASE = f"""
      SELECT metric, user_id, ts, value,
             lag(value) OVER (PARTITION BY metric, user_id ORDER BY ts) AS pv,
             lag(ts) OVER (PARTITION BY metric, user_id ORDER BY ts) AS pt
      FROM {_EV} WHERE metric = 'purchase'
"""

# (double)UINT64_MAX rounds to exactly 2^64 — the same constant the
# reference's C++ cast produces (query.cpp:119, rate.cpp:67)
_U64_DOUBLE = "18446744073709551616.0"


@register(
    "q28_rate_reset_default_max",
    f"""
    WITH w AS ({_RATE_CTE_PURCHASE})
    SELECT metric, user_id, ts,
           CASE WHEN value - pv < 0
                THEN CASE WHEN ({_U64_DOUBLE} - pv + value) / ((ts - pt) / 1000.0) > 50.0
                          THEN 0.0
                          ELSE ({_U64_DOUBLE} - pv + value) / ((ts - pt) / 1000.0) END
                ELSE (value - pv) / ((ts - pt) / 1000.0) END AS rate_value
    FROM w WHERE pt IS NOT NULL
    """,
)
def q28(spark, sf_dir):
    """resetValue with counterMax left at its default (UINT64_MAX,
    query.cpp:119-120): every decrease computes an astronomically large
    wrap-rate, which exceeds resetValue → emits 0.0. Completes the
    rate.cpp:60-77 option matrix (q07 plain, q08 wrap+reset, q09
    dropResets, q28 default-max reset)."""
    d = _dps(spark, sf_dir).filter(F.col("metric") == "purchase")
    r = rate(d, ["metric", "user_id"], counter=True, reset_value=50)
    return r.select("metric", "user_id", "ts", F.col("value").alias("rate_value"))


# ---------------------------------------------------------------------------
# §2.1 ingest parser round-trip (telnet put + Influx line protocol)
# ---------------------------------------------------------------------------

@register(
    "q29_parser_roundtrip",
    f"""
    SELECT event_type AS metric, epoch_ms(ts) AS ts, value,
           'u' || CAST(user_id AS VARCHAR) AS tag_user,
           'h' || CAST(user_id % 10 AS VARCHAR) AS extra
    FROM events WHERE value IS NOT NULL
    UNION ALL
    SELECT event_type, epoch_ms(ts), value,
           'u' || CAST(user_id AS VARCHAR), 'value@x y'
    FROM events WHERE value IS NOT NULL
    UNION ALL
    SELECT event_type, epoch_ms(ts), CAST(user_id % 5 AS DOUBLE),
           'u' || CAST(user_id AS VARCHAR), 'n@x y'
    FROM events WHERE value IS NOT NULL
    """,
)
def q29(spark, sf_dir):
    """Parser round-trip over real data (dp.cpp:160-201, tsdb.cpp:2715-2953):
    events are FORMATTED as telnet `put` lines and Influx lines (with an
    escaped `\\ ` tag value and an integer-suffix field), pushed through the
    bulk ingest parsers, and the canonical rows must hash-equal the oracle
    computing the same values directly — pinning line splitting, sec/ms
    detection, tag parsing, escape handling, and `_field` explosion.

    NULL-value rows are excluded from the line SYNTHESIS on both engine
    sides: neither protocol can represent a valueless point (dp.cpp's
    put grammar requires the value field; concat_ws would silently skip
    the NULL and emit a malformed line whose first tag lands in the
    value slot)."""
    from ticktock_spark.sources.parsers import (
        influx_lines_to_datapoints,
        put_lines_to_datapoints,
    )

    ev = _table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ms = F.unix_millis("ts").cast("string")
    uid = F.col("user_id").cast("string")

    put_lines = ev.select(
        F.concat_ws(
            " ",
            F.lit("put"),
            F.col("event_type"),
            ms,
            F.col("value").cast("string"),
            F.concat(F.lit("user=u"), uid),
            F.concat(F.lit("host=h"), (F.col("user_id") % 10).cast("string")),
        ).alias("value")
    )
    put_dps = put_lines_to_datapoints(put_lines).select(
        "metric",
        "ts",
        "value",
        F.col("tags")["user"].alias("tag_user"),
        F.col("tags")["host"].alias("extra"),
    )

    influx_lines = ev.select(
        F.concat(
            F.col("event_type"),
            F.lit(",user=u"),
            uid,
            F.lit(",note=x\\ y value="),
            F.col("value").cast("string"),
            F.lit(",n="),
            (F.col("user_id") % 5).cast("string"),
            F.lit("i "),
            ms,
        ).alias("value")
    )
    influx_dps = influx_lines_to_datapoints(influx_lines).select(
        "metric",
        "ts",
        "value",
        F.col("tags")["user"].alias("tag_user"),
        F.concat(F.col("tags")["_field"], F.lit("@"), F.col("tags")["note"]).alias("extra"),
    )
    return put_dps.unionByName(influx_dps)


# ---------------------------------------------------------------------------
# TPC-H-ish batch analytics (beyond-reference general capability + bench)
# ---------------------------------------------------------------------------

@register(
    "q20_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(6,2))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(6,2)) AS DECIMAL(18,4)) * CAST(1 + l_tax AS DECIMAL(6,2))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(6,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-06-30'
    GROUP BY 1, 2
    """,
)
def q20(spark, sf_dir):
    """TPC-H Q1-style pricing summary with exact decimal accumulation;
    single scan + partial agg, no shuffle beyond one exchange."""
    l = _table(spark, sf_dir, "lineitem")
    dec_qty = F.col("l_quantity").cast("decimal(14,2)")
    dec_price = F.col("l_extendedprice").cast("decimal(14,2)")
    dec_disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(6,2)")
    dec_tax1 = (F.lit(1) + F.col("l_tax")).cast("decimal(6,2)")
    disc_price = dec_price * dec_disc1
    charge = disc_price.cast("decimal(18,4)") * dec_tax1
    n = F.count(F.lit(1))
    # spread_scan (r11, guide §2.5 input skew): a single-row-group
    # lineitem file arrives as ONE scan split, serializing the decimal
    # partial aggregation onto one core; every aggregate here is an
    # exact DECIMAL sum or a count, so regrouping rows cannot change a
    # bit of the result. At scale the scan has >= parallelism splits
    # and this is a no-op (no exchange added). Interleaved A/B at
    # sf0.1/local[32]: 1.02 → 0.84 s — the ~0.7 s single-core decimal
    # agg outweighs the added round-robin stage. (The same spread was
    # A/B-measured on the ~100k-row events aggregations and on q21's
    # join probe and REJECTED there: +0.3-0.4 s stage cost for <0.15 s
    # of single-task work.)
    src = spread_scan(
        l.filter(F.col("l_shipdate") <= F.lit("1999-06-30").cast("timestamp")),
        spark.sparkContext.defaultParallelism,
    )
    return (
        src
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec_qty).cast("double").alias("sum_qty"),
            F.sum(dec_price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec_qty).cast("double") / n).alias("avg_qty"),
            (F.sum(dec_price).cast("double") / n).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(6,2)")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q21_revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l.l_discount AS DECIMAL(6,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY 1
    """,
)
def q21(spark, sf_dir):
    """Star join: fact lineitem ⋈ orders, with customer/nation BROADCAST
    (small dims) — at 100 TB the only shuffle is lineitem⋈orders on the
    orderkey; dims never shuffle."""
    l = _table(spark, sf_dir, "lineitem")
    o = _table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    c = _table(spark, sf_dir, "customer")
    n = _table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice").cast("decimal(14,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(6,2)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q96_missing_buckets",
    f"""
    WITH p AS (
      SELECT metric, user_id, count(DISTINCT ts - ts % {HOUR_MS}) AS present
      FROM {_EV}
      WHERE metric = 'view' AND ts >= {T0} AND ts < {T0 + 7 * DAY_MS}
      GROUP BY 1, 2
    )
    SELECT metric, user_id, CAST(present AS BIGINT) AS present,
           CAST({7 * 24} - present AS BIGINT) AS missing
    FROM p
    """,
)
def q96(spark, sf_dir):
    """Series-completeness (gap) report: per series, how many of the 168
    hourly buckets in the first week actually contain data and how many
    are missing — the observability twin of fill (operators/fill.py
    synthesizes the empty buckets; this query COUNTS them). Single
    scan + one agg; the distinct folds into the same hash aggregation."""
    d = _dps(spark, sf_dir).filter(
        (F.col("metric") == "view")
        & (F.col("ts") >= T0)
        & (F.col("ts") < T0 + 7 * DAY_MS)
    )
    expected = 7 * 24
    return (
        d.groupBy("metric", "user_id")
        .agg(
            F.countDistinct(
                F.col("ts") - F.col("ts") % F.lit(HOUR_MS)
            ).alias("present")
        )
        .select(
            "metric",
            "user_id",
            F.col("present").cast("long").alias("present"),
            (F.lit(expected) - F.col("present")).cast("long").alias("missing"),
        )
    )


@register(
    "q97_error_ratio_1h",
    f"""
    WITH b AS (
      SELECT ts - ts % {HOUR_MS} AS ts,
             count(*) FILTER (metric = 'error') AS n_error,
             count(*) AS n_total
      FROM {_EV}
      WHERE ts BETWEEN {T0} AND {T0 + 7 * DAY_MS - 1}
      GROUP BY 1
    )
    SELECT ts, CAST(n_error AS BIGINT) AS n_error,
           CAST(n_total AS BIGINT) AS n_total,
           {_Q6.format(x='CAST(n_error AS DOUBLE) / n_total')} AS error_ratio
    FROM b
    """,
)
def q97(spark, sf_dir):
    """Hourly error burn-rate: errors / all events per 1h bucket over the
    first week — the SLO-style ratio-of-rates a metrics user derives from
    two sub-queries (rate of error over rate of total); computed here as
    one conditional aggregation in a single scan + single shuffle."""
    d = _dps(spark, sf_dir).filter(
        F.col("ts").between(T0, T0 + 7 * DAY_MS - 1)
    )
    bucket = (F.col("ts") - F.col("ts") % F.lit(HOUR_MS)).alias("ts")
    return (
        d.groupBy(bucket)
        .agg(
            F.count(F.when(F.col("metric") == "error", 1)).alias("n_error"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            "ts",
            F.col("n_error").cast("long").alias("n_error"),
            F.col("n_total").cast("long").alias("n_total"),
            q6(
                F.col("n_error").cast("double") / F.col("n_total")
            ).alias("error_ratio"),
        )
    )


@register(
    "q90_series_dim",
    f"""
    WITH t AS ({_TAGS_CTE}),
    s AS (
      SELECT DISTINCT metric,
             'host=' || tag_host || ',k=' || tag_k || ',user=' || tag_user AS body
      FROM t
    )
    SELECT metric, metric || ';' || body AS skey,
           substring(md5(metric || ';' || body), 1, 12) AS tsuid
    FROM s
    """,
)
def q90(spark, sf_dir):
    """Series dimension distillation (tsdb.h:160-164): one row per unique
    (metric, tag-set) with the canonical key and the deterministic tsuid
    surrogate /api/search/lookup returns (query.cpp:1477-1602). The oracle
    rebuilds skey/tsuid from sorted tag keys (host,k,user), pinning the
    Spark-side canonicalization in schema.series_dim_from."""
    from ticktock_spark.schema import series_dim_from

    return series_dim_from(_tagged_dps(spark, sf_dir)).select(
        "metric", "skey", "tsuid"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)


@register(
    "q155_seasonal_profile",
    f"""
    SELECT metric,
           CAST((ts // 3600000) % 24 AS INT) AS hour_utc,
           CAST(count(*) AS BIGINT) AS n,
           {_Q6.format(x='CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)'
                         ' / count(*)')} AS avg_value
    FROM {_EV} GROUP BY 1, 2
    """,
)
def q155(spark, sf_dir):
    """Hour-of-day seasonal profile per metric — the daily-seasonality
    matrix behind capacity planning and seasonal-baseline alerting
    (the calendar twin of q148's recency baseline). Hour is pure
    integer epoch math (UTC, no calendar/tz logic — matching the
    reference's epoch-aligned bucket philosophy, down.cpp:242-246);
    bucket means are exact decimal sums. One scan, one 24×|metrics|
    aggregation."""
    d = _dps(spark, sf_dir)
    # integer `div`, not float '/': a double quotient can round across
    # the hour boundary for epoch values near a multiple of 3600000
    return d.groupBy(
        "metric",
        (F.expr("ts div 3600000") % 24).cast("int").alias("hour_utc"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        q6(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value"),
    )


@register(
    "q156_seasonal_residual",
    f"""
    WITH p AS (
      SELECT metric, CAST((ts // 3600000) % 24 AS INT) AS hour_utc,
             {_Q6.format(x='CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)'
                           ' / count(*)')} AS hour_avg
      FROM {_EV} GROUP BY 1, 2
    )
    SELECT e.metric, e.ts, e.seq, {_Q6.format(x='e.value')} AS value,
           p.hour_avg,
           {_Q6.format(x='(e.value - p.hour_avg)')} AS resid
    FROM {_EV} e JOIN p
      ON e.metric = p.metric AND CAST((e.ts // 3600000) % 24 AS INT) = p.hour_utc
    """,
)
def q156(spark, sf_dir):
    """Seasonal residual per datapoint: value minus its metric's
    same-hour-of-day mean (q155's profile joined back, broadcast — 24 x
    |metrics| rows) — the de-seasonalized signal that feeds threshold
    alerting without tripping on daily cycles. Two scans of the events
    table (profile + points), residual arithmetic mirrored exactly."""
    d = _dps(spark, sf_dir)
    hour = (F.expr("ts div 3600000") % 24).cast("int")
    prof = d.groupBy("metric", hour.alias("hour_utc")).agg(
        q6(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("hour_avg")
    )
    return (
        d.withColumn("hour_utc", hour)
        .join(F.broadcast(prof), ["metric", "hour_utc"])
        .select(
            "metric",
            "ts",
            "seq",
            q6(F.col("value")).alias("value"),
            "hour_avg",
            q6(F.col("value") - F.col("hour_avg")).alias("resid"),
        )
    )


@register(
    "q157_anomaly_ensemble",
    f"""
    WITH b AS (
      SELECT metric, ts - ts % 60000 AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
      FROM {_EV} WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    p AS (
      SELECT metric, CAST((ts // 3600000) % 24 AS INT) AS hour_utc,
             {_Q6.format(
                 x='CAST(sum(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT))'
                   ' AS DOUBLE) / count(*) / 1000000.0')} AS hour_avg
      FROM b GROUP BY 1, 2
    ),
    w AS (
      SELECT metric, ts, v,
             list(v) OVER (PARTITION BY metric ORDER BY ts
                           ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING) AS arr
      FROM b
    ),
    e AS (
      SELECT metric, ts, v,
             list_sum([arr[i] * 0.5 ** (len(arr) - i)
                       for i in generate_series(1, len(arr))])
               / list_sum([0.5 ** (len(arr) - i)
                           for i in generate_series(1, len(arr))]) AS ew
      FROM w WHERE len(arr) > 0
    )
    SELECT e.metric, e.ts, {_Q6.format(x='e.v')} AS value,
           {_Q6.format(x=f"(abs(e.v - p.hour_avg) + abs({_Q6.format(x='(e.v - e.ew)')}))")}
             AS score
    FROM e JOIN p
      ON e.metric = p.metric AND CAST((e.ts // 3600000) % 24 AS INT) = p.hour_utc
    """,
)
def q157(spark, sf_dir):
    """Anomaly-score ensemble over per-metric 1m bucket means: the
    seasonal residual (|v - same-hour mean|, q155/q156) plus the
    recency residual (|v - trailing EWMA baseline|, q148) in one
    per-bucket score — seasonal-aware AND level-aware alerting from two
    already-pinned baselines. Exact decimal bucket means; one window
    pass + one broadcast profile join. NULL-value rows are dropped at
    the scan on both engine sides (not datapoints — see q85): an
    all-NULL series emits no rows."""
    hour = (F.expr("ts div 3600000") % 24).cast("int")
    d = _dps(spark, sf_dir).filter(F.col("value").isNotNull())
    b = d.groupBy("metric", (F.col("ts") - F.col("ts") % MIN_MS).alias("ts")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("value")
    )
    # the hour profile averages bucket MEANS (doubles): sum them in
    # exact integer micro-units or Spark's partial-aggregation order
    # diverges from a sequential engine in the last ulp (caught at
    # sf0.01 — 80 flipped micro-digits)
    prof = b.groupBy("metric", hour.alias("hour_utc")).agg(
        q6(
            F.sum(
                F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            / F.lit(1_000_000.0)
        ).alias("hour_avg")
    )
    from ticktock_spark.operators.rolling import ewma_baseline

    ew = ewma_baseline(b, ["metric"], alpha=0.5, lookback=16)
    # ewma_baseline quantizes; recompute the raw combination from its
    # quantized columns deterministically: score uses the SAME quantized
    # ewma both engines see.
    joined = (
        ew.withColumn("hour_utc", hour)
        .join(F.broadcast(prof), ["metric", "hour_utc"])
    )
    return joined.select(
        "metric",
        "ts",
        q6(F.col("value")).alias("value"),
        # |resid| directly — value - (value - resid) re-rounds twice in
        # IEEE and can differ from resid in the last ulp, which the q6
        # canonicalization then amplifies into a visible digit (caught
        # by the sf0.01 full-registry differential)
        q6(
            F.abs(F.col("value") - F.col("hour_avg")) + F.abs(F.col("resid"))
        ).alias("score"),
    )


@register(
    "q167_metric_correlation",
    f"""
    WITH b AS (
      SELECT metric, ts - ts % 60000 AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
      FROM {_EV} WHERE metric IN ('click', 'error') GROUP BY 1, 2
    ),
    j AS (
      SELECT a.ts,
             CAST(floor(a.v * 1000000.0 + 0.5) AS BIGINT) AS x,
             CAST(floor(b2.v * 1000000.0 + 0.5) AS BIGINT) AS y
      FROM b a JOIN b b2 ON a.ts = b2.ts
      WHERE a.metric = 'click' AND b2.metric = 'error'
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
      FROM j
    )
    SELECT CAST(n AS BIGINT) AS n,
           {_Q6.format(x='''(CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0))''')}
             AS pearson_r
    FROM s
    """,
)
def q167(spark, sf_dir):
    """Exact Pearson correlation between two metrics' aligned 1m series
    (click vs error) — the metric-correlation primitive behind
    dependency discovery and alert grouping in observability stacks.
    Bucket means are exact decimal sums, then every correlation moment
    is an exact DECIMAL(38)/HUGEINT integer over micro-unit values
    (drift.py's integer-cross-product discipline), so the final r is
    bit-identical across engines. Alignment is exact-timestamp inner
    join (the engine's no-interpolation rule, aggregate.cpp:158-215)."""
    d = _dps(spark, sf_dir).filter(F.col("metric").isin("click", "error"))
    b = d.groupBy("metric", (F.col("ts") - F.col("ts") % MIN_MS).alias("ts")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    micro = F.floor(F.col("v") * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    a = b.filter(F.col("metric") == "click").select("ts", micro.alias("x"))
    c = b.filter(F.col("metric") == "error").select("ts", micro.alias("y"))
    jd = a.join(c, "ts")
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    s = jd.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    # try_divide: a constant series (or a single aligned bucket) has
    # zero variance — the guard yields NULL instead of an ANSI
    # divide-by-zero, mirroring the oracle's NULLIF
    return s.select(
        F.col("n").cast("long").alias("n"),
        q6(F.try_divide(num, F.sqrt(denx) * F.sqrt(deny))).alias("pearson_r"),
    )


@register(
    "q168_lead_lag",
    f"""
    WITH b AS (
      SELECT metric, ts - ts % 60000 AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
      FROM {_EV} WHERE metric IN ('click', 'error') GROUP BY 1, 2
    ),
    m AS (SELECT ts, CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS x
          FROM b WHERE metric = 'click'),
    o AS (SELECT ts, CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS y
          FROM b WHERE metric = 'error'),
    l AS (SELECT unnest([-2, -1, 0, 1, 2]) AS lag_min),
    j AS (
      SELECT l.lag_min, m.x, o.y
      FROM l JOIN m ON true JOIN o ON o.ts = m.ts + l.lag_min * 60000
    ),
    s AS (
      SELECT lag_min, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
      FROM j GROUP BY 1
    )
    SELECT CAST(lag_min AS INT) AS lag_min, CAST(n AS BIGINT) AS n,
           {_Q6.format(x='''(CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0))''')}
             AS pearson_r
    FROM s
    """,
)
def q168(spark, sf_dir):
    """Lead-lag correlation profile: q167's exact Pearson machinery at
    bucket shifts of -2..+2 minutes (does error FOLLOW click?) — the
    one-table answer to "which metric leads" in incident analysis. Same
    decimal-exact moments and zero-variance guard; the lag fan-out is a
    5-row literal cross join, so the aligned join runs once per lag on
    bucket-scale frames."""
    d = _dps(spark, sf_dir).filter(F.col("metric").isin("click", "error"))
    b = d.groupBy("metric", (F.col("ts") - F.col("ts") % MIN_MS).alias("ts")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    micro = F.floor(F.col("v") * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    a = b.filter(F.col("metric") == "click").select("ts", micro.alias("x"))
    c = b.filter(F.col("metric") == "error").select("ts", micro.alias("y"))
    lags = spark.range(-2, 3).select(F.col("id").cast("int").alias("lag_min"))
    jd = (
        a.crossJoin(F.broadcast(lags))
        .join(
            c.select(F.col("ts").alias("__ots"), "y"),
            F.col("__ots") == F.col("ts") + F.col("lag_min") * F.lit(60000),
        )
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    s = jd.groupBy("lag_min").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        "lag_min",
        F.col("n").cast("long").alias("n"),
        q6(F.try_divide(num, F.sqrt(denx) * F.sqrt(deny))).alias("pearson_r"),
    )


_MOMENTS = """
      CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
"""

_PEARSON_R = _Q6.format(
    x="""(CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0))"""
)


@register(
    "q170_acf",
    f"""
    WITH b AS (
      SELECT metric, ts - ts % 60000 AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
      FROM {_EV} GROUP BY 1, 2
    ),
    m AS (SELECT metric, ts, CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS x
          FROM b),
    l AS (SELECT unnest([1, 2, 3, 4, 5]) AS lag),
    j AS (
      SELECT m.metric, l.lag, m.x, o.x AS y
      FROM l JOIN m ON true
             JOIN m o ON o.metric = m.metric AND o.ts = m.ts + l.lag * 60000
    ),
    s AS (
      SELECT metric, lag, {_MOMENTS}
      FROM j GROUP BY 1, 2
    )
    SELECT metric, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n,
           {_PEARSON_R} AS pearson_r
    FROM s
    """,
)
def q170(spark, sf_dir):
    """Autocorrelation function per metric (operators/correlate.py acf):
    exact Pearson between each metric's 1m-bucket series and itself at
    lags 1-5 — the memory/seasonality fingerprint read before choosing
    EWMA alphas or rollup grains (q168's lead-lag machinery pointed at
    a single series). Broadcast lag fan-out + one (metric, shifted-ts)
    equi-join at bucket scale; DECIMAL(38) integer moments."""
    from ticktock_spark.operators.correlate import acf

    d = _dps(spark, sf_dir)
    b = d.groupBy("metric", (F.col("ts") - F.col("ts") % MIN_MS).alias("ts")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("value")
    )
    return acf(b, ["metric"], max_lag=5, bucket_ms=MIN_MS)


@register(
    "q171_changepoint",
    f"""
    WITH b AS (
      SELECT metric, ts - ts % 60000 AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
      FROM {_EV} GROUP BY 1, 2
    ),
    w AS (
      SELECT metric, ts, v,
             count(*) OVER lw AS ln, count(*) OVER rw AS rn,
             CAST(sum(CAST(v AS DECIMAL(18,2))) OVER lw AS DOUBLE) / 8.0
               AS mean_before,
             CAST(sum(CAST(v AS DECIMAL(18,2))) OVER rw AS DOUBLE) / 8.0
               AS mean_after
      FROM b
      WINDOW lw AS (PARTITION BY metric ORDER BY ts
                    ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING),
             rw AS (PARTITION BY metric ORDER BY ts
                    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
    )
    SELECT metric, ts, {_Q6.format(x='v')} AS value, mean_before, mean_after,
           {_Q6.format(x='abs(mean_after - mean_before)')} AS shift_score
    FROM w WHERE ln = 8 AND rn = 8
    """,
)
def q171(spark, sf_dir):
    """Window-contrast changepoint score (operators/rolling.py
    mean_shift_score): |mean of next 8 buckets − mean of previous 8|
    per metric 1m bucket — the non-recursive level-change detector
    behind "when did this metric step?"; both sides full, exact decimal
    sums, one series-sorted window pass."""
    from ticktock_spark.operators.rolling import mean_shift_score

    d = _dps(spark, sf_dir)
    b = d.groupBy("metric", (F.col("ts") - F.col("ts") % MIN_MS).alias("ts")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("value")
    )
    out = mean_shift_score(b, ["metric"], window=8)
    return out.select(
        "metric",
        "ts",
        q6(F.col("value")).alias("value"),
        "mean_before",
        "mean_after",
        "shift_score",
    )


@register(
    "q172_burn_rate",
    f"""
    WITH b AS (
      SELECT ts - ts % 300000 AS ts,
             count(*) FILTER (metric = 'error') AS n_err,
             count(*) AS n_tot
      FROM {_EV} GROUP BY 1
    ),
    w AS (
      SELECT ts, n_err, n_tot,
             sum(n_err) OVER hw AS err_1h, sum(n_tot) OVER hw AS tot_1h
      FROM b
      WINDOW hw AS (ORDER BY ts RANGE BETWEEN 3300000 PRECEDING
                    AND CURRENT ROW)
    )
    SELECT ts, CAST(n_err AS BIGINT) AS n_err, CAST(n_tot AS BIGINT) AS n_tot,
           {_Q6.format(x='CAST(n_err AS DOUBLE) / n_tot')} AS ratio_5m,
           CAST(err_1h AS BIGINT) AS err_1h, CAST(tot_1h AS BIGINT) AS tot_1h,
           {_Q6.format(x='CAST(err_1h AS DOUBLE) / tot_1h')} AS ratio_1h,
           CAST(n_err AS DOUBLE) / n_tot > 0.12
             AND CAST(err_1h AS DOUBLE) / tot_1h > 0.12 AS alert
    FROM w
    """,
)
def q172(spark, sf_dir):
    """Multi-window SLO burn-rate (the SRE-workbook alert shape): error
    ratio over each 5m bucket AND over the trailing 1h (RANGE frame —
    robust to missing buckets), alert when BOTH exceed the burn
    threshold — fast windows catch, slow windows confirm. Exact integer
    counts; one scan + one global bucket-timeline window (bucket-scale:
    ~105k rows/year, safe as a single sorted partition)."""
    d = _dps(spark, sf_dir)
    b = d.groupBy((F.col("ts") - F.col("ts") % F.lit(300000)).alias("ts")).agg(
        F.count(F.when(F.col("metric") == "error", 1)).alias("n_err"),
        F.count(F.lit(1)).alias("n_tot"),
    )
    hw = Window.orderBy("ts").rangeBetween(-3300000, Window.currentRow)
    w = b.select(
        "ts",
        "n_err",
        "n_tot",
        F.sum("n_err").over(hw).alias("err_1h"),
        F.sum("n_tot").over(hw).alias("tot_1h"),
    )
    r5 = F.col("n_err").cast("double") / F.col("n_tot")
    r1h = F.col("err_1h").cast("double") / F.col("tot_1h")
    return w.select(
        "ts",
        F.col("n_err").cast("long").alias("n_err"),
        F.col("n_tot").cast("long").alias("n_tot"),
        q6(r5).alias("ratio_5m"),
        F.col("err_1h").cast("long").alias("err_1h"),
        F.col("tot_1h").cast("long").alias("tot_1h"),
        q6(r1h).alias("ratio_1h"),
        ((r5 > 0.12) & (r1h > 0.12)).alias("alert"),
    )


@register(
    "q174_histogram",
    f"""
    SELECT metric, CAST(floor(value / 10.0) AS BIGINT) AS bin,
           floor(value / 10.0) * 10.0 AS lo,
           CAST(count(*) AS BIGINT) AS n
    FROM {_EV} GROUP BY 1, 2, 3
    """,
)
def q174(spark, sf_dir):
    """Per-metric value histogram in fixed-width bins (width 10) — the
    value-distribution view behind latency heatmaps and SLO bucket
    boundaries (newer OpenTSDB builds grew a histogram type; the
    engine's raw points make it one exact aggregation). Bin edges are
    floor(value/width) — engine-exact for the 2-decimal value domain.
    One scan, one hash agg; output is bins × metrics (bounded)."""
    d = _dps(spark, sf_dir)
    b = F.floor(F.col("value") / F.lit(10.0))
    return d.groupBy(
        "metric",
        b.cast("long").alias("bin"),
        (b * F.lit(10.0)).alias("lo"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


@register(
    "q175_trend",
    f"""
    WITH b AS (
      SELECT metric, ts - ts % 60000 AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
      FROM {_EV} GROUP BY 1, 2
    ),
    xy AS (
      SELECT metric,
             (ts - min(ts) OVER (PARTITION BY metric)) // 60000 AS x,
             CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS y
      FROM b
    ),
    s AS (
      SELECT metric, {_MOMENTS}
      FROM xy GROUP BY 1
    ),
    f AS (
      SELECT metric, n,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0) AS m_micro,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
             {_PEARSON_R} AS pearson_r
      FROM s
    )
    SELECT metric, CAST(n AS BIGINT) AS n,
           {_Q6.format(x='(m_micro / 1000000.0)')} AS slope,
           {_Q6.format(x='((syd - m_micro * sxd) / CAST(n AS DOUBLE) / 1000000.0)')}
             AS intercept,
           pearson_r
    FROM f
    """,
)
def q175(spark, sf_dir):
    """Least-squares linear trend per metric over 1m-bucket means
    (operators/correlate.py trend) — slope in value-units per bucket
    plus intercept and the fit's Pearson r, the capacity-forecast
    primitive. Exact DECIMAL(38) moments over (bucket index, micro
    value); one window-min + one aggregation, no joins."""
    from ticktock_spark.operators.correlate import trend

    d = _dps(spark, sf_dir)
    b = d.groupBy("metric", (F.col("ts") - F.col("ts") % MIN_MS).alias("ts")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("value")
    )
    return trend(b, ["metric"], bucket_ms=MIN_MS)


@register(
    "q176_error_budget",
    f"""
    WITH b AS (
      SELECT ts - ts % 300000 AS ts,
             count(*) FILTER (metric = 'error') AS n_err,
             count(*) AS n_tot
      FROM {_EV} GROUP BY 1
    ),
    w AS (
      SELECT ts, ts - ts % 604800000 AS period, n_err, n_tot,
             sum(n_err) OVER pw AS cum_err, sum(n_tot) OVER pw AS cum_tot
      FROM b
      WINDOW pw AS (PARTITION BY ts - ts % 604800000 ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT period, ts, CAST(cum_err AS BIGINT) AS cum_err,
           CAST(cum_tot AS BIGINT) AS cum_tot,
           {_Q6.format(x='CAST(cum_err AS DOUBLE) / cum_tot')} AS cum_ratio,
           {_Q6.format(
               x='(CAST(cum_err AS DOUBLE) / cum_tot / 0.12)')} AS budget_used,
           {_Q6.format(
               x='(1.0 - CAST(cum_err AS DOUBLE) / cum_tot / 0.12)')}
             AS budget_remaining
    FROM w
    """,
)
def q176(spark, sf_dir):
    """SLO error-budget tracker: per 5m bucket, the CUMULATIVE error
    ratio since the start of its 7-day budget period and the fraction
    of a 12% error budget consumed/remaining — the error-budget curve
    an SRE burns alerts against (q172's burn rate is its derivative).
    Exact integer cumulative counts (running window partitioned by
    period, so state never spans periods); bucket-scale timeline."""
    d = _dps(spark, sf_dir)
    b = d.groupBy((F.col("ts") - F.col("ts") % F.lit(300000)).alias("ts")).agg(
        F.count(F.when(F.col("metric") == "error", 1)).alias("n_err"),
        F.count(F.lit(1)).alias("n_tot"),
    )
    period = (F.col("ts") - F.col("ts") % F.lit(604800000)).alias("period")
    pw = (
        Window.partitionBy(period)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w = b.select(
        period,
        "ts",
        F.sum("n_err").over(pw).alias("cum_err"),
        F.sum("n_tot").over(pw).alias("cum_tot"),
    )
    ratio = F.col("cum_err").cast("double") / F.col("cum_tot")
    return w.select(
        "period",
        "ts",
        F.col("cum_err").cast("long").alias("cum_err"),
        F.col("cum_tot").cast("long").alias("cum_tot"),
        q6(ratio).alias("cum_ratio"),
        q6(ratio / F.lit(0.12)).alias("budget_used"),
        q6(F.lit(1.0) - ratio / F.lit(0.12)).alias("budget_remaining"),
    )


@register(
    "q179_dominant_period",
    f"""
    WITH b AS (
      SELECT metric, ts - ts % 60000 AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
      FROM {_EV} GROUP BY 1, 2
    ),
    m AS (SELECT metric, ts, CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS x
          FROM b),
    l AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8]) AS lag),
    j AS (
      SELECT m.metric, l.lag, m.x, o.x AS y
      FROM l JOIN m ON true
             JOIN m o ON o.metric = m.metric AND o.ts = m.ts + l.lag * 60000
    ),
    s AS (SELECT metric, lag, {_MOMENTS} FROM j GROUP BY 1, 2),
    r AS (SELECT metric, lag, CAST(n AS BIGINT) AS n,
                 {_PEARSON_R} AS pearson_r
          FROM s),
    rk AS (
      SELECT metric, lag, n, pearson_r,
             row_number() OVER (PARTITION BY metric
                                ORDER BY pearson_r DESC NULLS LAST, lag)
               AS rn
      FROM r
    )
    SELECT metric, CAST(lag AS INT) AS period_buckets, n, pearson_r
    FROM rk WHERE rn = 1
    """,
)
def q179(spark, sf_dir):
    """Dominant period per metric: the 1m-bucket lag (1–8) whose
    autocorrelation is highest — the single-number answer "does this
    metric cycle, and how fast" that picks rollup grains and seasonal
    window lengths (q170's ACF reduced by a deterministic argmax;
    ties break to the shortest lag, both engines quantize r to micro
    units first so the argmax is engine-exact)."""
    from pyspark.sql import Window as W

    from ticktock_spark.operators.correlate import acf

    d = _dps(spark, sf_dir)
    b = d.groupBy("metric", (F.col("ts") - F.col("ts") % MIN_MS).alias("ts")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("value")
    )
    r = acf(b, ["metric"], max_lag=8, bucket_ms=MIN_MS)
    rn = F.row_number().over(
        W.partitionBy("metric").orderBy(
            F.col("pearson_r").desc_nulls_last(), "lag"
        )
    )
    return (
        r.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "metric",
            F.col("lag").alias("period_buckets"),
            "n",
            "pearson_r",
        )
    )


# ---------------------------------------------------------------------------
# round 8: robust statistics (operators/robust.py, operators/drift.py)
# ---------------------------------------------------------------------------

_BUCKET_MEANS_1M = f"""
      SELECT metric, ts - ts % 60000 AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
      FROM {_EV} GROUP BY 1, 2
"""


@register(
    "q180_mad_outliers",
    f"""
    WITH b AS ({_BUCKET_MEANS_1M}),
    y AS (SELECT metric, ts, v,
                 CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS y FROM b),
    m AS (SELECT metric, median(y) AS med FROM y GROUP BY 1),
    d AS (SELECT y.metric, y.ts, y.v, y.y, m.med, abs(y.y - m.med) AS dev
          FROM y JOIN m ON y.metric = m.metric),
    s AS (SELECT metric, median(dev) AS mad FROM d GROUP BY 1)
    SELECT d.metric, d.ts, {_Q6.format(x='d.v')} AS value,
           {_Q6.format(x='(0.6745 * (d.y - d.med) / s.mad)')} AS score
    FROM d JOIN s ON d.metric = s.metric
    WHERE s.mad > 0 AND abs(0.6745 * (d.y - d.med) / s.mad) >= 3.5
    """,
)
def q180(spark, sf_dir):
    """Robust per-metric outliers over 1m bucket means: modified z-score
    0.6745·(v − median)/MAD ≥ 3.5 (operators/robust.py mad_outliers) —
    the order-statistic alternative to q84's mean/stddev z-score, whose
    baseline a single wild datapoint can inflate to mask itself.
    Medians run on integer micro-units (midpoints of integers are exact
    IEEE — engine-identical); both medians are unordered-frame window
    aggregates sharing ONE per-series exchange over bucket-scale
    partitions (operators/robust.py mad_outliers — this docstring
    previously claimed "no windows", stale since the r8 rewrite)."""
    from ticktock_spark.operators.robust import mad_outliers

    d = _dps(spark, sf_dir)
    b = d.groupBy("metric", (F.col("ts") - F.col("ts") % MIN_MS).alias("ts")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("value")
    )
    return mad_outliers(b, ["metric"], threshold=3.5)


@register(
    "q181_theilsen_trend",
    f"""
    WITH b AS (
      SELECT metric, ts - ts % 3600000 AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
      FROM {_EV} GROUP BY 1, 2
    ),
    y AS (SELECT metric,
                 (ts - min(ts) OVER (PARTITION BY metric)) // 3600000 AS x,
                 CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS y
          FROM b),
    p AS (SELECT a.metric,
                 CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS sp
          FROM y a JOIN y b ON a.metric = b.metric AND b.x > a.x),
    st AS (SELECT metric, count(*) AS n FROM y GROUP BY 1),
    sl AS (SELECT metric, count(*) AS n_pairs, median(sp) AS med_sp
           FROM p GROUP BY 1)
    SELECT st.metric, CAST(st.n AS BIGINT) AS n,
           CAST(sl.n_pairs AS BIGINT) AS n_pairs,
           {_Q6.format(x='(sl.med_sp / 1000000.0)')} AS slope
    FROM st JOIN sl ON st.metric = sl.metric
    """,
)
def q181(spark, sf_dir):
    """Theil–Sen robust trend per metric over hourly bucket means: the
    MEDIAN of all pairwise slopes (operators/robust.py theil_sen) —
    q175's OLS line bends under one spike; this one holds until ~29% of
    the buckets are garbage. The quadratic pair fan-out is bucket-
    bounded ((time-range/1h)², independent of datapoint volume — the
    q170 bound-by-buckets shape); pair slopes are integer-ratio doubles
    and the median midpoint is pinned IEEE in both engines."""
    from ticktock_spark.operators.robust import theil_sen

    d = _dps(spark, sf_dir)
    b = d.groupBy(
        "metric", (F.col("ts") - F.col("ts") % HOUR_MS).alias("ts")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("value")
    )
    return theil_sen(b, ["metric"], bucket_ms=HOUR_MS)


@register(
    "q182_seasonal_strength",
    f"""
    WITH b AS ({_BUCKET_MEANS_1M}),
    y AS (SELECT metric, (ts % 86400000) // 3600000 AS phase,
                 CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS y FROM b),
    p AS (SELECT metric, phase,
                 CAST(floor(CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) / count(*)
                            + 0.5) AS BIGINT) AS ph_mean
          FROM y GROUP BY 1, 2),
    g AS (SELECT metric,
                 CAST(floor(CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) / count(*)
                            + 0.5) AS BIGINT) AS g_mean
          FROM y GROUP BY 1),
    ss AS (
      SELECT y.metric, count(*) AS n, count(DISTINCT y.phase) AS n_phases,
             CAST(sum(CAST(y.y - p.ph_mean AS HUGEINT)
                      * CAST(y.y - p.ph_mean AS HUGEINT)) AS HUGEINT)
               AS ss_resid,
             CAST(sum(CAST(y.y - g.g_mean AS HUGEINT)
                      * CAST(y.y - g.g_mean AS HUGEINT)) AS HUGEINT)
               AS ss_total
      FROM y JOIN p ON y.metric = p.metric AND y.phase = p.phase
             JOIN g ON y.metric = g.metric
      GROUP BY 1
    )
    SELECT metric, CAST(n AS BIGINT) AS n, CAST(n_phases AS BIGINT) AS n_phases,
           {_Q6.format(
               x='(1.0 - CAST(ss_resid AS DOUBLE)'
                 ' / NULLIF(CAST(ss_total AS DOUBLE), 0.0))')} AS strength
    FROM ss
    """,
)
def q182(spark, sf_dir):
    """Seasonal strength per metric: 1 − SS_resid/SS_total against the
    hour-of-day profile (operators/robust.py seasonal_strength) — the
    one number that says whether q156's seasonal-baseline alerting
    beats a flat threshold for this metric, and whether an hourly
    rollup can stand in for raw data in capacity models. Phase means
    round to integer micro-units (q157's pattern); both sums of squares
    accumulate order-free in DECIMAL(38)/HUGEINT."""
    from ticktock_spark.operators.robust import seasonal_strength

    d = _dps(spark, sf_dir)
    b = d.groupBy("metric", (F.col("ts") - F.col("ts") % MIN_MS).alias("ts")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("value")
    )
    return seasonal_strength(b, ["metric"])


@register(
    "q183_wasserstein_drift",
    f"""
    WITH s AS (
      SELECT metric, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
             ts < {T_MID} AS is_a
      FROM {_EV} WHERE value IS NOT NULL
    ),
    pv AS (
      SELECT metric, v,
             count(*) FILTER (is_a) AS na,
             count(*) FILTER (NOT is_a) AS nb
      FROM s GROUP BY 1, 2
    ),
    c AS (
      SELECT metric, v,
             sum(na) OVER cw AS ca, sum(nb) OVER cw AS cb,
             sum(na) OVER (PARTITION BY metric) AS ta,
             sum(nb) OVER (PARTITION BY metric) AS tb,
             lead(v) OVER (PARTITION BY metric ORDER BY v) - v AS gap
      FROM pv
      WINDOW cw AS (PARTITION BY metric ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    t AS (
      SELECT metric, ta, tb,
             abs(CAST(ca AS HUGEINT) * CAST(tb AS HUGEINT)
                 - CAST(cb AS HUGEINT) * CAST(ta AS HUGEINT))
               * CAST(coalesce(gap, 0) AS HUGEINT) AS term
      FROM c WHERE ta > 0 AND tb > 0
    ),
    a AS (SELECT metric, ta, tb, sum(term) AS s FROM t GROUP BY 1, 2, 3)
    SELECT metric, CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
           {_Q6.format(
               x='(CAST(s AS DOUBLE)'
                 ' / (CAST(CAST(ta AS HUGEINT) * CAST(tb AS HUGEINT) AS DOUBLE)'
                 ' * 100.0))')} AS w1
    FROM a
    """,
)
def q183(spark, sf_dir):
    """Per-metric 1-Wasserstein value drift between the month's first
    and second half (operators/drift.py wasserstein_drift): the
    magnitude-aware complement of q121's KS — KS says the distributions
    differ somewhere, W1 says how much value-mass moved and how far, in
    value units. Exact on the 2-decimal value grid: integer CDF
    numerators × integer grid gaps accumulate in DECIMAL(38)/HUGEINT;
    the shuffle carries one row per distinct (metric, value)."""
    from ticktock_spark.operators.drift import wasserstein_drift

    d = _dps(spark, sf_dir)
    return wasserstein_drift(
        d, F.col("ts") < F.lit(T_MID), group_cols=["metric"]
    ).select("metric", "n_a", "n_b", "w1")


@register(
    "q188_fano_burstiness",
    f"""
    WITH b AS (
      SELECT metric, ts - ts % 60000 AS b, count(*) AS c
      FROM {_EV} GROUP BY 1, 2
    ),
    m AS (
      SELECT metric,
             (max(b) - min(b)) // 60000 + 1 AS n,
             CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS sc,
             CAST(sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS HUGEINT)
               AS sc2
      FROM b GROUP BY 1
    )
    SELECT metric, CAST(n AS BIGINT) AS n_buckets,
           CAST(sc AS BIGINT) AS n_events,
           {_Q6.format(
               x='(CAST(CAST(n AS HUGEINT) * sc2 - sc * sc AS DOUBLE)'
                 ' / CAST(CAST(n AS HUGEINT) * sc AS DOUBLE))')} AS fano
    FROM m WHERE sc > 0
    """,
)
def q188(spark, sf_dir):
    """Arrival burstiness per metric: the Fano factor (index of
    dispersion) of per-1m-bucket event COUNTS over the metric's active
    span — 1.0 for a Poisson arrival process, >1 bursty, <1
    dispatcher-regular. The capacity-planning number behind queue
    sizing that rates/means can't show. Empty buckets inside the span
    count as zeros WITHOUT materializing a spine: they contribute
    nothing to Σc/Σc², so n = span/bucket + 1 from min/max alone — one
    scan, one bucket agg, one per-metric reduction, exact
    DECIMAL(38)/HUGEINT moments."""
    from ticktock_spark.operators.summary import fano_factor

    return fano_factor(_dps(spark, sf_dir), ["metric"], bucket_ms=MIN_MS)


@register(
    "q189_daily_top_movers",
    f"""
    WITH d AS (
      SELECT metric, ts - ts % 86400000 AS day,
             CAST(floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                         / count(*)) * 1000000.0 + 0.5) AS BIGINT) AS m
      FROM {_EV} GROUP BY 1, 2
    ),
    l AS (
      SELECT metric, day, m,
             lag(day) OVER w AS pday, lag(m) OVER w AS pm
      FROM d WINDOW w AS (PARTITION BY metric ORDER BY day)
    ),
    e AS (SELECT metric, day, pm, m, m - pm AS delta
          FROM l WHERE pday = day - 86400000),
    r AS (
      SELECT metric, day, pm, m, delta,
             row_number() OVER (PARTITION BY metric
                                ORDER BY abs(delta) DESC, day) AS rank
      FROM e
    )
    SELECT metric, day AS ts, CAST(rank AS BIGINT) AS rank,
           pm / 1000000.0 AS prev_mean, m / 1000000.0 AS mean,
           delta / 1000000.0 AS delta
    FROM r WHERE rank <= 3
    """,
)
def q189(spark, sf_dir):
    """Daily top movers: for each metric, the 3 largest
    day-over-day jumps of the daily mean (adjacent calendar days only —
    a gap day breaks the comparison rather than faking a jump). The
    release-triage view: 'what changed most, and when'. Daily means
    quantize to integer micro-units BEFORE the delta and the ranking,
    so |Δ| ordering is pure integer comparison — engine-exact, no
    float-rank ambiguity. One scan + one per-metric window + top-3."""
    from ticktock_spark.operators.summary import daily_top_movers

    return daily_top_movers(_dps(spark, sf_dir), ["metric"], k=3)


@register(
    "q194_histogram_quantile",
    f"""
    WITH h AS (
      SELECT metric, CAST(floor(value / 10.0) AS BIGINT) AS bin, count(*) AS c
      FROM {_EV} WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    cw AS (
      SELECT metric, bin, c,
             sum(c) OVER (PARTITION BY metric ORDER BY bin) AS cum,
             sum(c) OVER (PARTITION BY metric) AS n
      FROM h
    ),
    qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
    cand AS (
      SELECT cw.metric, qs.q, cw.bin, cw.c, cw.cum, cw.n,
             row_number() OVER (PARTITION BY cw.metric, qs.q
                                ORDER BY cw.bin) AS rn
      FROM cw JOIN qs ON cw.cum >= qs.q * cw.n
    )
    SELECT metric, q, CAST(n AS BIGINT) AS n,
           {_Q6.format(
               x='(bin * 10.0 + 10.0 * (q * n - (cum - c)) / c)')} AS est
    FROM cand WHERE rn = 1
    """,
)
def q194(spark, sf_dir):
    """Histogram-quantile estimation (the Prometheus histogram_quantile
    semantics over q174's fixed-width bins): p50/p90/p99 read from
    cumulative bin counts with linear interpolation inside the landing
    bin — the O(bins) percentile path for 100 TB dashboards, next to
    the exact R-6 machinery (q05/q85/q102) whose cost is value-scale.
    Integer bin counts; the interpolation is four pinned IEEE ops; the
    shuffle carries one row per (metric, bin). NULL-value rows are
    dropped at the scan on both engine sides (not datapoints — see
    q85): a NULL value would otherwise land in an engine-ordered NULL
    bin and inflate n."""
    from ticktock_spark.operators.summary import (
        histogram_quantiles,
        value_histogram,
    )

    h = value_histogram(
        _dps(spark, sf_dir).filter(F.col("value").isNotNull()),
        ["metric"],
        width=10.0,
    )
    return histogram_quantiles(h, [0.5, 0.9, 0.99], width=10.0)


# R-6 threshold interpolation over a DuckDB sorted list (the q59/q138
# fragment; vals/idx/n must be in scope).
_R6_LIST_SQL = """CASE WHEN n = 1 THEN vals[1]
             WHEN idx < 1 THEN vals[1]
             WHEN idx >= n THEN vals[n]
             ELSE vals[CAST(floor(idx) AS INTEGER)]
                  + (idx - floor(idx))
                    * (vals[CAST(floor(idx) AS INTEGER) + 1]
                       - vals[CAST(floor(idx) AS INTEGER)]) END"""

_R6_IDX_SQL = """CASE WHEN quantile <= 0 THEN 0.0
                  WHEN quantile >= 100 THEN CAST(n AS DOUBLE)
                  ELSE quantile / 100.0 * (n + 1) END"""

_BUCKET_MEANS_1H = f"""
      SELECT metric, ts - ts % 3600000 AS ts,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
      FROM {_EV} GROUP BY 1, 2
"""


@register(
    "q195_interarrival",
    f"""
    WITH t AS (SELECT DISTINCT metric, ts FROM {_EV}),
    d AS (SELECT metric,
                 ts - lag(ts) OVER (PARTITION BY metric ORDER BY ts) AS delta
          FROM t),
    v AS (SELECT metric, CAST(delta AS DOUBLE) AS v FROM d
          WHERE delta IS NOT NULL),
    g AS (SELECT metric, list_sort(list(v)) AS vals, count(*) AS n
          FROM v GROUP BY 1),
    e AS (SELECT metric, vals, n, unnest([50.0, 95.0]) AS quantile FROM g),
    cx AS (SELECT metric, quantile, n, vals, {_R6_IDX_SQL} AS idx FROM e)
    SELECT metric, quantile, CAST(n AS BIGINT) AS n, {_R6_LIST_SQL} AS pct
    FROM cx
    """,
)
def q195(spark, sf_dir):
    """Inter-arrival percentiles per metric (operators/summary.py
    interarrival_percentiles): p50 of the deltas between consecutive
    distinct timestamps IS the series' native reporting interval — the
    number op=suggest_grain wants read from the data, not configuration
    (tsdb.h:160-164 hard-codes it per TSDB; here it is measured) — and
    p95 exposes collection jitter/stalls. Deltas are exact integer ms;
    R-6 interpolation via the rank machinery (no per-series arrays).
    One distinct + the same single series-sort exchange rate pays."""
    from ticktock_spark.operators.summary import interarrival_percentiles

    return interarrival_percentiles(_dps(spark, sf_dir), ["metric"])


@register(
    "q196_flatline_runs",
    f"""
    WITH b AS ({_BUCKET_MEANS_1M}),
    y AS (SELECT metric, ts, CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS y
          FROM b),
    i AS (SELECT metric, y,
                 row_number() OVER (PARTITION BY metric ORDER BY ts)
               - row_number() OVER (PARTITION BY metric, y ORDER BY ts)
                   AS island
          FROM y),
    r AS (SELECT metric, y, island, count(*) AS run_len
          FROM i GROUP BY 1, 2, 3)
    SELECT metric, CAST(sum(run_len) AS BIGINT) AS n_buckets,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           CAST(count(*) FILTER (run_len >= 10) AS BIGINT) AS n_flat_runs
    FROM r GROUP BY 1
    """,
)
def q196(spark, sf_dir):
    """Stuck-sensor audit per metric (operators/summary.py
    flatline_runs): longest run of consecutive 1m buckets with an
    IDENTICAL mean, and how many runs reach 10 buckets — a gauge frozen
    at its last reading has zero variance, so every z-score/percentile
    monitor calls it healthy; run-length is the signal that catches it.
    Gaps-and-islands on micro-unit equality: two row_numbers sharing one
    per-series bucket sort, then bucket-scale groupBys."""
    from ticktock_spark.operators.summary import flatline_runs

    d = _dps(spark, sf_dir)
    b = d.groupBy(
        "metric", (F.col("ts") - F.col("ts") % MIN_MS).alias("ts")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("value")
    )
    return flatline_runs(b, ["metric"], min_run=10)


@register(
    "q197_gap_report",
    f"""
    WITH b AS (SELECT DISTINCT metric, ts - ts % 60000 AS b FROM {_EV}),
    d AS (SELECT metric, b,
                 lead(b) OVER (PARTITION BY metric ORDER BY b) - b - 60000
                   AS gap
          FROM b)
    SELECT metric,
           CAST((max(b) - min(b)) // 60000 + 1 AS BIGINT) AS n_expected,
           CAST(count(*) AS BIGINT) AS n_present,
           CAST((max(b) - min(b)) // 60000 + 1 - count(*) AS BIGINT)
             AS n_missing,
           CAST(coalesce(max(gap), 0) AS BIGINT) AS longest_gap_ms
    FROM d GROUP BY 1
    """,
)
def q197(spark, sf_dir):
    """Data-completeness report per metric (operators/summary.py
    gap_report): expected vs present 1m buckets over the metric's own
    active span plus the single longest gap — "did it stop, or never
    report there?" is the first on-call question of a silent metric,
    and the coverage denominator behind availability SLOs. No spine
    materialization: expected-bucket count from min/max alone (the
    fano_factor trick), one bucket-distinct + one per-series lead."""
    from ticktock_spark.operators.summary import gap_report

    return gap_report(_dps(spark, sf_dir), ["metric"], bucket_ms=MIN_MS)


@register(
    "q198_seasonal_envelope",
    f"""
    WITH b AS ({_BUCKET_MEANS_1H}),
    y AS (SELECT metric, (ts % 86400000) // 3600000 AS phase,
                 floor(v * 1000000.0 + 0.5) / 1000000.0 AS v
          FROM b),
    g AS (SELECT metric, phase, list_sort(list(v)) AS vals, count(*) AS n
          FROM y GROUP BY 1, 2),
    e AS (SELECT metric, phase, vals, n,
                 unnest([10.0, 50.0, 90.0]) AS quantile
          FROM g),
    cx AS (SELECT metric, phase, quantile, n, vals, {_R6_IDX_SQL} AS idx
           FROM e)
    SELECT metric, phase, quantile, CAST(n AS BIGINT) AS n,
           {_Q6.format(x=_R6_LIST_SQL)} AS pct
    FROM cx
    """,
)
def q198(spark, sf_dir):
    """Seasonal percentile envelope per metric (operators/robust.py
    seasonal_envelope): exact R-6 p10/p50/p90 of the hourly bucket
    means grouped by hour-of-day — the "normal for 3am" band a
    seasonal-baseline alert draws, and the p90-load-by-hour curve
    capacity plans read. q182 says WHETHER the daily profile explains a
    metric; this is the profile itself, with spread. Rank windows over
    one phase's buckets (span/period rows), never raw datapoints."""
    from ticktock_spark.operators.robust import seasonal_envelope

    d = _dps(spark, sf_dir)
    b = d.groupBy(
        "metric", (F.col("ts") - F.col("ts") % HOUR_MS).alias("ts")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("value")
    )
    return seasonal_envelope(b, ["metric"])


@register(
    "q201_rollup_error",
    f"""
    WITH f AS (
      SELECT metric, ts - ts % 3600000 AS fb,
             sum(CAST(value AS DECIMAL(18,2))) AS s, count(*) AS c
      FROM {_EV} GROUP BY 1, 2
    ),
    f2 AS (SELECT metric, fb - fb % 86400000 AS cb, s, c,
                  CAST(floor(CAST(s AS DOUBLE) / c * 1000000.0 + 0.5)
                       AS BIGINT) AS m
           FROM f),
    co AS (SELECT metric, cb,
                  CAST(sum(m) AS DOUBLE) / count(*) / 1000000.0 AS naive,
                  CAST(sum(s) AS DOUBLE) / sum(c) AS exact
           FROM f2 GROUP BY 1, 2),
    e AS (SELECT metric,
                 CAST(floor(abs(naive - exact) * 1000000.0 + 0.5) AS BIGINT)
                   AS e
          FROM co)
    SELECT metric, CAST(count(*) AS BIGINT) AS n_coarse,
           max(e) / 1000000.0 AS max_abs_err,
           {_Q6.format(
               x='(CAST(sum(e) AS DOUBLE) / count(*) / 1000000.0)')}
             AS mean_abs_err
    FROM e GROUP BY 1
    """,
)
def q201(spark, sf_dir):
    """Rollup-bias audit per metric (operators/summary.py
    rollup_error_audit): |avg-of-hourly-avgs − exact raw daily avg| per
    day, reduced to max/mean — the error a query accepts when the
    planner routes it to the hourly rollup (plans/planner.py
    rollupUsage; the reference applies the same substitution,
    tsdb.cpp rollup query path) and bucket populations are uneven.
    Read this before trusting a grain. One scan, two map-side
    groupBys, micro-unit order-free error aggregation."""
    from ticktock_spark.operators.summary import rollup_error_audit

    return rollup_error_audit(_dps(spark, sf_dir), ["metric"])


@register(
    "q202_value_precision",
    f"""
    WITH v AS (SELECT metric, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
               FROM {_EV} WHERE value IS NOT NULL),
    a AS (SELECT metric, count(*) AS n,
                 count(*) FILTER (v % 100 = 0) AS ni,
                 count(*) FILTER (v % 10 = 0) AS n1
          FROM v GROUP BY 1)
    SELECT metric, CAST(n AS BIGINT) AS n,
           {_Q6.format(x='(CAST(ni AS DOUBLE) / n)')} AS frac_integer,
           {_Q6.format(x='(CAST(n1 AS DOUBLE) / n)')} AS frac_1dp,
           {_Q6.format(x='(CAST(n - n1 AS DOUBLE) / n)')} AS frac_2dp
    FROM a
    """,
)
def q202(spark, sf_dir):
    """Value-precision histogram per metric (operators/summary.py
    value_precision_audit): fractions of values that are whole
    integers / ≤1-decimal / full 2-decimal on the value grid — the
    numbers that size a compressed store before migration (the
    reference XOR-encodes doubles, compress.cpp Compressor_v2: integer-
    valued series compress an order of magnitude tighter) and that
    justify a ks/wasserstein value_scale from data. One scan, one
    map-side groupBy."""
    from ticktock_spark.operators.summary import value_precision_audit

    return value_precision_audit(_dps(spark, sf_dir), ["metric"])


@register(
    "q203_compress_audit",
    f"""
    WITH s AS (SELECT metric, ts,
                      CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v, seq
               FROM {_EV}),
    l AS (SELECT metric,
                 ts - 2 * lag(ts, 1) OVER w + lag(ts, 2) OVER w AS dod,
                 v = lag(v, 1) OVER w AS rep
          FROM s WINDOW w AS (PARTITION BY metric ORDER BY ts, seq)),
    a AS (SELECT metric,
                 count(*) FILTER (dod IS NOT NULL) AS n_dod,
                 count(*) FILTER (dod = 0) AS n_dod0,
                 count(*) FILTER (rep IS NOT NULL) AS n_rep,
                 count(*) FILTER (rep) AS n_rep1
          FROM l GROUP BY 1)
    SELECT metric, CAST(n_dod + 2 AS BIGINT) AS n,
           {_Q6.format(x='(CAST(n_dod0 AS DOUBLE) / n_dod)')}
             AS frac_ts_regular,
           {_Q6.format(x='(CAST(n_rep1 AS DOUBLE) / n_rep)')}
             AS frac_val_repeat
    FROM a WHERE n_dod > 0
    """,
)
def q203(spark, sf_dir):
    """Gorilla-compressibility audit per metric (operators/summary.py
    compressibility_audit): fraction of points whose timestamp
    delta-of-delta is zero (regular cadence → ~1 bit/point in the
    reference's timestamp encoding, compress.cpp Compressor_v2) and
    whose value repeats exactly on the 2-decimal grid (the XOR-equal
    1-bit case) — predicts bytes/point for a TickTock-style store or
    Parquet delta/RLE encodings from a plain scan. One per-series
    ordered window (two lags share the sort), one map-side agg."""
    from ticktock_spark.operators.summary import compressibility_audit

    return compressibility_audit(
        _dps(spark, sf_dir), ["metric"], seq_col="seq"
    )
