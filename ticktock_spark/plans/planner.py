"""Query planner: QuerySpec → DataFrame pipeline → result sets.

Mirrors the reference lifecycle (`src/core/query.cpp:556-570,954-1305`):

  scan(datapoints | rollup_1h | rollup_1d)
    → filter(metric, ts range, tag predicates, explicit_tags)   [§2.3]
    → dedup last-wins on ingest seq                             [§1.3]
    → per-series downsample (+ fill spine)                      [§2.5]
    → cross-series aggregate by grouping-tag values             [§2.6]
    → rate                                                      [§2.7]

Catalyst supplies partition pruning/pushdown/codegen; the three planner
decisions the reference hand-rolls — rollup routing with interval
snapping (`query.cpp:1032-1091`), fill-spine generation, and last-wins
dedup — are explicit steps here.

Series identity: the canonical sorted "k=v,..." tag string (same as the
reference's canonical tag string, `include/tag.h:46-132`). Grouping-tag
VALUES are materialized as columns before aggregation so both groupBys
stay plain hash aggregations.

Scale notes: result assembly collects only aggregated result sets and a
distinct series-metadata list (bounded by series cardinality), never raw
points. Everything before that is distributed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ticktock_spark.operators.downsample import bucket_expr, downsample_agg_expr
from ticktock_spark.operators.aggregate import aggregator_expr
from ticktock_spark.operators.dedup import dedup_last_wins
from ticktock_spark.operators.fill import fill_buckets
from ticktock_spark.operators.rate import rate as rate_op
from ticktock_spark.operators.rollup import (
    HOUR_MS,
    DAY_MS,
    ROLLUP_FUNCS,
    build_rollup,
    snap_interval,
)
from ticktock_spark.operators.topn import top_bottom_n
from ticktock_spark.plans.spec import QuerySpec, TopLevelQuery
from ticktock_spark.plans.tagfilter import compile_tag_filters

SERIES_KEY = "__series"


def canonical_series_key(tags_col: F.Column) -> F.Column:
    """Sorted 'k=v,k=v' canonical tag string (series identity)."""
    entries = F.array_sort(F.map_entries(tags_col))
    return F.concat_ws(
        ",", F.transform(entries, lambda e: F.concat_ws("=", e["key"], e["value"]))
    )


@dataclass
class ResultSet:
    metric: str
    tags: dict[str, str]
    aggregate_tags: list[str]
    dps: dict[int, float]


class TsdbContext:
    """Holds the canonical datapoints DataFrame and optional rollup
    materializations; executes QuerySpecs against them."""

    def __init__(
        self,
        datapoints: DataFrame,
        rollup_1h: DataFrame | None = None,
        rollup_1d: DataFrame | None = None,
        rollup_invalid_dts: set[str] | None = None,
    ):
        self.datapoints = datapoints
        self.rollup_1h = rollup_1h
        self.rollup_1d = rollup_1d
        # day partitions whose rollups may not be used (late/OOO data
        # arrived after the rollup flush — can_use_rollup, tsdb.h:264-266);
        # ISO date strings matching the `dt` partition column
        self.rollup_invalid_dts = rollup_invalid_dts or set()

    # -- rollup maintenance (batch recompute; streaming variant in
    #    streaming/rollup.py) --
    def materialize_rollups(self) -> None:
        base = self.datapoints.withColumn(SERIES_KEY, canonical_series_key(F.col("tags")))
        # NB: map columns can't go through distinct(); groupBy+first gives
        # the same series dimension table
        series_dim = base.groupBy("metric", SERIES_KEY).agg(F.first("tags").alias("tags"))
        r1h = build_rollup(base, ["metric", SERIES_KEY], HOUR_MS).join(
            series_dim, ["metric", SERIES_KEY]
        )
        self.rollup_1h = r1h
        from ticktock_spark.operators.rollup import rollup_daily_from_hourly

        self.rollup_1d = rollup_daily_from_hourly(r1h, ["metric", SERIES_KEY]).join(
            series_dim, ["metric", SERIES_KEY]
        )

    # -- planning --

    def _base_scan(self, spec: QuerySpec, start_ms: int, end_ms: int) -> DataFrame:
        df = self.datapoints
        pred = (F.col("metric") == spec.metric) & F.col("ts").between(start_ms, end_ms)
        if spec.tags:
            pred = pred & compile_tag_filters(F.col("tags"), spec.tags, spec.explicit_tags)
        out = df.filter(pred)
        if "dt" in df.columns:
            # redundant with ts but lets Catalyst prune day partitions,
            # mirroring Tsdb::insts binary search (tsdb.cpp:2259-2322)
            out = out.filter(
                F.col("dt").between(
                    F.from_unixtime(F.lit(start_ms // 1000)).cast("date"),
                    F.from_unixtime(F.lit(end_ms // 1000)).cast("date"),
                )
            )
        return out

    def _rollup_scan(
        self, spec: QuerySpec, start_ms: int, end_ms: int, interval_ms: int, func: str
    ) -> tuple[DataFrame, int] | None:
        """Choose rollup table + snapped interval (query.cpp:1032-1091)."""
        if spec.rollup_usage == "ROLLUP_RAW" or func not in ROLLUP_FUNCS:
            return None
        table, unit = None, None
        if interval_ms >= DAY_MS and self.rollup_1d is not None:
            table, unit = self.rollup_1d, DAY_MS
        elif interval_ms >= HOUR_MS and self.rollup_1h is not None:
            table, unit = self.rollup_1h, HOUR_MS
        if table is None:
            return None
        snapped = snap_interval(interval_ms, unit)
        pred = (F.col("metric") == spec.metric) & F.col("bucket_ts").between(
            start_ms, end_ms
        )
        if spec.tags:
            pred = pred & compile_tag_filters(F.col("tags"), spec.tags, spec.explicit_tags)
        scan = table.filter(pred)
        if "dt" in table.columns:
            # persisted rollup tables (maintenance.persisted_rollup_1h) are
            # day-partitioned: the redundant dt bound turns the ts range
            # into partition pruning, mirroring _base_scan's dt filter
            scan = scan.filter(
                F.col("dt").between(
                    F.from_unixtime(F.lit(start_ms // 1000)).cast("date"),
                    F.from_unixtime(F.lit(end_ms // 1000)).cast("date"),
                )
            )
        if self.rollup_invalid_dts:
            scan = self._splice_raw_fallback(scan, spec, start_ms, end_ms, unit)
        return scan, snapped

    def _splice_raw_fallback(
        self, scan: DataFrame, spec: QuerySpec, start_ms: int, end_ms: int, unit: int
    ) -> DataFrame:
        """ROLLUP_FALLBACK_RAW splice (query.cpp:1109-1238): rollup rows
        from invalidated day partitions are dropped and replaced by an
        equivalent re-aggregation of the raw points of those days, unioned
        into the same (bucket_ts, cnt, min, max, sum) stream. A rollup
        bucket (1h/1d) never crosses a day boundary, so day(bucket_ts)
        identifies the partition that produced it. The raw branch prunes
        on the `dt` partition column, so at scale it scans only the
        invalidated days — everything else stays on the rollup table."""
        invalid = sorted(self.rollup_invalid_dts)
        # on a persisted (day-partitioned) rollup table the NOT-IN over the
        # dt partition column is partition pruning; unpartitioned in-memory
        # rollups fall back to deriving the day from bucket_ts
        bucket_day = (
            F.col("dt")
            if "dt" in scan.columns
            else F.to_date(F.timestamp_millis(F.col("bucket_ts")))
        )
        valid = scan.filter(~bucket_day.isin(invalid))

        raw = self._base_scan(spec, start_ms, end_ms)
        day_col = (
            F.col("dt")
            if "dt" in raw.columns
            else F.to_date(F.timestamp_millis(F.col("ts")))
        )
        raw = raw.filter(day_col.isin(invalid))
        raw = raw.withColumn(SERIES_KEY, canonical_series_key(F.col("tags")))
        if "seq" in raw.columns:
            raw = dedup_last_wins(raw, ["metric", SERIES_KEY], seq_col="seq")
        # tags ride inside the SAME aggregation instead of a separate
        # series-dim scan + join: the series key is DERIVED from the tag
        # map (canonical_series_key), so every row of a (metric, series)
        # group carries the identical map and first() is exact — one scan
        # of the invalidated partitions, not two
        from ticktock_spark.operators.downsample import bucket_expr

        v = F.col("value")
        re_agg = raw.groupBy(
            "metric", SERIES_KEY, bucket_expr("ts", unit).alias("bucket_ts")
        ).agg(
            F.count(v).alias("cnt"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.sum(v).alias("sum"),
            F.first("tags").alias("tags"),
        )
        cols = ["metric", SERIES_KEY, "bucket_ts", "cnt", "min", "max", "sum", "tags"]
        return valid.select(*cols).unionByName(re_agg.select(*cols))

    @staticmethod
    def _stepped_range(start_ms: int, end_ms: int, interval_ms: int) -> tuple[int, int]:
        """Reference downsample range stepping (down.cpp:96-105,235-240;
        down.h:76-82): the scan starts at the first bucket boundary ≥
        start (the leading partial bucket is dropped) and extends to the
        END of the bucket containing `end` (trailing dps beyond `end`
        complete the last bucket)."""

        def step_up(t: int) -> int:
            t -= 1
            return t - t % interval_ms + interval_ms

        first = step_up(start_ms)
        toe = step_up(end_ms)
        to = end_ms if toe == end_ms else toe - 1
        scan_hi = to + interval_ms - 1 if to % interval_ms == 0 else to
        return first, scan_hi

    def _downsampled_series(
        self, spec: QuerySpec, start_ms: int, end_ms: int, group_keys: list[str]
    ) -> tuple[DataFrame, bool]:
        """→ (df with [SERIES_KEY, grouping-value cols, ts, value, __tags],
        did_downsample).

        ``__tags`` (the series' tag map, F.first through every
        aggregation) rides along so result assembly never needs a second
        scan of the base table for series metadata — the old
        ``_series_meta`` re-ran ``_base_scan`` per query, which at 100×
        scale doubles every HTTP query's IO."""
        ds = spec.downsample_parts()
        gcols = {f"__g{i}": k for i, k in enumerate(group_keys)}

        if ds is not None:
            interval_ms, func, fill = ds
            if interval_ms > 0:
                start_ms, end_ms = self._stepped_range(start_ms, end_ms, interval_ms)
            routed = self._rollup_scan(spec, start_ms, end_ms, interval_ms, func)
            if routed is not None:
                table, snapped = routed
                grp = table.withColumns(
                    {c: F.col("tags").getItem(k) for c, k in gcols.items()}
                ).groupBy(
                    SERIES_KEY,
                    *gcols,
                    bucket_expr("bucket_ts", snapped).alias("ts"),
                )
                tags_agg = F.first("tags").alias("__tags")
                # sums are cast to double AFTER the final re-aggregation:
                # with DECIMAL-valued rollups the Σ stays exact and the
                # one deterministic decimal→double cast keeps results
                # bit-identical across engines (see queries.q26/q27)
                if func == "avg":
                    out = grp.agg(
                        (F.sum("sum").cast("double") / F.sum("cnt")).alias("value"),
                        tags_agg,
                    )
                elif func == "count":
                    out = grp.agg(F.sum("cnt").cast("double").alias("value"), tags_agg)
                elif func == "min":
                    out = grp.agg(F.min("min").cast("double").alias("value"), tags_agg)
                elif func == "max":
                    out = grp.agg(F.max("max").cast("double").alias("value"), tags_agg)
                else:
                    out = grp.agg(F.sum("sum").cast("double").alias("value"), tags_agg)
                return out, True

        base = self._base_scan(spec, start_ms, end_ms)
        base = base.withColumn(SERIES_KEY, canonical_series_key(F.col("tags")))
        if "seq" in base.columns:
            base = dedup_last_wins(base, ["metric", SERIES_KEY], seq_col="seq")
        base = base.withColumns({c: F.col("tags").getItem(k) for c, k in gcols.items()})

        if ds is None:
            return (
                base.select(
                    SERIES_KEY, *gcols, "ts", "value", F.col("tags").alias("__tags")
                ),
                False,
            )

        interval_ms, func, fill = ds
        keys = [SERIES_KEY, *gcols]
        if interval_ms == 0:
            # 0all emits ONE bucket at the ORIGINAL query start:
            # step_down is m_start for m_all (down.cpp:51,245)
            from ticktock_spark.operators.downsample import (
                parse_quantile,
                percentile_r6_distributed,
            )

            q = parse_quantile(func)
            if q is not None:
                # 0all is the one HTTP query shape whose group holds the
                # ENTIRE range per series — the collect_list percentile
                # would buffer it all in one agg; route to the
                # distributed-selection twin (single scan, spillable
                # sort, identical R-6 values — equivalence-pinned)
                out = percentile_r6_distributed(
                    base, keys, q, 0, carry_cols=["tags"]
                ).select(
                    *keys, "value", F.col("tags").alias("__tags")
                ).withColumn("ts", F.lit(start_ms))
            else:
                out = base.groupBy(*keys).agg(
                    downsample_agg_expr(func).alias("value"),
                    F.first("tags").alias("__tags"),
                ).withColumn("ts", F.lit(start_ms))
        else:
            out = base.groupBy(*keys, bucket_expr("ts", interval_ms).alias("ts")).agg(
                downsample_agg_expr(func).alias("value"),
                F.first("tags").alias("__tags"),
            )
            if fill != "none":
                # fill's left join leaves __tags NULL in gap rows; meta
                # derivation uses first(ignorenulls)
                out = fill_buckets(out, keys, interval_ms, start_ms, end_ms, fill)
        return out, True

    def execute(self, top: TopLevelQuery) -> list[ResultSet]:
        out: list[ResultSet] = []
        for spec in top.subqueries:
            out.extend(self._execute_one(spec, top))
        return out

    def _execute_one(self, spec: QuerySpec, top: TopLevelQuery) -> list[ResultSet]:
        group_keys = sorted(set(spec.tags) - set(spec.non_grouping_tags))
        agg = spec.aggregator or "none"
        topn_mode = None
        if agg.startswith(("top", "bottom")) and agg[-1].isdigit():
            topn_mode = ("top" if agg.startswith("top") else "bottom", int(agg.lstrip("topbtm") or agg[-1]))

        ds, did_ds = self._downsampled_series(spec, top.start_ms, top.end_ms, group_keys)
        gcols = [c for c in ds.columns if c.startswith("__g")]

        # ONE scan of the base table per query: the per-series frame
        # (#series × #buckets rows — bounded by the result size, never raw
        # points for downsampled queries) is persisted so the result
        # aggregation and the series-metadata derivation both read it
        # instead of re-running the scan+downsample lineage.
        from pyspark.storagelevel import StorageLevel

        ds = ds.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            per_series = agg == "none" or topn_mode is not None
            if per_series:
                if topn_mode is not None:
                    mode, n = topn_mode
                    ds_sel = top_bottom_n(
                        ds, [SERIES_KEY], n, mode, materialize=False
                    )
                else:
                    ds_sel = ds
                result_df = ds_sel.select(SERIES_KEY, "ts", "value")
                key_cols = [SERIES_KEY]
            else:
                result_df = ds.groupBy(*gcols, "ts").agg(
                    aggregator_expr(agg).alias("value")
                )
                key_cols = gcols

            # series metadata (tags maps) — tiny, bounded by series
            # cardinality; read from the persisted frame, not a re-scan
            # driver-bound: one tags row per series (dimension-scale)
            meta_rows = (
                ds.groupBy(SERIES_KEY)
                .agg(F.first("__tags", ignorenulls=True).alias("tags"))
                .collect()
            )
            meta = {r[SERIES_KEY]: dict(r["tags"] or {}) for r in meta_rows}
            # driver-bound: the query's result rows — the response payload itself
            rows = result_df.collect()
        finally:
            ds.unpersist()
        groups: dict[tuple, dict[int, float]] = {}
        for r in rows:
            key = tuple(r[c] for c in key_cols)
            groups.setdefault(key, {})[int(r["ts"])] = r["value"]

        results: list[ResultSet] = []
        for key, dps in groups.items():
            if per_series:
                series_tags = meta.get(key[0], {})
                tags_out, agg_tags = dict(series_tags), []
            else:
                members = [
                    t
                    for sk, t in meta.items()
                    if all(t.get(k) == v for k, v in zip(group_keys, key))
                ]
                tags_out, agg_tags = _merge_member_tags(members)
            if spec.rate:
                dps = _rate_py(dps, spec.rate_options)
                if not dps:
                    continue  # empty result sets dropped (query.cpp:1616-1618)
            if not dps:
                continue
            if not top.ms_resolution:
                dps = {ts // 1000: v for ts, v in sorted(dps.items())}
            results.append(ResultSet(spec.metric, tags_out, agg_tags, dict(sorted(dps.items()))))

        # stable sort by tag list (query.cpp:459-467)
        results.sort(key=lambda rs: sorted(rs.tags.items()))
        return results


def _merge_member_tags(members: list[dict]) -> tuple[dict, list]:
    """Constant tags stay; varying/missing keys → aggregateTags
    (query.cpp:1683-1738)."""
    if not members:
        return {}, []
    all_keys: set[str] = set()
    for m in members:
        all_keys.update(m)
    tags_out, agg_tags = {}, []
    for k in sorted(all_keys):
        vals = {m.get(k) for m in members}
        if len(vals) == 1 and None not in vals:
            tags_out[k] = next(iter(vals))
        else:
            agg_tags.append(k)
    return tags_out, agg_tags


def _rate_py(dps: dict[int, float], ro) -> dict[int, float]:
    """Driver-side rate for already-collected result sets (small); the
    distributed version is operators/rate.py. Same semantics
    (rate.cpp:38-92)."""
    items = sorted(dps.items())
    out: dict[int, float] = {}
    for (t0, v0), (t1, v1) in zip(items, items[1:]):
        dt = (t1 - t0) / 1000.0
        delta = v1 - v0
        if ro.counter and delta < 0:
            if ro.drop_resets:
                continue
            r = (float(ro.counter_max) - v0 + v1) / dt
            out[t1] = 0.0 if (ro.reset_value and r > ro.reset_value) else r
        else:
            out[t1] = delta / dt
    return out
