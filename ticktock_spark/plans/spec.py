"""QuerySpec — the query IR.

Mirrors the reference's Query object (`include/query.h:125-181`): time
range + per-sub-query metric, aggregator, downsample spec, rate options,
tag filters (grouping + non-grouping), explicit_tags, rollup usage.
"""

from __future__ import annotations

from dataclasses import dataclass, field


UINT64_MAX = 18446744073709551615


@dataclass
class RateOptions:
    counter: bool = False
    drop_resets: bool = False
    # reference defaults (query.cpp:119-120): counterMax = UINT64_MAX —
    # float() of it is exactly 2^64, the same double the C++ cast yields —
    # and resetValue = 0 means disabled (rate.cpp:68: m_reset_value != 0)
    counter_max: int = UINT64_MAX
    reset_value: int = 0


@dataclass
class QuerySpec:
    metric: str
    aggregator: str = "none"
    downsample: str | None = None  # "<interval><unit>-<func>[-<fill>]"
    rate: bool = False
    rate_options: RateOptions = field(default_factory=RateOptions)
    tags: dict[str, str] = field(default_factory=dict)  # grouping filters
    non_grouping_tags: dict[str, str] = field(default_factory=dict)
    explicit_tags: bool = False
    rollup_usage: str = "ROLLUP_FALLBACK_RAW"  # or ROLLUP_RAW

    def downsample_parts(self) -> tuple[int, str, str] | None:
        """→ (interval_ms, func, fill_policy) or None."""
        if not self.downsample:
            return None
        from ticktock_spark.timeparse import parse_interval_ms

        parts = self.downsample.split("-")
        if len(parts) < 2:
            raise ValueError(f"bad downsample spec: {self.downsample!r}")
        interval = parse_interval_ms(parts[0])
        func = parts[1]
        fill = parts[2] if len(parts) > 2 else "none"
        return interval, func, fill


@dataclass
class TopLevelQuery:
    """start/end/tz/ms + sub-queries (POST body or GET params)."""

    start_ms: int
    end_ms: int
    ms_resolution: bool = False
    tz: str | None = None
    subqueries: list[QuerySpec] = field(default_factory=list)
