"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    import ticktock_spark.queries as q
    import ticktock_spark.pipeline.queries  # noqa: F401 — registers q3x/q4x

    return q


def _verified_history() -> tuple[set[str], set[str], set[str], dict]:
    """(green-in-latest, red-in-latest, ever-verified, last-seen-round)
    from CORRECTNESS_r{N}.json. The driver verifies a 50-entry window of
    the registry in iteration order, so ordering is coverage policy:
    never-verified entries go absolutely first (no driver evidence at
    all), then entries that were attempted but NOT green last round
    (they must re-prove immediately — a red row left outside the window
    stays red forever), then entries merely absent from the latest
    round — STALEST FIRST by the round they last appeared in, so the
    window always burns the oldest rotation debt — then the
    recently-proven rest. Everything rotated out stays pinned locally
    by tests/test_oracle.py, which runs ALL entries against DuckDB."""
    import glob
    import json
    import os

    def _green(rec) -> bool:
        # full oracle pass, or the driver's weaker rows-only pass for
        # deliberately oracle-free entries (err == "no_oracle" is NOT
        # green: it means the check could not pin values).
        return isinstance(rec, dict) and rec.get("err") is None and (
            rec.get("hash_match") is True or rec.get("rows_match") is True
        )

    files = sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "CORRECTNESS_r*.json"))
    )
    green: set[str] = set()
    red: set[str] = set()
    ever: set[str] = set()
    last_seen: dict[str, int] = {}
    for i, path in enumerate(files):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        ever |= set(data)
        for k in data:
            last_seen[k] = i
        if i == len(files) - 1:
            green = {k for k, rec in data.items() if _green(rec)}
            red = set(data) - green
    return green, red, ever, last_seen


def _reorder(mapping: dict) -> dict:
    green, red, ever, last_seen = _verified_history()
    never = {k: v for k, v in mapping.items() if k not in ever}
    failed = {k: v for k, v in mapping.items() if k in red and k not in never}
    rotated_names = sorted(
        (k for k in mapping if k in ever and k not in green and k not in red),
        key=lambda k: last_seen.get(k, -1),
    )
    rotated = {k: mapping[k] for k in rotated_names}
    rest = {k: v for k, v in mapping.items() if k in green}
    return {**never, **failed, **rotated, **rest}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full TSDB pipeline
    m=sum:1m-avg:click — dedup → downsample → cross-series aggregate."""
    return _registry().QUERIES["q06_agg_sum_of_avg_1m"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _reorder(dict(_registry().QUERIES))


def oracle_sql() -> dict[str, str]:
    return _reorder(dict(_registry().ORACLES))
