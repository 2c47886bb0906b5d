"""top/bottom-N SERIES selection.

Reference: `src/agg/aggregate.cpp:236-260,390-414` — `top<N>`/`bottom<N>`
keep the N whole series (result sets) ranked by a per-series key computed
from the LAST 3 downsampled points: max of last 3 for top, min of last 3
for bottom (`QueryTask::get_max/get_min(3)`, `src/core/query.cpp:858-884`;
n=3 per `include/query.h:265-279`).

Spark: compute the rank key per series with one aggregation over each
series' last-3 rows (max_by/min_by of a 3-element tail), take the top-N
keys (tiny — N ≤ 9), and semi-join (broadcast) back to keep those series'
points. No full sort of the data, no driver collect of points.

The input is consumed by BOTH branches (rank-key computation and the
final semi-join). Left as pure lineage, Catalyst pushes the semi-join
below the left branch's aggregation, which re-scans and re-aggregates the
raw source — at 100 TB that is two full scans. ``materialize=True``
(default) persists the (already downsampled, #series × #buckets sized)
input so the expensive scan+shuffle runs once and both branches read the
materialized result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel


def top_bottom_n(
    df: DataFrame,
    series_cols: list[str],
    n: int,
    mode: str = "top",
    ts_col: str = "ts",
    value_col: str = "value",
    last_k: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """``materialize=False`` when the caller already persists the input
    (the planner does persist+unpersist around result assembly). With
    ``materialize=True`` the cache entry lives until the returned frame
    is garbage-collected (ContextCleaner unpersists it) — long-lived
    sessions issuing many top-N queries should prefer the caller-managed
    pattern."""
    if materialize:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    w = Window.partitionBy(*series_cols).orderBy(F.col(ts_col).desc())
    tail = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= last_k)
    keyfn = F.max(value_col) if mode == "top" else F.min(value_col)
    keys = tail.groupBy(*series_cols).agg(keyfn.alias("__rank_key"))
    order = F.col("__rank_key").desc() if mode == "top" else F.col("__rank_key").asc()
    # orderBy().limit(n) plans as TakeOrderedAndProject: each partition
    # keeps its local top-n and the driver merges N·#partitions rows —
    # no single-partition exchange of ALL series keys (which a global
    # Window.orderBy row_number would force; fine at thousands of
    # series, a straggler at many millions). series_cols break ties so
    # the selection stays deterministic, matching the reference's
    # stable result-set order.
    chosen = keys.orderBy(order, *series_cols).limit(n).select(*series_cols)
    return df.join(F.broadcast(chosen), on=series_cols, how="left_semi")
