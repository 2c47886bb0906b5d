"""As-of (most-recent-prior) join.

The reference has no join surface at all (SURVEY §2.12), but "latest
right-side value at or before each left timestamp" is the canonical
time-series enrichment op (DuckDB/Pandas ASOF JOIN, kdb+ aj) and a
training-data staple (attach the latest label/price/config snapshot to
every example). Implemented Spark-first as a union + running last_value
window rather than a per-key loop or a range cross-join:

    union(left tagged side=1, right tagged side=0)
      → window PARTITION BY key ORDER BY (ts, side, seq)
        last(value, ignorenulls=True) ROWS UNBOUNDED PRECEDING
      → keep side=1 rows

Scale shape: ONE shuffle on the join key (the same exchange a sort-merge
join would pay), no broadcast, no per-key collect; within a partition the
window is a single ordered pass, so cost is O(n log n) sort per key
group. Skewed keys behave exactly like any window op (AQE cannot split a
single key's frame — pre-split pathological keys by time range first, as
with sessionization). Equal timestamps: right rows sort BEFORE left rows
(side 0 < 1), so the match is inclusive (r.ts <= l.ts); ties among right
rows resolve by ``seq_col`` ascending — the LAST (highest-seq) duplicate
wins, matching the engine's last-wins dedup semantics
(/root/reference/src/core/query.cpp:771-787).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    ts_col: str = "ts",
    seq_col: str | None = None,
    tolerance: int | None = None,
    right_ts_name: str = "right_ts",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    with the same key and ``right.ts <= left.ts`` (within ``tolerance``
    ts units if given). Left rows with no match keep nulls.

    Output: all left columns + value_cols + ``right_ts_name`` (the
    matched right timestamp, null when unmatched). ``ts_col`` must be an
    orderable numeric/timestamp column present in both sides; duplicate
    right (key, ts) rows are resolved by ``seq_col`` (last wins) — pass
    one whenever the right side can contain such duplicates, otherwise
    the pick is nondeterministic.
    """
    overlap = [c for c in value_cols if c in left.columns]
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {overlap}")
    left_payload = [c for c in left.columns if c not in key_cols]

    lhs = left.select(
        *key_cols,
        *left_payload,
        F.lit(1).alias("__side"),
        (F.col(seq_col) if seq_col and seq_col in left.columns else F.lit(0)).alias(
            "__seq"
        ),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(dict(right.dtypes)[ts_col]).alias("__r_ts"),
    )
    rhs = right.select(
        *key_cols,
        *[
            F.col(ts_col)
            if c == ts_col
            else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left_payload
        ],
        F.lit(0).alias("__side"),
        (F.col(seq_col) if seq_col else F.lit(0)).alias("__seq"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(ts_col).alias("__r_ts"),
    )

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "__side", "__seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs)
    for c in value_cols:
        carried = carried.withColumn(f"__r_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    carried = carried.withColumn("__r_ts", F.last("__r_ts", ignorenulls=True).over(w))

    out = carried.filter(F.col("__side") == 1)
    in_tol: Column = F.lit(True)
    if tolerance is not None:
        in_tol = (F.col(ts_col) - F.col("__r_ts")) <= F.lit(tolerance)
    keep = F.col("__r_ts").isNotNull() & in_tol
    sel = [*key_cols, *left_payload]
    sel += [F.when(keep, F.col(f"__r_{c}")).alias(c) for c in value_cols]
    sel += [F.when(keep, F.col("__r_ts")).alias(right_ts_name)]
    return out.select(*sel)
