"""Gap filling for downsampled series.

Reference: fill policies none|nan|null|zero (`include/down.h:35-41`,
`src/agg/down.cpp:107-127`); gaps between emitted buckets are filled with
the policy value (down.cpp:248-311). The emitted spine covers the stepped
query range: start stepped UP to the next bucket boundary, end stepped
down, plus the trailing partial bucket (down.cpp:96-105,235-240,
`include/down.h:76-82`).

Spark: generate the bucket spine with ``sequence()`` per series (an
``explode`` of an in-memory array — no shuffle), then a left join from
spine to data on (series, bucket). The join key includes the series so it
co-partitions with the downsample output; at scale the spine side is
#series × #buckets rows, exactly the output size, so this adds one shuffle
of output-sized data at most — and AQE broadcasts it when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _step_up(ts: int, interval_ms: int) -> int:
    return ts if ts % interval_ms == 0 else (ts // interval_ms + 1) * interval_ms


def fill_buckets(
    df: DataFrame,
    series_cols: list[str],
    interval_ms: int,
    start_ms: int,
    end_ms: int,
    policy: str = "zero",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Left-join a complete bucket spine over [start, end] per series.

    ``policy``: 'zero' → 0.0, 'nan' → NaN, 'null' → NULL, 'none' → no-op.
    """
    if policy == "none" or interval_ms <= 0:
        return df
    first = _step_up(start_ms, interval_ms)
    last = end_ms - end_ms % interval_ms
    if first > last:
        return df
    series = df.select(*series_cols).distinct()
    spine = series.withColumn(
        ts_col,
        F.explode(
            F.sequence(F.lit(first), F.lit(last), F.lit(interval_ms)).cast("array<long>")
        ),
    )
    out = spine.join(df, on=[*series_cols, ts_col], how="left")
    if policy == "zero":
        fill_val = F.lit(0.0)
    elif policy == "nan":
        fill_val = F.lit(float("nan"))
    else:  # 'null'
        fill_val = F.lit(None).cast("double")
    return out.withColumn(value_col, F.coalesce(F.col(value_col), fill_val))
