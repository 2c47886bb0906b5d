from ticktock_spark.operators.downsample import bucket_expr, downsample, percentile_r6_on_array
from ticktock_spark.operators.aggregate import aggregate_across_series
from ticktock_spark.operators.rate import rate
from ticktock_spark.operators.topn import top_bottom_n
from ticktock_spark.operators.dedup import dedup_last_wins
from ticktock_spark.operators.fill import fill_buckets
from ticktock_spark.operators.rollup import build_rollup, downsample_from_rollup

__all__ = [
    "bucket_expr",
    "downsample",
    "percentile_r6_on_array",
    "aggregate_across_series",
    "rate",
    "top_bottom_n",
    "dedup_last_wins",
    "fill_buckets",
    "build_rollup",
    "downsample_from_rollup",
]
