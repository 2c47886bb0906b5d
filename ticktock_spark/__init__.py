"""ticktock_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ytyou/ticktock (TickTockDB).

The reference is a single-process C++ time-series database speaking the
OpenTSDB query API (reference: /root/reference, see SURVEY.md). This package
re-expresses that capability surface Spark-first:

- canonical ``datapoints`` DataFrame (metric, ts epoch-ms, value, tags map,
  seq, dt) instead of per-series compressed pages,
- downsampling / cross-series aggregation / rate / rollup as declarative
  DataFrame plans that Catalyst optimizes (partition pruning, pushdown,
  whole-stage codegen),
- Structured Streaming for ingest + hourly rollup maintenance,
- plus a beyond-reference large-scale pipeline layer (dedup, similarity
  search, text analysis, multimodal plumbing) designed for 100 TB inputs.
"""

__version__ = "0.1.0"
