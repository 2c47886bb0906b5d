"""Beyond-reference pipeline layer: the operations a large-scale
training-data pipeline needs, designed Spark-first for ~100 TB inputs.

Modules:
- text: language-ID, quality scoring, token counting, fingerprinting
- dedup: exact, MinHash+LSH, SimHash, n-gram Jaccard near-dup
- similarity: brute-force cosine top-k + IVF-bucketed ANN
- multimodal: opaque binary columns with typed metadata + Pandas-UDF
  decode plumbing (decode itself stubbed — media libs not in container)

Everything is expressed as declarative DataFrame transforms: no driver
collect of row data, shuffles only on bounded keys (hash buckets, band
keys, centroid ids), broadcast for small sides.
"""
