"""OpenTSDB JSON response shaping.

Matches `src/core/query.cpp:1604-1659,1767-1796`: a JSON array of
  {"metric": ..., "tags": {...}, "aggregateTags": [...],
   "dps": {"<ts>": <value>, ...}}
with NaN/Inf serialized as "NaN"/"Inf" strings (query.cpp:1782-1787) and
empty result sets dropped (query.cpp:1616-1618).
"""

from __future__ import annotations

import json
import math

from ticktock_spark.plans.planner import ResultSet


def _val(v: float):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NaN"
    if isinstance(v, float) and math.isinf(v):
        return "Inf" if v > 0 else "-Inf"
    return v


def resultset_to_dict(rs: ResultSet) -> dict:
    return {
        "metric": rs.metric,
        "tags": rs.tags,
        "aggregateTags": rs.aggregate_tags,
        "dps": {str(ts): _val(v) for ts, v in rs.dps.items()},
    }


def results_to_json(results: list[ResultSet]) -> str:
    return json.dumps(
        [resultset_to_dict(rs) for rs in results if rs.dps], separators=(",", ":")
    )
