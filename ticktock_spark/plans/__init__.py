from ticktock_spark.plans.spec import QuerySpec, RateOptions
from ticktock_spark.plans.parser import parse_m_expr, parse_query_params, parse_query_json
from ticktock_spark.plans.planner import TsdbContext

__all__ = [
    "QuerySpec",
    "RateOptions",
    "parse_m_expr",
    "parse_query_params",
    "parse_query_json",
    "TsdbContext",
]
