"""Query parsers: the GET `m=` mini-language and the POST JSON body.

Grammar (comment at `src/core/query.cpp:172-174`):

  m=<aggregator>:[rate[{counter[,<counter_max>[,<reset_value>[,<drop>]]}]:]
    [<downsample>:][explicit_tags:][rollupUsage=...:]<metric>
    [{<grouping filters>}][{<non-grouping filters>}]

POST body (`query.cpp:54-170,1346-1453`): shared start/end/tz/ms plus an
array `queries` of {metric, aggregator, downsample, rate, rateOptions,
tags}.

Faithful quirks kept: GET rate-option slot 3 (dropResets) is parsed from
opts[2]'s first char and only when opts[2] is non-empty — the reference
reads opts[2] there, not opts[3] (`query.cpp:280-283`).
"""

from __future__ import annotations

import urllib.parse

from ticktock_spark.plans.spec import QuerySpec, RateOptions, TopLevelQuery
from ticktock_spark.timeparse import parse_time

_UINT64_MAX = (1 << 64) - 1


def _parse_tag_group(s: str) -> dict[str, str]:
    """`{k1=v1,k2=v2}` → dict (values may be filter expressions)."""
    s = s.strip()
    if s.startswith("{"):
        s = s[1:]
    if s.endswith("}"):
        s = s[:-1]
    out: dict[str, str] = {}
    if not s:
        return out
    # split on commas NOT inside (...) — literal_or(a|b,c) style values
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    for part in parts:
        k, _, v = part.partition("=")
        k, v = k.strip().strip('"'), v.strip().strip('"')
        if k:
            out[k] = v
    return out


def parse_m_expr(m: str) -> QuerySpec:
    m = urllib.parse.unquote(m)
    tokens = m.split(":")
    if len(tokens) < 2:
        raise ValueError(f"failed to parse query: {m!r}")
    spec = QuerySpec(metric="", aggregator=tokens[0])
    idx = 1
    while idx < len(tokens) - 1:
        token = tokens[idx]
        idx += 1
        if token.startswith("rate{"):
            opts = token[5:].rstrip("}").split(",")
            ro = RateOptions(counter_max=_UINT64_MAX)
            if len(opts) > 0 and opts[0]:
                ro.counter = opts[0][0] in "tT"
            if len(opts) > 1 and opts[1]:
                ro.counter_max = int(opts[1])
            if len(opts) > 2 and opts[2]:
                ro.reset_value = int(opts[2])
            if len(opts) > 3 and opts[2]:
                # reference quirk: reads opts[2], guarded by opts[2]
                ro.drop_resets = opts[2][0] in "tT"
            spec.rate, spec.rate_options = True, ro
        elif token.startswith("rate"):
            spec.rate = True
            spec.rate_options = RateOptions(counter_max=_UINT64_MAX)
        elif token.startswith("percentiles["):
            pass  # reference logs "not supported" and ignores
        elif token == "explicit_tags":
            spec.explicit_tags = True
        elif token.startswith("rollupUsage="):
            v = token[len("rollupUsage=") :]
            if v in ("ROLLUP_RAW", "ROLLUP_FALLBACK_RAW"):
                spec.rollup_usage = v
        else:
            spec.downsample = token
    metric = tokens[-1]
    brace = metric.find("{")
    if brace >= 0:
        rest = metric[brace:]
        spec.metric = metric[:brace]
        close = rest.find("}")
        spec.tags = _parse_tag_group(rest[: close + 1])
        rest2 = rest[close + 1 :]
        if rest2.startswith("{"):
            ng = _parse_tag_group(rest2)
            spec.non_grouping_tags = ng
            spec.tags.update(ng)  # reference adds them to the filter set too
    else:
        spec.metric = metric
    return spec


def parse_query_params(params: dict[str, str | list[str]], now_ms: int | None = None) -> TopLevelQuery:
    """GET /api/query parameters → TopLevelQuery."""

    def one(key: str) -> str | None:
        v = params.get(key)
        if isinstance(v, list):
            return v[0] if v else None
        return v

    tz = one("tz")
    start = one("start")
    if start is None:
        raise ValueError("Must specify start time when query.")
    import time as _time

    now = now_ms if now_ms is not None else int(_time.time() * 1000)
    start_ms = parse_time(start, now, tz)
    end = one("end")
    end_ms = parse_time(end, now, tz) if end is not None else now
    ms_res = one("msResolution")
    ms = (ms_res is not None and str(ms_res).lower() not in ("false", "0")) or (
        "ms" in params
    )
    mvals = params.get("m", [])
    if isinstance(mvals, str):
        mvals = [mvals]
    subs = [parse_m_expr(m) for m in mvals]
    if not subs:
        raise ValueError("Must specify m parameter when query.")
    return TopLevelQuery(start_ms, end_ms, ms, tz, subs)


def parse_query_json(body: dict, now_ms: int | None = None) -> TopLevelQuery:
    """POST /api/query body → TopLevelQuery."""
    import time as _time

    now = now_ms if now_ms is not None else int(_time.time() * 1000)
    tz = body.get("tz")
    if "start" not in body:
        raise ValueError("Must specify start time when query.")
    start_ms = parse_time(body["start"], now, tz)
    end_ms = parse_time(body["end"], now, tz) if "end" in body else now
    ms = bool(body.get("msResolution", body.get("ms", False)))
    subs: list[QuerySpec] = []
    for q in body.get("queries", []):
        if "metric" not in q:
            raise ValueError("Must specify metric name when query.")
        spec = QuerySpec(
            metric=q["metric"],
            aggregator=q.get("aggregator", "none"),
            downsample=q.get("downsample"),
            tags=dict(q.get("tags", {})),
        )
        if q.get("rate"):
            ro = q.get("rateOptions", {})
            spec.rate = True
            spec.rate_options = RateOptions(
                counter=bool(ro.get("counter", False)),
                drop_resets=bool(ro.get("dropResets", False)),
                counter_max=int(ro.get("counterMax", _UINT64_MAX)),
                reset_value=int(ro.get("resetValue", 0)),
            )
        if q.get("explicitTags"):
            spec.explicit_tags = True
        if q.get("rollupUsage") in ("ROLLUP_RAW", "ROLLUP_FALLBACK_RAW"):
            spec.rollup_usage = q["rollupUsage"]
        subs.append(spec)
    return TopLevelQuery(start_ms, end_ms, ms, tz, subs)
