"""Tag filter compiler: OpenTSDB filter value strings → Column predicates.

Mirrors `src/utils/tag.cpp:692-796` (TagMatcher::init). The reference
compiles every non-literal filter to a regex evaluated with regex_match
(FULL match) against the tag value; missing tag → no match. Dispatch
order matters and is preserved:

  literal_or(...) | iliteral_or(...) | not_literal_or(...) |
  not_iliteral_or(...) | wildcard(...) | iwildcard(...) | regexp(...) |
  trailing '*' glob | 'a|b' alternation | plain literal

replace_stars (tag.cpp:798-821): '.' escaped, '*' → '.*'.
not_literal_or (tag.cpp:826-851): negative lookahead '(?!a$|b$)(.*)'.

Spark's rlike is a substring search, so compiled patterns are anchored
with ^(?:...)$ to reproduce regex_match. regexp(...) uses POSIX *basic*
regex in the reference; Java regex is a superset for the common cases —
documented divergence for BRE-only metacharacter quirks.

These predicates are plain Column expressions: Catalyst pushes the
conjunction into the scan where possible and everything stays in
whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F


def _glob_to_regex(pat: str) -> str:
    return pat.replace(".", r"\.").replace("*", ".*")


def _full_match(value: Column, pattern: str, case_insensitive: bool = False) -> Column:
    prefix = "(?i)" if case_insensitive else ""
    return value.rlike(f"{prefix}^(?:{pattern})$")


def compile_tag_filter(value: Column, filter_expr: str) -> Column:
    """Predicate for one tag filter; NULL tag value never matches."""
    fe = filter_expr

    def inner(fn: str) -> str:
        return fe[len(fn) + 1 : -1]

    if fe.startswith("literal_or(") and fe.endswith(")"):
        pred = _full_match(value, inner("literal_or"))
    elif fe.startswith("iliteral_or(") and fe.endswith(")"):
        pred = _full_match(value, inner("iliteral_or"), True)
    elif fe.startswith("not_literal_or(") and fe.endswith(")"):
        pred = ~_full_match(value, inner("not_literal_or"))
    elif fe.startswith("not_iliteral_or(") and fe.endswith(")"):
        pred = ~_full_match(value, inner("not_iliteral_or"), True)
    elif fe.startswith("wildcard(") and fe.endswith(")"):
        pred = _full_match(value, _glob_to_regex(inner("wildcard")))
    elif fe.startswith("iwildcard(") and fe.endswith(")"):
        pred = _full_match(value, _glob_to_regex(inner("iwildcard")), True)
    elif fe.startswith("regexp(") and fe.endswith(")"):
        pred = _full_match(value, inner("regexp"))
    elif fe.endswith("*"):
        pred = _full_match(value, _glob_to_regex(fe))
    elif "|" in fe:
        pred = _full_match(value, fe)
    else:
        pred = value == F.lit(fe)
    return value.isNotNull() & pred


def compile_tag_filters(
    tags_col: Column, filters: dict[str, str], explicit_tags: bool = False
) -> Column:
    """AND of per-key predicates over a MAP<STRING,STRING> column
    (tag.cpp:853-873); explicit_tags additionally pins the tag COUNT
    (tsdb.cpp:736-737)."""
    pred = F.lit(True)
    for k, v in filters.items():
        pred = pred & compile_tag_filter(tags_col.getItem(k), v)
    if explicit_tags:
        pred = pred & (F.size(tags_col) == len(filters))
    return pred


def is_grouping_filter(filter_expr: str) -> bool:
    """In OpenTSDB 1.x query syntax every first-{} tag groups; kept for
    API parity with filter-style queries where groupBy is explicit."""
    return True


def python_filter(filter_expr: str):
    """The same matcher as a Python callable (used for suggest/lookup
    driver-side paths and tests)."""
    fe = filter_expr

    def full(pat, flags=0):
        rx = re.compile(pat, flags)
        return lambda s: s is not None and rx.fullmatch(s) is not None

    if fe.startswith("literal_or(") and fe.endswith(")"):
        return full(fe[11:-1])
    if fe.startswith("iliteral_or(") and fe.endswith(")"):
        return full(fe[12:-1], re.I)
    if fe.startswith("not_literal_or(") and fe.endswith(")"):
        m = full(fe[15:-1])
        return lambda s: s is not None and not m(s)
    if fe.startswith("not_iliteral_or(") and fe.endswith(")"):
        m = full(fe[16:-1], re.I)
        return lambda s: s is not None and not m(s)
    if fe.startswith("wildcard(") and fe.endswith(")"):
        return full(_glob_to_regex(fe[9:-1]))
    if fe.startswith("iwildcard(") and fe.endswith(")"):
        return full(_glob_to_regex(fe[10:-1]), re.I)
    if fe.startswith("regexp(") and fe.endswith(")"):
        return full(fe[7:-1])
    if fe.endswith("*"):
        return full(_glob_to_regex(fe))
    if "|" in fe:
        return full(fe)
    return lambda s: s == fe
