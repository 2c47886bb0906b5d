"""Randomized differential test for the tag-filter compiler.

`plans/tagfilter.py` carries the same grammar twice: `compile_tag_filter`
(Column predicate, the scan path) and `python_filter` (pure-Python, the
suggest/lookup driver path). Both transcribe TagMatcher::init
(`src/utils/tag.cpp:692-796`): full-match semantics, missing tag never
matches, dispatch order literal_or → iliteral_or → not_(i)literal_or →
(i)wildcard → regexp → trailing-star glob → alternation → literal.

This test generates a few hundred filter expressions across every
dispatch arm plus a pool of adversarial tag values (case flips, ''
values, '.' and '-' in values, near-misses of the glob prefixes, NULLs)
and asserts the two implementations agree cell-for-cell — one wide
Spark projection, not one job per filter. Values stay ASCII so Java and
Python regex classes (\\w, \\d) cannot diverge on Unicode.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ticktock_spark.plans.tagfilter import (
    compile_tag_filter,
    compile_tag_filters,
    python_filter,
)

_LIT_CHARS = "abcdwxyzAB019_-."


def _gen_literal(rng: random.Random) -> str:
    return "".join(rng.choice(_LIT_CHARS) for _ in range(rng.randint(1, 6)))


def _gen_filters(rng: random.Random, literals: list[str]) -> list[str]:
    def lits(n):
        return "|".join(rng.choice(literals) for _ in range(n))

    out = []
    for _ in range(20):
        out.append(f"literal_or({lits(rng.randint(1, 3))})")
        out.append(f"iliteral_or({lits(rng.randint(1, 3))})")
        out.append(f"not_literal_or({lits(rng.randint(1, 3))})")
        out.append(f"not_iliteral_or({lits(rng.randint(1, 3))})")
        base = rng.choice(literals)
        cut = rng.randint(0, len(base))
        out.append(f"wildcard({base[:cut]}*)")
        out.append(f"iwildcard(*{base[cut:]})")
        out.append(f"wildcard({base[:cut]}*{base[cut:]})")
        out.append(base[:cut] + "*")  # bare trailing-star glob
        out.append(lits(2))  # bare alternation
        out.append(rng.choice(literals))  # plain literal
        a, b = rng.choice(literals), rng.choice(literals)
        out.append(rng.choice([
            f"regexp([a-z]+[0-9]*)",
            f"regexp({a}.*)",
            f"regexp(.*{b})",
            f"regexp(({a}|{b})[0-9]*)",
            f"regexp(\\w+)",
        ]))
    out.append("*")  # match-any glob
    return out


def test_tag_filter_spark_matches_python_twin(spark):
    rng = random.Random(20260815)
    literals = [_gen_literal(rng) for _ in range(12)] + [
        "web01", "web02", "WEB01", "db-1", "db.1", "cache",
    ]
    filters = _gen_filters(rng, literals)

    # value pool: the literals, case flips, prefixes/extensions
    # (near-misses for the globs), '' and None
    values: list[str | None] = list(literals)
    values += [v.upper() for v in literals] + [v.lower() for v in literals]
    values += [v[: len(v) // 2] for v in literals if len(v) > 1]
    values += [v + rng.choice(_LIT_CHARS) for v in literals]
    values += ["", None, "dbX1"]  # 'dbX1': regex-dot vs literal-dot probe
    values = list(dict.fromkeys(values))

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, v string")
    cols = [
        compile_tag_filter(F.col("v"), fe).alias(f"m{j}")
        for j, fe in enumerate(filters)
    ]
    rows = {r["i"]: r for r in df.select("i", *cols).collect()}

    mismatches = []
    for j, fe in enumerate(filters):
        py = python_filter(fe)
        for i, v in enumerate(values):
            got = bool(rows[i][f"m{j}"])
            want = bool(py(v))
            if got != want:
                mismatches.append((fe, v, got, want))
    assert not mismatches, mismatches[:10]


def test_tag_filters_map_missing_key_and_explicit_tags(spark):
    # missing tag never matches (tag.cpp full-match on absent value);
    # explicit_tags additionally pins the tag count (tsdb.cpp:736-737)
    rows = [
        (1, {"host": "web01", "dc": "east"}),
        (2, {"host": "web02"}),
        (3, {"dc": "east"}),
    ]
    df = spark.createDataFrame(rows, "i long, tags map<string,string>")

    keep = df.filter(compile_tag_filters(F.col("tags"), {"host": "web*"}))
    assert sorted(r["i"] for r in keep.collect()) == [1, 2]

    pinned = df.filter(
        compile_tag_filters(F.col("tags"), {"host": "web*"}, explicit_tags=True)
    )
    assert [r["i"] for r in pinned.collect()] == [2]

    nothing = df.filter(compile_tag_filters(F.col("tags"), {"rack": "*"}))
    assert nothing.count() == 0


@pytest.mark.parametrize(
    "fe,val,expect",
    [
        ("not_literal_or(a|b)", None, False),   # NULL never matches, even negated
        ("not_iliteral_or(a)", "", True),        # '' is a value, not a missing tag
        ("iwildcard(WEB*)", "web99", True),
        ("wildcard(WEB*)", "web99", False),
        ("regexp(\\w+)", "web_1", True),
        # trailing '*' dispatches BEFORE alternation, but replace_stars
        # (tag.cpp:798-821) escapes only '.' and expands '*' — '|' stays
        # a live regex alternation, so 'a|b*' means 'a' OR 'b.*', NOT a
        # literal 'a|b' prefix. Pinned so both twins keep that quirk.
        ("a|b*", "bzz", True),
        ("a|b*", "a|bzz", False),
    ],
)
def test_tag_filter_dispatch_pins(spark, fe, val, expect):
    py = python_filter(fe)
    assert bool(py(val)) is expect
    df = spark.createDataFrame([(val,)], "v string")
    got = df.select(compile_tag_filter(F.col("v"), fe).alias("m")).first()["m"]
    assert bool(got) is expect
