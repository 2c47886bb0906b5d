"""Opt-in `pytest -m scale` tier (r9 verdict ask #5): the skew/scale
stress harnesses, promoted from hand-run evidence generators to
self-catching regression gates. Each test runs the full tool (8x
corpora built from sf0.1 under .scratch/) and asserts its flagged set
is EMPTY — any operator whose skew ratio crosses 2x, or whose data-
scaling turns grossly super-linear, fails the tier.

Excluded from the default run via pytest.ini's `-m "not scale"`; these
own the whole SparkSession (local[32] via get_spark), so run them in a
dedicated pytest invocation, not mixed with the local[4] suite.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.scale
def test_skew_stress_no_hardened_op_over_2x():
    from tools.skew_stress import run

    out = run(8)
    assert out["flagged_over_2x"] == {}, out


@pytest.mark.scale
def test_round9_scale_stress_nothing_superlinear():
    from tools.round9_scale_stress import run

    out = run(8)
    assert out["flagged_superlinear"] == {}, out
    # the dedup_yield candidate-pair growth must stay far under
    # quadratic (the predictor of 100x cost — verdict ask #3)
    dy = out["ops"]["dedup_yield_docs"]
    assert dy["candidates_ratio"] < 8 * 8 / 2, dy
