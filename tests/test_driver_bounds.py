"""Every driver materialization must state its cardinality bound.

A ``.collect()`` / ``.toPandas()`` / ``.first()`` / ``.head()`` /
``.take()`` / ``.toLocalIterator()`` on a DataFrame moves rows onto the
driver; at 100 TB any such site whose row count scales with the DATA
(rather than with the model, the query, or the response) is an OOM.
Until round 11 the "no data-scale collect" invariant was re-audited by
hand each round (56+ sites); this test makes it self-auditing the same
way MAX_PAIR_CELLS named the Arrow output-frame convention:

    every materialization site must carry a ``# driver-bound: <what
    bounds the rows>`` comment on the call line or within the three
    lines above it, naming the actual bound (one row per metric, the
    merge table, two scalars, the response payload, ...).

A new unannotated site fails here with its location — the author must
either state a real bound or restructure the operator so the rows stay
on the executors. The annotation is a claim reviewers can check at the
site; this test only enforces that the claim exists.

``F.first(...)`` / ``F.collect_list`` etc. are aggregate FUNCTIONS, not
driver actions, and are excluded by receiver.
"""

import ast
import pathlib

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / "ticktock_spark"
METHODS = {"collect", "toPandas", "head", "first", "take", "toLocalIterator"}
TOKEN = "driver-bound:"
LOOKBACK = 3  # comment may sit up to this many lines above the call


def _sites(path: pathlib.Path):
    src = path.read_text()
    lines = src.splitlines()
    for node in ast.walk(ast.parse(src)):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in METHODS
        ):
            continue
        recv = node.func.value
        # F.first(...) / functions.collect_list(...) are column
        # expressions, not actions; np.take(...) / pd.* are numpy/pandas
        # kernel calls inside executor-side UDFs, not driver actions
        if isinstance(recv, ast.Name) and recv.id in (
            "F",
            "functions",
            "np",
            "pd",
        ):
            continue
        lo = max(0, node.lineno - 1 - LOOKBACK)
        hi = min(len(lines), (node.end_lineno or node.lineno))
        window = "\n".join(lines[lo:hi])
        yield node.lineno, node.func.attr, TOKEN in window


def test_every_driver_materialization_states_its_bound():
    missing = []
    n_sites = 0
    for path in sorted(PKG.rglob("*.py")):
        for lineno, meth, annotated in _sites(path):
            n_sites += 1
            if not annotated:
                rel = path.relative_to(PKG.parent)
                missing.append(f"{rel}:{lineno} .{meth}()")
    assert not missing, (
        "driver materialization without a '# driver-bound:' annotation "
        "(state what bounds the rows, or keep them on the executors):\n  "
        + "\n  ".join(missing)
    )
    # the convention is live — if this drops to ~0 the detector broke
    assert n_sites >= 50, f"site detector found only {n_sites} sites"


def test_detector_catches_unannotated_site(tmp_path):
    p = tmp_path / "m.py"
    p.write_text("rows = df.collect()\n")
    assert [s for s in _sites(p) if not s[2]], "detector missed a bare collect"
    p.write_text("# driver-bound: one row\nrows = df.collect()\n")
    assert not [s for s in _sites(p) if not s[2]]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
