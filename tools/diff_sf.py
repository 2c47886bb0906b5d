"""Driver-parity differential: every queries() entry vs its DuckDB oracle
at an arbitrary SF dir (the driver verifies at sf0.01; tests/test_oracle.py
pins sf0.001). Usage:

    python tools/diff_sf.py [sf_dir] [name_substring ...]

Prints one line per query: OK/MISMATCH with row counts, and a non-zero exit
if anything mismatches. Mirrors the driver's compare: column names, row
count, order-insensitive full-precision value compare.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import ticktock_spark.pipeline.queries  # noqa: F401
from ticktock_spark.queries import ORACLES, QUERIES
from ticktock_spark.schema import TESTDATA_TABLES
from ticktock_spark.session import get_spark


def canon(df):
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def _oracle_df(con, sql: str, timeout: float | None):
    """Run an oracle with an optional wall-clock bound: a watchdog thread
    calls connection.interrupt() at the deadline, which aborts the
    running statement with an exception → None."""
    if timeout is None:
        return con.sql(sql).df()
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout):
            con.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    try:
        return con.sql(sql).df()
    except duckdb.InterruptException:
        return None
    finally:
        done.set()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    pats = [a for a in sys.argv[2:] if not a.startswith("--")]
    skips: list[str] = []
    oracle_timeout: float | None = None
    for a in sys.argv[2:]:
        if a.startswith("--skip="):
            # --skip=q49,q50: exclude by substring (e.g. the 5 queries
            # whose recursive-CTE oracle is quadratic at sf0.1)
            skips += [p for p in a[len("--skip="):].split(",") if p]
        elif a.startswith("--oracle-timeout="):
            # bound EACH DuckDB oracle run (big-SF sweeps: a superlinear
            # oracle — PQ/minhash SQL at sf1 — can run for hours; a
            # timed-out oracle prints TIMEOUT and the sweep continues,
            # recording the entry as oracle-infeasible at this SF rather
            # than wedging the whole run)
            oracle_timeout = float(a[len("--oracle-timeout="):])
    con = duckdb.connect()
    # let heavy oracles (q169/q178's tile-minhash SQL at sf0.1) spill
    # instead of dying on a bad allocation: an in-memory connection has
    # NO temp_directory by default, so exceeding memory_limit is fatal
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    con.sql("SET memory_limit='48GB'")
    import os

    for t in TESTDATA_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files (e.g. the
        # gen_sf_scaled corpora); DuckDB needs the glob form there
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    spark = get_spark()
    names = [
        n for n in sorted(QUERIES)
        if (not pats or any(p in n for p in pats))
        and not any(p in n for p in skips)
    ]
    bad = []
    for name in names:
        t0 = time.monotonic()
        try:
            got = QUERIES[name](spark, sf_dir).toPandas()
            t_spark = time.monotonic() - t0
            if name not in ORACLES:
                # mirror the driver: oracle-less entries get a weaker
                # rows-only determinism check (run twice, counts equal)
                n2 = len(QUERIES[name](spark, sf_dir).toPandas())
                if len(got) != n2:
                    bad.append(name)
                    print(f"MISMATCH {name}: nondeterministic rows {len(got)} != {n2}")
                else:
                    print(f"OK {name} (no oracle; {len(got)} rows, spark {t_spark:.1f}s)")
                continue
            exp = _oracle_df(con, ORACLES[name], oracle_timeout)
            if exp is None:
                bad.append(name)
                print(f"TIMEOUT {name}: oracle exceeded {oracle_timeout:.0f}s")
                continue
            t_oracle = time.monotonic() - t0 - t_spark
            if sorted(got.columns) != sorted(exp.columns):
                bad.append(name)
                print(f"MISMATCH {name}: cols {sorted(got.columns)} != {sorted(exp.columns)}")
                continue
            cg, ce = canon(got), canon(exp)
            if len(cg) != len(ce):
                bad.append(name)
                print(f"MISMATCH {name}: rows {len(cg)} != {len(ce)}")
                continue
            diff = [(a, b) for a, b in zip(cg, ce) if a != b]
            if diff:
                bad.append(name)
                print(f"MISMATCH {name}: {len(diff)} differing rows; first: {diff[:2]}")
            else:
                print(
                    f"OK {name} ({len(cg)} rows, "
                    f"spark {t_spark:.1f}s / oracle {t_oracle:.1f}s)"
                )
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"ERROR {name}: {type(e).__name__}: {e}")
    print(f"\n{len(names) - len(bad)}/{len(names)} green")
    if bad:
        print("BAD:", bad)
        sys.exit(1)


if __name__ == "__main__":
    main()
