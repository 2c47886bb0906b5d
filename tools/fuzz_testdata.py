"""Adversarial testdata generator: same schemas + value contract as the
driver's sf* dirs (TESTDATA.md), but edge-case-rich content — duplicate
timestamps, bucket-boundary points, predicate-boundary dates, duplicate /
near-duplicate / empty / unicode documents, duplicate and tiny-norm
embeddings, orphan FK rows. Run every registry query against its DuckDB
oracle on a generated dir to fuzz the whole surface with data the fixed
testdata never exercises:

    python tools/fuzz_testdata.py /tmp/fuzz --seed 7
    python tools/diff_sf.py /tmp/fuzz

Deterministic per seed. Values keep the driver's 2-decimal contract
(queries rely on DECIMAL(18,2)-exact sums); event timestamps start at
the q01-q29 harness's Jan-2024 window and span two calendar-month
boundaries (monthly-rollup and day-partition edges).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

US = 1_000_000
def _utc_us(*ymd) -> int:
    """Epoch µs of a UTC wall time — naive datetime.timestamp() would
    shift every boundary row by the host's UTC offset and break the
    advertised edge coverage on non-UTC machines."""
    return int(dt.datetime(*ymd, tzinfo=dt.timezone.utc).timestamp()) * US


T0 = _utc_us(2024, 1, 1)  # epoch µs


def _ts_array(vals_us):
    return pa.array(vals_us, type=pa.timestamp("us"))


def gen_events(rng, n=600, with_nulls=True):
    """Edges: exact-duplicate (event_type,user,ts) with different values
    (last-wins dedup), points ON minute/hour/day bucket boundaries,
    same-ts-different-series, negative / zero / large 2-decimal values."""
    types = ["click", "view", "purchase", "signup", "error"]
    rows = {k: [] for k in ("event_id", "ts", "user_id", "event_type", "value", "props")}

    def add(ts, uid, et, val):
        i = len(rows["event_id"])
        rows["event_id"].append(i)
        rows["ts"].append(ts)
        rows["user_id"].append(uid)
        rows["event_type"].append(et)
        rows["value"].append(val)
        rows["props"].append(json.dumps({"k": int(rng.integers(0, 100))}))

    # span two calendar-month boundaries (Jan→Feb→Mar 2024): monthly
    # rollups and dt-partition edges see real month transitions
    span_us = 65 * 86400 * US
    for _ in range(n - 60):
        ts = T0 + int(rng.integers(0, span_us))
        val = round(float(rng.normal(50, 40)), 2)
        add(ts, int(rng.integers(0, 8)), types[rng.integers(0, 5)], val)
    # rows exactly at the Jan/Feb boundary, both sides
    feb = T0 + 31 * 86400 * US
    for j, ts in enumerate((feb - 1, feb, feb + 1)):
        add(ts, 5, "view", round(7.77 + j, 2))
    # bucket-boundary points: exactly on minute/hour/day edges
    for i in range(20):
        unit = [60, 3600, 86400][i % 3] * US
        add(T0 + (i + 1) * unit, i % 8, types[i % 5], round(float(i) * 1.25, 2))
    # duplicate-timestamp clusters (same series+ts, different values)
    for i in range(10):
        ts = T0 + (i + 2) * 3600 * US + 30 * US
        for v in (1.0, 2.5, -3.75):
            add(ts, 3, "click", v)
    # same ts, different series (exact-timestamp cross-series merge)
    ts = T0 + 12 * 3600 * US
    for uid in range(8):
        add(ts, uid, "view", round(uid * 10.01, 2))
    # value extremes within the 2-decimal contract. |v| stays below ~3e4:
    # squared-moment operators (rolling z-score) cast DECIMAL sums of v²
    # to double on both engines, and scaled v²·n must stay inside
    # double's exact-integer range (2^53) for the casts to agree bitwise
    # — beyond that the two engines' decimal→double roundings diverge at
    # the ulp and the E[x²]−E[x]² cancellation amplifies it.
    for v in (0.0, -0.01, 29_999.99, -29_999.99, 0.01):
        add(T0 + int(rng.integers(0, span_us)), 9, "error", v)
    if with_nulls:
        # DEFAULT-ON since round 11: an ALL-NULL-value series (its own
        # user, regular cadence) — the shape that had n_dod > 0 with
        # n_rep == 0 in q203 (ANSI DIVIDE_BY_ZERO before the r10
        # guard), and that exposed 5 entries with engine-dependent
        # NULL/NaN group semantics (q85/q148/q153/q157/q194 — aligned
        # in r11: NULL-value rows are dropped at the scan on both
        # engine sides; see BENCHNOTES round 11). A NULL value is
        # unrepresentable in the put-line ingest protocol (q29's
        # roundtrip rejects it) but external parquet is a first-class
        # source, so the shape stays in the default corpus.
        for i in range(6):
            add(T0 + (i + 1) * 60 * US + 15 * US, 11, "signup", None)
    return pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": _ts_array(rows["ts"]),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_type": pa.array(rows["event_type"], pa.string()),
            "value": pa.array(rows["value"], pa.float64()),
            "props": pa.array(rows["props"], pa.string()),
        }
    )


_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "query row data slow filter customer line batch value stream group über "
    "naïve café 数据 查询 流 schéma rücken"
).split()


def gen_documents(rng, n=150):
    """Edges: exact duplicates, near-duplicates (one token changed),
    empty / whitespace-only / single-token docs, high-repetition docs,
    unicode tokens, newlines and punctuation."""
    langs = ["en", "es", "de", "fr", "zh"]
    sources = [f"src{i}" for i in range(8)]
    texts = []
    for _ in range(n - 30):
        k = int(rng.integers(3, 60))
        texts.append(" ".join(rng.choice(_WORDS, size=k)))
    base = " ".join(rng.choice(_WORDS, size=40))
    texts += [base] * 4                      # exact-dup cluster
    for i in range(4):                       # near-dups of the same base
        toks = base.split()
        toks[int(rng.integers(0, len(toks)))] = _WORDS[i]
        texts.append(" ".join(toks))
    texts += ["", " ", "\n", "word", "a b", "the the the the the the the the"]
    texts += ["line one\nline two\nline one", "punct, punct; punct! punct?"]
    texts += [" ".join(["boiler plate footer"] * 5)] * 8   # shared boilerplate
    texts += ["mixed 数据 tokens über café one two three"] * 2
    rng.shuffle(texts)
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([langs[int(rng.integers(0, 5))] for _ in texts], pa.string()),
            "source": pa.array([sources[int(rng.integers(0, 8))] for _ in texts], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng, n=120, dim=64):
    """Edges: exact-duplicate vectors (cosine exactly 1), a tiny-norm
    vector, an all-equal vector, near-duplicates with small perturbation."""
    M = rng.normal(0, 0.12, size=(n, dim)).astype(np.float32)
    M[10] = M[5]                      # exact duplicate pair
    M[11] = M[5] + np.float32(1e-4)   # near-duplicate
    M[12] = np.float32(1e-6)          # tiny norm, all equal
    M[13] = np.float32(0.1)           # all-equal components
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in M], pa.list_(pa.float32())),
            "label": pa.array([int(i % 10) for i in range(n)], pa.int32()),
        }
    )


def gen_tpch(rng):
    regions = pa.table(
        {"r_regionkey": pa.array(range(5), pa.int32()),
         "r_name": pa.array([f"REGION{i}" for i in range(5)], pa.string())}
    )
    nn = 25
    nations = pa.table(
        {"n_nationkey": pa.array(range(nn), pa.int32()),
         "n_name": pa.array([f"NATION{i}" for i in range(nn)], pa.string()),
         "n_regionkey": pa.array([int(i % 5) for i in range(nn)], pa.int32())}
    )
    nc = 60
    customer = pa.table(
        {"c_custkey": pa.array(range(nc), pa.int64()),
         "c_name": pa.array([f"Customer{i}" for i in range(nc)], pa.string()),
         "c_nationkey": pa.array([int(rng.integers(0, nn)) for _ in range(nc)], pa.int32()),
         "c_acctbal": pa.array([round(float(rng.normal(0, 2000)), 2) for _ in range(nc)], pa.float64()),
         "c_mktsegment": pa.array([["BUILDING", "MACHINERY", "AUTOMOBILE"][int(rng.integers(0, 3))] for _ in range(nc)], pa.string())}
    )
    ns = 20
    supplier = pa.table(
        {"s_suppkey": pa.array(range(ns), pa.int64()),
         "s_name": pa.array([f"Supplier{i}" for i in range(ns)], pa.string()),
         "s_nationkey": pa.array([int(rng.integers(0, nn)) for _ in range(ns)], pa.int32()),
         "s_acctbal": pa.array([round(float(rng.normal(0, 2000)), 2) for _ in range(ns)], pa.float64())}
    )
    npart = 40
    part = pa.table(
        {"p_partkey": pa.array(range(npart), pa.int64()),
         "p_name": pa.array([f"Part{i}" for i in range(npart)], pa.string()),
         "p_brand": pa.array([f"Brand#{i % 5}" for i in range(npart)], pa.string()),
         "p_type": pa.array([f"TYPE {i % 7}" for i in range(npart)], pa.string()),
         "p_size": pa.array([int(rng.integers(1, 50)) for _ in range(npart)], pa.int32()),
         "p_retailprice": pa.array([round(float(rng.uniform(100, 2000)), 2) for _ in range(npart)], pa.float64())}
    )
    no = 150
    # orderdate edges: exactly on q21's [1997-01-01, 1999-01-01) bounds
    od = [_utc_us(1995 + int(rng.integers(0, 5)), int(rng.integers(1, 13)), int(rng.integers(1, 28)))
          for _ in range(no - 4)]
    od += [_utc_us(y, m, d)
           for (y, m, d) in [(1997, 1, 1), (1998, 12, 31), (1999, 1, 1), (1996, 12, 31)]]
    orders = pa.table(
        {"o_orderkey": pa.array(range(no), pa.int64()),
         # orphan edge: custkey nc (no such customer) on one row
         "o_custkey": pa.array([int(rng.integers(0, nc)) for _ in range(no - 1)] + [nc], pa.int64()),
         "o_orderstatus": pa.array([["O", "F", "P"][int(rng.integers(0, 3))] for _ in range(no)], pa.string()),
         "o_totalprice": pa.array([round(float(rng.uniform(1000, 300000)), 2) for _ in range(no)], pa.float64()),
         "o_orderdate": _ts_array(od),
         "o_orderpriority": pa.array([f"{i % 5 + 1}-PRIO" for i in range(no)], pa.string())}
    )
    nl = 600
    # shipdate edges: exactly on q20's <= 1999-06-30 boundary (inclusive)
    sd = [_utc_us(1995 + int(rng.integers(0, 5)), int(rng.integers(1, 13)), int(rng.integers(1, 28)))
          for _ in range(nl - 3)]
    sd += [_utc_us(*ymd) for ymd in [(1999, 6, 30), (1999, 7, 1), (1999, 6, 29)]]
    lineitem = pa.table(
        {"l_orderkey": pa.array([int(rng.integers(0, no)) for _ in range(nl)], pa.int64()),
         "l_partkey": pa.array([int(rng.integers(0, npart)) for _ in range(nl)], pa.int64()),
         "l_suppkey": pa.array([int(rng.integers(0, ns)) for _ in range(nl)], pa.int64()),
         "l_linenumber": pa.array([int(i % 7 + 1) for i in range(nl)], pa.int32()),
         "l_quantity": pa.array([round(float(rng.integers(1, 50)), 2) for _ in range(nl)], pa.float64()),
         "l_extendedprice": pa.array([round(float(rng.uniform(100, 90000)), 2) for _ in range(nl)], pa.float64()),
         "l_discount": pa.array([round(float(rng.integers(0, 11)) / 100, 2) for _ in range(nl)], pa.float64()),
         "l_tax": pa.array([round(float(rng.integers(0, 9)) / 100, 2) for _ in range(nl)], pa.float64()),
         "l_returnflag": pa.array([["A", "N", "R"][int(rng.integers(0, 3))] for _ in range(nl)], pa.string()),
         "l_linestatus": pa.array([["O", "F"][int(rng.integers(0, 2))] for _ in range(nl)], pa.string()),
         "l_shipdate": _ts_array(sd)}
    )
    return {"region": regions, "nation": nations, "customer": customer,
            "supplier": supplier, "part": part, "orders": orders, "lineitem": lineitem}


def generate(out_dir: str, seed: int = 7, with_nulls: bool = True) -> None:
    rng = np.random.default_rng(seed)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    tables = gen_tpch(rng)
    tables["events"] = gen_events(rng, with_nulls=with_nulls)
    tables["documents"] = gen_documents(rng)
    tables["embeddings"] = gen_embeddings(rng)
    for name, tbl in tables.items():
        pq.write_table(tbl, out / f"{name}.parquet")
    print(f"wrote {len(tables)} tables to {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--no-nulls", action="store_true",
                    help="omit the all-NULL-value series (default corpus "
                         "includes it since round 11)")
    a = ap.parse_args()
    generate(a.out_dir, a.seed, with_nulls=not a.no_nulls)
