"""HTTP query-concurrency stress: N parallel clients mixing /api/query +
/api/analytics + /api/suggest against ONE TsdbStore/SparkSession.

The reference's concurrency model is listener/responder thread pools
(`conf/tt.conf` http_listener_count/http_responders_per_listener;
`test/int_test3.py:37-41` drives multi-threaded clients). The Spark
twin is a ThreadingHTTPServer whose handlers run concurrent Spark
actions on the shared session — this harness measures per-request
latency (p50/p99) at increasing client counts and re-verifies every
concurrent response against its single-threaded reference (state-bleed
check; the matching pass/fail test is
tests/test_http.py::test_http_concurrent_query_mix).

Comparison is structural-exact (same result sets, tags, aggregateTags,
timestamps) with a 1e-9 relative tolerance on dps values: the
reference's cross-series avg/sum folds IEEE doubles in whatever order
its series map yields (`src/agg/aggregate.cpp:140-215` specifies no
order), and Spark's partial aggregation likewise — so the last ulp of
an 8-series sum legitimately varies run-to-run. State bleed would show
as wholesale wrong rows/keys, which IS a failure here.

Usage:
    python tools/http_concurrency_stress.py [sf_dir] [levels...]
    # default: /root/testdata/sf0.1, levels 1 4 8 16
"""

from __future__ import annotations

import json
import statistics
import sys
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ticktock_spark.api.http import TsdbHttpServer
from ticktock_spark.schema import load_table
from ticktock_spark.session import get_spark

T0 = 1_704_067_200  # sf testdata epoch start (seconds)


def _get(port: int, path: str):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return json.loads(r.read())


def _close(a, b, rel=1e-9) -> bool:
    """Structural equality with rel-tol on leaf floats (see module doc)."""
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_close(a[k], b[k], rel) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_close(x, y, rel) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) <= rel * max(abs(a), abs(b))
    return a == b


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    levels = [int(a) for a in sys.argv[2:]] or [1, 4, 8, 16]
    spark = get_spark()
    ev = load_table(spark, sf_dir, "events")
    # canonical DATAPOINT_SCHEMA shape: 8-host tag fleet per metric
    base = ev.select(
        F.col("event_type").alias("metric"),
        F.unix_millis("ts").alias("ts"),
        F.col("value").cast("double").alias("value"),
        F.create_map(
            F.lit("host"),
            F.concat(F.lit("h"), (F.col("user_id") % 8).cast("string")),
        ).alias("tags"),
        F.col("event_id").cast("long").alias("seq"),
        F.to_date(F.timestamp_millis(F.unix_millis("ts"))).alias("dt"),
    )
    srv = TsdbHttpServer(spark, base=base).start()
    end = T0 + 40 * 86400
    reqs = [
        f"/api/query?start={T0}&end={end}&m=sum:1h-avg:click",
        f"/api/query?start={T0}&end={end}&m=avg:1h-avg:purchase",
        f"/api/query?start={T0}&end={end}&m=sum:rate:click",
        "/api/analytics?op=seasonal_profile&m=click",
        "/api/analytics?op=histogram&m=error&width=50",
        "/api/analytics?op=trend&m=click&bucket_ms=3600000",
        "/api/analytics?op=mad&m=purchase&bucket_ms=3600000",
        "/api/analytics?op=theilsen&m=view",
        "/api/analytics?op=histogram_quantile&m=error&q=0.5&q=0.99",
        "/api/analytics?op=fano&m=click&bucket_ms=3600000",
        # round-9 ops in the mix
        "/api/analytics?op=interarrival&m=click",
        "/api/analytics?op=flatline&m=purchase&bucket_ms=3600000&min_run=3",
        "/api/analytics?op=gaps&m=view&bucket_ms=3600000",
        "/api/analytics?op=seasonal_envelope&m=click&bucket_ms=3600000&q=90",
        "/api/analytics?op=value_precision&m=error",
        "/api/analytics?op=compress_audit&m=click",
        "/api/analytics?op=rollup_error&m=purchase",
        "/api/suggest?type=metrics&q=c&max=10",
    ]
    try:
        expected = [_get(srv.port, r) for r in reqs]  # also warms plans
        print(f"sf_dir={sf_dir} rows={base.count()} mix={len(reqs)} requests")
        for n in levels:
            lat: list[float] = []
            bad = 0
            mism: list = []

            def worker(w: int):
                nonlocal bad
                out = []
                for k in range(len(reqs)):
                    idx = (w + k) % len(reqs)
                    t0 = time.perf_counter()
                    res = _get(srv.port, reqs[idx])
                    out.append(time.perf_counter() - t0)
                    if not _close(res, expected[idx]):
                        bad += 1
                        mism.append((w, reqs[idx], res))
                return out

            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=n) as ex:
                for out in ex.map(worker, range(n)):
                    lat.extend(out)
            wall = time.perf_counter() - t0
            lat.sort()
            p50 = statistics.median(lat)
            p99 = lat[max(0, int(len(lat) * 0.99) - 1)]
            print(
                json.dumps(
                    {
                        "clients": n,
                        "requests": len(lat),
                        "wall_s": round(wall, 2),
                        "p50_s": round(p50, 3),
                        "p99_s": round(p99, 3),
                        "rps": round(len(lat) / wall, 2),
                        "mismatches": bad,
                    }
                )
            )
            for w, r, res in mism:
                print(f"MISMATCH worker={w} req={r}")
                print("  got     :", json.dumps(res)[:400])
                print("  expected:", json.dumps(expected[reqs.index(r)])[:400])
            assert bad == 0, f"{bad} cross-request result mismatches at n={n}"
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
