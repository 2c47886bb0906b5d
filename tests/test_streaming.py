"""Streaming ingest + rollup: file-source put-lines → parquet datapoints
→ streaming hourly rollup (availableNow micro-batch)."""

from __future__ import annotations

import pytest

from ticktock_spark.streaming.ingest import stream_put_lines, write_datapoints_stream
from ticktock_spark.streaming.rollup import streaming_rollup_1h

H = 3_600_000


@pytest.fixture()
def put_dir(tmp_path):
    lines = []
    for i in range(10):
        # two series, points 20 min apart spanning 4 hours
        lines.append(f"put sys.cpu {i * 1200} {float(i)} host=a")
        lines.append(f"put sys.cpu {i * 1200} {float(i * 2)} host=b")
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "batch0.txt").write_text("\n".join(lines))
    return tmp_path


def test_stream_ingest_to_parquet(spark, put_dir):
    dps = stream_put_lines(spark, path=str(put_dir / "in"))
    q = write_datapoints_stream(
        dps, str(put_dir / "out"), str(put_dir / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(put_dir / "out"))
    assert got.count() == 20
    row = got.filter("ts = 0 and tags['host'] = 'a'").collect()[0]
    assert row["metric"] == "sys.cpu" and row["value"] == 0.0
    assert str(row["dt"]) == "1970-01-01"


def test_streaming_rollup(spark, put_dir):
    dps = stream_put_lines(spark, path=str(put_dir / "in"))
    roll = streaming_rollup_1h(dps)
    q = (
        roll.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("append")
        .option("checkpointLocation", str(put_dir / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from rollup_test").collect()
    # hours 0..3 × 2 series; watermark close emits finished windows
    by_key = {(r["__series"], r["bucket_ts"]): r for r in out}
    r = by_key[("host=a", 0)]
    # hour 0: points at 0,20,40 min → values 0,1,2
    assert r["cnt"] == 3 and r["min"] == 0.0 and r["max"] == 2.0 and r["sum"] == 3.0
    assert r["tags"] == {"host": "a"}
