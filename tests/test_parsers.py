"""Parser unit tests: m= grammar, tag filters, ingest line formats,
time expressions."""

from __future__ import annotations

from ticktock_spark.plans.parser import parse_m_expr, parse_query_json
from ticktock_spark.plans.tagfilter import python_filter
from ticktock_spark.sources.parsers import (
    parse_influx_line,
    parse_put_json,
    parse_put_line,
)
from ticktock_spark.timeparse import parse_interval_ms, parse_time


def test_m_expr_full():
    spec = parse_m_expr("avg:rate{true,500,100}:5m-avg-zero:sys.cpu{host=web*,dc=lga}{rack=r1}")
    assert spec.aggregator == "avg"
    assert spec.rate and spec.rate_options.counter
    assert spec.rate_options.counter_max == 500
    assert spec.rate_options.reset_value == 100
    assert spec.downsample == "5m-avg-zero"
    assert spec.metric == "sys.cpu"
    assert spec.tags == {"host": "web*", "dc": "lga", "rack": "r1"}
    assert spec.non_grouping_tags == {"rack": "r1"}


def test_m_expr_minimal():
    spec = parse_m_expr("sum:test.metric")
    assert spec.aggregator == "sum" and spec.metric == "test.metric"
    assert spec.downsample is None and not spec.rate and spec.tags == {}


def test_m_expr_explicit_tags_and_rollup():
    spec = parse_m_expr("max:explicit_tags:rollupUsage=ROLLUP_RAW:1h-max:m1{a=b}")
    assert spec.explicit_tags and spec.rollup_usage == "ROLLUP_RAW"
    assert spec.downsample == "1h-max"


def test_query_json():
    top = parse_query_json(
        {
            "start": 1704067200,
            "end": 1704070800,
            "queries": [
                {
                    "metric": "m1",
                    "aggregator": "sum",
                    "downsample": "1m-avg",
                    "rate": True,
                    "rateOptions": {"counter": True, "counterMax": 70},
                    "tags": {"host": "*"},
                }
            ],
        }
    )
    assert top.start_ms == 1704067200000 and top.end_ms == 1704070800000
    q = top.subqueries[0]
    assert q.rate_options.counter_max == 70 and q.tags == {"host": "*"}


def test_tag_filters():
    assert python_filter("web01")("web01") and not python_filter("web01")("web02")
    f = python_filter("web01|web02")
    assert f("web01") and f("web02") and not f("web03")
    assert python_filter("web*")("web-prod-1") and not python_filter("web*")("db1")
    assert python_filter("*")("anything") and not python_filter("*")(None)
    assert python_filter("literal_or(a|b)")("a") and not python_filter("literal_or(a|b)")("c")
    assert python_filter("iliteral_or(A|b)")("a")
    nf = python_filter("not_literal_or(a|b)")
    assert nf("c") and not nf("a") and not nf(None)
    assert python_filter("wildcard(web*)")("webXY")
    assert python_filter("iwildcard(WEB*)")("webXY")
    assert python_filter("regexp(w.b[0-9]+)")("web42")
    # '.' is escaped in globs: 'a.b*' should not match 'aXb!'
    assert not python_filter("a.b*")("aXbZ")
    assert python_filter("a.b*")("a.bZ")


def test_put_line():
    dp = parse_put_line("put sys.cpu 1704067200 42.5 host=web01 dc=lga")
    assert dp == {
        "metric": "sys.cpu",
        "ts": 1704067200000,
        "value": 42.5,
        "tags": {"host": "web01", "dc": "lga"},
    }
    assert parse_put_line("nonsense") is None
    # ms timestamp passes through unscaled
    assert parse_put_line("put m 1704067200123 1 a=b")["ts"] == 1704067200123


def test_put_json():
    dps = parse_put_json(
        '[{"metric":"m1","timestamp":1704067200,"value":1.5,"tags":{"h":"a"}},'
        '{"metric":"m2","timestamp":1704067200123,"value":2}]'
    )
    assert dps[0]["ts"] == 1704067200000 and dps[0]["tags"] == {"h": "a"}
    assert dps[1]["ts"] == 1704067200123 and dps[1]["tags"] == {}


def test_influx_line():
    dps = parse_influx_line(
        "weather,location=us\\,midwest temp=82,hum=71i 1704067200000000000"
    )
    assert len(dps) == 2
    byf = {d["tags"]["_field"]: d for d in dps}
    assert byf["temp"]["value"] == 82.0 and byf["hum"]["value"] == 71.0
    assert byf["temp"]["metric"] == "weather"
    assert byf["temp"]["tags"]["location"] == "us,midwest"
    assert byf["temp"]["ts"] == 1704067200000
    # escaped space and equals in identifiers
    dps = parse_influx_line("m\\ x,k\\==v f\\ 1=3.5")
    assert dps[0]["metric"] == "m x" and dps[0]["tags"]["k="] == "v"
    assert dps[0]["tags"]["_field"] == "f 1" and dps[0]["value"] == 3.5
    # string fields skipped, booleans numeric
    dps = parse_influx_line('m s="str",b=true,v=1')
    assert {d["tags"]["_field"] for d in dps} == {"b", "v"}


def test_time_parse():
    now = 1704067200000
    assert parse_time("1d-ago", now) == now - 86_400_000
    assert parse_time("90min-ago", now) == now - 90 * 60_000
    assert parse_time("2n-ago", now) == now - 2 * 30 * 86_400_000
    assert parse_time("2024/01/01-00:00:00") == 1704067200000
    assert parse_time(1704067200) == 1704067200000
    assert parse_time("1704067200123") == 1704067200123
    assert parse_interval_ms("5m") == 300_000
    assert parse_interval_ms("100ms") == 100
    assert parse_interval_ms("0all") == 0


def test_mqtt_bridge_routing(spark):
    """tools/mqtt_bridge.py replicates the reference MQTT source's
    on_message semantics (mqtt.cpp:276-321): quote/size guards, exact-
    topic format lookup, line→write vs put routing — and every routed
    payload must parse through the SAME Kafka ingest mapping the
    streaming path uses (kafka_records_to_datapoints)."""
    from tools.mqtt_bridge import (
        MAX_PAYLOAD_BYTES,
        kafka_topic_for,
        parse_settings,
        route_message,
    )

    settings = parse_settings(
        '[{"broker": "dock", "port": 1883, "topics": ['
        '{"topic": "telegraf/test", "format": "line"},'
        '{"topic": "sensors/put", "format": "put"},'
        '{"topic": "bad"},'
        '{"topic": "weird", "format": "xml"}]},'
        '{"broker": "", "topics": [{"topic": "t", "format": "line"}]}]'
    )
    assert len(settings) == 1  # empty-broker client ignored (mqtt.cpp:205)
    topics = settings[0]["topics"]
    assert topics == {"telegraf/test": "line", "sensors/put": "put"}

    line = b"env,room=a temp=21.5,hum=40 1704067200000000000"
    putl = b"put test.metric 1704067200 10 host=h1"
    assert route_message(topics, "telegraf/test", line) == ("influx", line)
    assert route_message(topics, "sensors/put", putl) == ("put", putl)
    # reference guards: quoted payloads, oversize, unknown topic
    assert route_message(topics, "telegraf/test", b'x,t="s" v=1') is None
    assert route_message(topics, "telegraf/test", b"x" * MAX_PAYLOAD_BYTES) is None
    assert route_message(topics, "unknown/topic", line) is None
    assert kafka_topic_for("influx") == "ticktock-influx"

    # the routed payloads are valid input for the Kafka ingest mapping
    from ticktock_spark.streaming.ingest import kafka_records_to_datapoints

    for fmt, payload, metric in (("influx", line, "env"), ("put", putl, "test.metric")):
        records = spark.createDataFrame([(payload,)], "value binary")
        rows = kafka_records_to_datapoints(records, fmt=fmt).collect()
        assert rows and all(r["metric"].startswith(metric) for r in rows)
