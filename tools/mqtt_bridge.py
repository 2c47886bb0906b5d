#!/usr/bin/env python
"""MQTT → Kafka bridge: the migration adapter for the reference's MQTT
source (`/root/reference/src/utils/mqtt.cpp`).

The reference subscribes to MQTT topics directly and feeds each message
into its telnet-put / Influx-line write handlers
(`mqtt.cpp:274-321` on_message). In the Spark engine the production
ingest path is Kafka (`streaming/ingest.py: stream_kafka_lines` →
`kafka_records_to_datapoints`), so MQTT emitters migrate by running
this bridge: it subscribes with the SAME settings shape the reference
uses (`mqtt.cpp:119` — `[{"broker": ..., "port": 1883, "topics":
[{"topic": "telegraf/test", "format": "line"}]}]`) and republishes each
accepted payload onto a Kafka topic per format, where the streaming
ingest picks it up unchanged.

Semantics mirrored from `mqtt.cpp:on_message` (276-321):
  * payloads containing a double-quote are SKIPPED (the reference's
    "skip string values" guard, line 282), as are oversized payloads;
  * the format comes from an exact topic-name match in the settings
    (285-290); messages on unmatched topics are dropped;
  * format "line" routes to the Influx write path; any other known
    format routes to the telnet/JSON put path (292-321).

Dependencies (paho-mqtt, kafka-python) are imported lazily so the
routing logic is importable and testable without them.
"""

from __future__ import annotations

import json

# the reference's network-buffer guard (`mqtt.cpp:282` right operand):
# messages at least this large are dropped, not truncated
MAX_PAYLOAD_BYTES = 512 * 1024

# format name → ingest parser key (FORMATS in streaming/ingest.py).
# "line" is Influx line protocol (IF_LINE → the /api/write path);
# "json"/"put" go to the put path (IF_JSON and telnet put share
# Tsdb::http_api_put_handler in the reference).
FORMAT_TO_FMT = {"line": "influx", "json": "json", "put": "put"}


def parse_settings(settings_json: str) -> list[dict]:
    """Parse the reference-shaped mqtt.settings JSON into
    [{broker, port, topics: {name: format}}] — malformed topic entries
    are ignored with the same leniency as `mqtt.cpp:137-151`."""
    out = []
    for client in json.loads(settings_json):
        broker = client.get("broker")
        topics = {}
        for t in client.get("topics", []):
            if "topic" not in t or "format" not in t:
                continue  # mqtt.cpp:144-148: mal-formatted topic ignored
            if t["format"] not in FORMAT_TO_FMT:
                continue  # to_input_format → IF_UNKNOWN: never subscribed
            topics[t["topic"]] = t["format"]
        if broker and topics:  # mqtt.cpp:205: broker without topics ignored
            out.append(
                {"broker": broker, "port": int(client.get("port", 1883)),
                 "topics": topics}
            )
    return out


def route_message(
    topics: dict[str, str], msg_topic: str, payload: bytes
) -> tuple[str, bytes] | None:
    """One MQTT message → (ingest fmt, payload) or None if dropped.

    Mirrors `mqtt.cpp:on_message` exactly: quote guard, size guard,
    exact-topic format lookup, unknown-format drop."""
    if b'"' in payload or len(payload) >= MAX_PAYLOAD_BYTES:
        return None  # mqtt.cpp:282: skip string values / oversized
    fmt_name = topics.get(msg_topic)
    if fmt_name is None:
        return None  # no exact topic match → IF_UNKNOWN → dropped
    return FORMAT_TO_FMT[fmt_name], payload


def kafka_topic_for(fmt: str, prefix: str = "ticktock") -> str:
    """One Kafka topic per ingest format so each can be consumed by a
    stream_kafka_lines(fmt=...) reader: ticktock-put / ticktock-influx."""
    return f"{prefix}-{fmt}"


def run_bridge(settings_json: str, kafka_brokers: str, prefix: str = "ticktock"):
    """Subscribe per the settings and republish to Kafka. Requires
    paho-mqtt and kafka-python at runtime (not in the test container —
    the routing above is the tested surface; this function is the thin
    IO shell)."""
    try:
        import paho.mqtt.client as mqtt  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "mqtt_bridge requires paho-mqtt (pip install paho-mqtt)"
        ) from e
    try:
        from kafka import KafkaProducer  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "mqtt_bridge requires kafka-python (pip install kafka-python)"
        ) from e

    producer = KafkaProducer(bootstrap_servers=kafka_brokers)
    clients = []
    for spec in parse_settings(settings_json):
        topics = spec["topics"]

        def on_message(_client, _userdata, msg, topics=topics):
            routed = route_message(topics, msg.topic, msg.payload)
            if routed is not None:
                fmt, payload = routed
                producer.send(kafka_topic_for(fmt, prefix), payload)

        client = mqtt.Client(client_id="ticktockdb")  # mqtt.cpp:340
        client.on_message = on_message
        client.connect(spec["broker"], spec["port"], keepalive=10)
        for name in topics:
            client.subscribe(name)
        client.loop_start()
        clients.append(client)
    return producer, clients


if __name__ == "__main__":  # pragma: no cover - manual tool
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--settings", required=True,
                    help="mqtt.settings JSON (reference shape) or @file")
    ap.add_argument("--kafka", required=True, help="Kafka bootstrap servers")
    ap.add_argument("--prefix", default="ticktock")
    args = ap.parse_args()
    settings = args.settings
    if settings.startswith("@"):
        with open(settings[1:]) as f:
            settings = f.read()
    run_bridge(settings, args.kafka, args.prefix)
    import signal

    signal.pause()
