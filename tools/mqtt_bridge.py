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

# Routing/settings semantics live in the package's native MQTT source
# (ticktock_spark/streaming/mqtt.py) — single source of truth so the
# Kafka bridge and the in-process MqttSpool drop/route identically.
from ticktock_spark.streaming.mqtt import (  # noqa: F401 — re-exported API
    FORMAT_TO_FMT,
    MAX_PAYLOAD_BYTES,
    parse_settings,
    route_message,
)


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
