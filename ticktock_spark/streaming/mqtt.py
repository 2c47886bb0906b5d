"""MQTT ingest: an in-process subscriber spooling messages for
Structured Streaming — no Kafka hop.

The reference's MQTT source (`/root/reference/src/utils/mqtt.cpp`)
subscribes a paho client per configured broker and feeds each accepted
message straight into the telnet-put / Influx-line write handlers
(`mqtt.cpp:274-321` on_message; settings shape `mqtt.cpp:119`
`[{"broker": ..., "port": 1883, "topics": [{"topic": ...,
"format": ...}]}]`). Spark has no MQTT streaming source, so the
Spark-first mapping reuses the UdpSpool edge-spooler pattern
(`streaming/udp.py`): the same paho subscription and on_message
routing, but each accepted payload is buffered per ingest format and
rotated ATOMICALLY (write tmp → os.rename) into a per-format spool
subdirectory that ``stream_put_lines(path=...)`` — the existing file
streaming source — consumes unchanged. MQTT QoS-0 delivery is
fire-and-forget like UDP: loss before the spool matches the
reference's contract; exactly-once downstream of the spool comes from
the sink checkpoint like every other source.

Scale story: the spooler is an edge process, not a Spark job — run one
per broker (like the reference's one MqttServer per configured client)
and point them at a shared spool path (object store / NFS); the
streaming job fans in from the directory listing. Spark-side cost is
identical to file ingest.

The routing functions here are the single source of truth — the
MQTT→Kafka migration adapter (`tools/mqtt_bridge.py`) imports them, so
both transports drop/route identically.

paho-mqtt is imported lazily; ``client_factory`` lets tests (and
alternative MQTT client libs) inject the subscriber, keeping the spool
and routing fully testable without a broker.
"""

from __future__ import annotations

import json
import os
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession

# the reference's network-buffer guard (`mqtt.cpp:282` right operand):
# messages at least this large are dropped, not truncated
MAX_PAYLOAD_BYTES = 512 * 1024

# format name → ingest parser key (FORMATS in streaming/ingest.py).
# "line" is Influx line protocol (IF_LINE → the /api/write path);
# "json"/"put" go to the put path (IF_JSON and telnet put share
# Tsdb::http_api_put_handler in the reference).
FORMAT_TO_FMT = {"line": "influx", "json": "json", "put": "put"}

# lines buffered per format before a spool-file rotation (the UDP
# spooler's CFG_UDP_BATCH_SIZE analogue — MQTT has no reference batch
# size; one file per message would thrash the file-source listing)
BATCH_LINES = 256


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


class MqttSpool:
    """In-process MQTT subscribers spooling accepted payloads to
    per-format text files under ``spool_dir/<fmt>/``.

    One paho client per settings entry (`mqtt.cpp:201-214` start), each
    with the reference's client id and on_message routing. ``stop()``
    disconnects the clients and flushes every partial batch.

    ``client_factory(broker, port, on_message) -> client`` must return
    an object with ``subscribe(topic)``, ``loop_start()`` and
    ``disconnect()``; when None, a real paho-mqtt client is built
    (ImportError if paho is absent — the routing/spool logic needs no
    broker to test).
    """

    def __init__(
        self,
        settings_json: str,
        spool_dir: str,
        batch_lines: int = BATCH_LINES,
        client_factory=None,
    ):
        self.spool_dir = spool_dir
        self.batch_lines = batch_lines
        self.dropped = 0   # guard-rejected message count
        self.received = 0  # accepted-line count (self-metrics / test sync)
        self._lock = threading.Lock()
        self._bufs: dict[str, list[str]] = {f: [] for f in set(FORMAT_TO_FMT.values())}
        for fmt in self._bufs:
            os.makedirs(os.path.join(spool_dir, fmt), exist_ok=True)
        if client_factory is None:
            client_factory = _paho_client_factory
        self._clients = []
        for spec in parse_settings(settings_json):
            topics = spec["topics"]

            def on_message(_client, _userdata, msg, topics=topics):
                self._on_message(topics, msg.topic, msg.payload)

            client = client_factory(spec["broker"], spec["port"], on_message)
            # (re)subscribe on every CONNACK, mirroring the reference's
            # on_connect handler (mqtt.cpp:255-269): with clean-session a
            # broker auto-reconnect silently drops all subscriptions, so
            # subscribing only at construction would stop ingest on the
            # first disconnect. Injected test clients may lack on_connect;
            # the constructor-time subscribe below keeps those working.
            if hasattr(client, "on_connect"):

                def on_connect(cl, _userdata, *_args, topics=topics):
                    for name in topics:
                        cl.subscribe(name)

                client.on_connect = on_connect
            for name in topics:
                client.subscribe(name)
            client.loop_start()
            self._clients.append(client)

    def _on_message(self, topics: dict[str, str], topic: str, payload: bytes) -> None:
        routed = route_message(topics, topic, payload)
        if routed is None:
            with self._lock:
                self.dropped += 1
            return
        fmt, data = routed
        # a payload may carry multiple lines (the reference appends the
        # whole message to the line buffer and splits on '\n' in the
        # shared handlers) — keep that: 1 message = N lines
        lines = [
            ln for ln in data.decode("utf-8", errors="replace").splitlines()
            if ln.strip()
        ]
        with self._lock:
            buf = self._bufs[fmt]
            buf.extend(lines)
            self.received += len(lines)
            if len(buf) >= self.batch_lines:
                self._flush_locked(fmt)

    def _flush_locked(self, fmt: str) -> None:
        buf = self._bufs[fmt]
        if not buf:
            return
        # tmp + rename: the file streaming source lists the directory
        # between micro-batches and must never see a half-written file
        name = f"mqtt-{uuid.uuid4().hex}.txt"
        d = os.path.join(self.spool_dir, fmt)
        tmp = os.path.join(d, "." + name + ".tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(buf) + "\n")
        os.rename(tmp, os.path.join(d, name))
        buf.clear()

    def flush(self) -> None:
        """Rotate every partial batch out to the spool (tests / timers)."""
        with self._lock:
            for fmt in self._bufs:
                self._flush_locked(fmt)

    def stop(self) -> None:
        for c in self._clients:
            try:
                c.disconnect()
            except Exception:  # noqa: BLE001 — best-effort edge shutdown
                pass
        self.flush()


def _paho_client_factory(broker: str, port: int, on_message):
    try:
        import paho.mqtt.client as mqtt  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "MqttSpool requires paho-mqtt (pip install paho-mqtt), or pass "
            "client_factory="
        ) from e
    # paho-mqtt >= 2.0 requires a CallbackAPIVersion first argument and
    # raises ValueError without one; VERSION1 keeps the v1 on_message /
    # on_connect signatures used here.
    if hasattr(mqtt, "CallbackAPIVersion"):
        client = mqtt.Client(
            mqtt.CallbackAPIVersion.VERSION1, client_id="ticktockdb"
        )  # mqtt.cpp:340
    else:
        client = mqtt.Client(client_id="ticktockdb")  # mqtt.cpp:340
    client.on_message = on_message
    client.connect(broker, port, keepalive=10)  # mqtt.cpp:207-210
    return client


def stream_mqtt_lines(
    spark: SparkSession, spool_dir: str, fmt: str = "put"
) -> DataFrame:
    """Spooled MQTT payloads of one ingest format → canonical datapoints
    stream: the read side is exactly the existing file ingest, rooted at
    that format's spool subdirectory."""
    from ticktock_spark.streaming.ingest import stream_put_lines

    return stream_put_lines(spark, path=os.path.join(spool_dir, fmt), fmt=fmt)
