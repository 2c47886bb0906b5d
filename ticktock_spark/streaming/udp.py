"""UDP ingest: a spooling datagram receiver in front of Structured
Streaming.

The reference runs `udp.listener.count` (default 2) threads on one
SO_REUSEPORT socket; each datagram is one telnet-put line — it appends
a newline and hands the line to the same parser as TCP ingest
(`/root/reference/src/core/udp.cpp:120-133` receiver loop,
`:190-199` process_one_line → DataPoint::from_plain). UDP is the
fire-and-forget path: no acks, no backpressure, drops are acceptable
by design (`include/config.h:169` ships it disabled).

Spark has no UDP streaming source, so the Spark-first mapping is an
edge spooler: the same SO_REUSEPORT / multi-listener receiver, but
instead of writing straight into a page buffer it batches datagram
lines (batch size mirrors `udp.cpp:92` CFG_UDP_BATCH_SIZE, default
256) into text files rotated ATOMICALLY (write tmp → os.rename) into a
spool directory that `stream_put_lines(path=...)` — the existing file
streaming source — already consumes. Exactly-once downstream of the
spool comes from the sink checkpoint like every other source; loss
BEFORE the spool (dropped datagrams under burst) matches the
reference's UDP contract.

Scale story: the spooler is an edge process, not a Spark job — run one
per ingest host (like the reference's one UdpServer per node) and
point them all at a shared spool path (object store / NFS); the
streaming job fans in from the directory listing. Spark-side cost is
identical to file ingest: the receiver threads never touch the driver
or executors.
"""

from __future__ import annotations

import os
import socket
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession

# `include/config.h:112` CFG_TSDB_MAX_DP_LINE_DEF — oversized datagrams
# are dropped (the reference's recvfrom reads at most max_line bytes and
# asserts; dropping is the lossy-path analogue, never truncation, which
# would corrupt a line into a plausible-but-wrong datapoint).
MAX_LINE_BYTES = 256

# `include/config.h:167` CFG_UDP_BATCH_SIZE_DEF — lines buffered per
# listener before a spool-file rotation.
BATCH_LINES = 256

# `include/config.h:165` CFG_UDP_LISTENER_COUNT_DEF
LISTENER_COUNT = 2


class UdpSpool:
    """Multi-listener UDP receiver spooling datagram lines to text files.

    Mirrors `udp.cpp:UdpServer::start` (224-238): ``listeners`` threads
    each with its own SO_REUSEPORT-bound socket, so the kernel
    load-balances datagrams across them. ``stop()`` flushes every
    partial batch — matching the reference's shutdown draining the
    in-flight recvmmsg batch.
    """

    def __init__(
        self,
        spool_dir: str,
        port: int = 0,
        host: str = "127.0.0.1",
        listeners: int = LISTENER_COUNT,
        batch_lines: int = BATCH_LINES,
        max_line: int = MAX_LINE_BYTES,
    ):
        os.makedirs(spool_dir, exist_ok=True)
        self.spool_dir = spool_dir
        self.batch_lines = batch_lines
        self.max_line = max_line
        self._stop = threading.Event()
        self._socks: list[socket.socket] = []
        self._threads: list[threading.Thread] = []
        self.dropped = 0  # oversized-datagram count (lossy-path metric)
        self.received = 0  # accepted-line count (self-metrics / test sync)
        self._counter_lock = threading.Lock()
        for i in range(listeners):
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            if hasattr(socket, "SO_REUSEPORT"):
                s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
            s.bind((host, port))
            port = s.getsockname()[1]  # listener 0 picks the ephemeral port
            s.settimeout(0.1)
            self._socks.append(s)
        self.port = port
        for i, s in enumerate(self._socks):
            t = threading.Thread(target=self._recv_loop, args=(i, s), daemon=True)
            t.start()
            self._threads.append(t)

    def _flush(self, lid: int, lines: list[str]) -> None:
        if not lines:
            return
        # tmp + rename: the file streaming source lists the directory
        # between micro-batches and must never see a half-written file
        name = f"udp-{lid}-{uuid.uuid4().hex}.txt"
        tmp = os.path.join(self.spool_dir, "." + name + ".tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.rename(tmp, os.path.join(self.spool_dir, name))
        lines.clear()

    def _recv_loop(self, lid: int, sock: socket.socket) -> None:
        buf: list[str] = []
        try:
            while not self._stop.is_set():
                try:
                    data = sock.recvfrom(self.max_line + 1)[0]
                except socket.timeout:
                    continue
                except OSError:
                    break
                if len(data) > self.max_line:  # udp.cpp max_line guard
                    with self._counter_lock:
                        self.dropped += 1
                    continue
                line = data.decode("utf-8", errors="replace").strip()
                if line:  # udp.cpp:122-125 appends '\n': 1 datagram = 1 line
                    buf.append(line)
                    with self._counter_lock:
                        self.received += 1
                if len(buf) >= self.batch_lines:
                    self._flush(lid, buf)
        finally:
            self._flush(lid, buf)

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)
        for s in self._socks:
            s.close()


def stream_udp_lines(
    spark: SparkSession, spool_dir: str, fmt: str = "put"
) -> DataFrame:
    """Spooled UDP datagrams → canonical datapoints stream: the read side
    of the bridge is exactly the existing file ingest."""
    from ticktock_spark.streaming.ingest import stream_put_lines

    return stream_put_lines(spark, path=spool_dir, fmt=fmt)
