"""Time parsing: OpenTSDB relative/absolute time expressions.

Mirrors the reference semantics (`src/utils/utils.cpp:395-540`,
`include/type.h:66-77`):

- relative: ``<N><unit>-ago`` with units ms, s, m/min (minute), h, d, w,
  n (month = 30 d), y (365 d);
- absolute: ``yyyy/MM/dd``, ``yyyy/MM/dd-HH:mm``, ``yyyy/MM/dd-HH:mm:ss``
  (also with space separator);
- numeric epoch with sec-vs-ms auto-detect via a magnitude heuristic
  (``MAX_SEC_SINCE_EPOCH``, `src/utils/utils.cpp:395-402`).

All results are epoch milliseconds. Pure driver-side functions (query
boundaries are scalars, never per-row work).
"""

from __future__ import annotations

import re
import time
from datetime import datetime, timezone

# Seconds magnitude cutoff: timestamps below this are seconds, else ms.
# Reference uses a fixed constant ~ year 2286 in seconds.
_MAX_SEC_SINCE_EPOCH = 9999999999

_UNIT_MS = {
    "ms": 1,
    "s": 1000,
    "m": 60_000,
    "min": 60_000,
    "h": 3_600_000,
    "d": 86_400_000,
    "w": 7 * 86_400_000,
    "n": 30 * 86_400_000,  # month
    "y": 365 * 86_400_000,
}

_REL_RE = re.compile(r"^(\d+)(ms|min|[smhdwny])-ago$")


def normalize_ms(ts: int | float) -> int:
    """Epoch sec-vs-ms auto-detect → epoch ms."""
    ts = int(ts)
    if ts <= _MAX_SEC_SINCE_EPOCH:
        return ts * 1000
    return ts


def parse_time(expr: str | int | float, now_ms: int | None = None, tz: str | None = None) -> int:
    """Parse an OpenTSDB start/end expression → epoch ms."""
    if isinstance(expr, (int, float)):
        return normalize_ms(expr)
    s = str(expr).strip()
    if s == "now":
        return now_ms if now_ms is not None else int(time.time() * 1000)
    m = _REL_RE.match(s)
    if m:
        n, unit = int(m.group(1)), m.group(2)
        base = now_ms if now_ms is not None else int(time.time() * 1000)
        return base - n * _UNIT_MS[unit]
    if s.isdigit() or (s.startswith("-") and s[1:].isdigit()):
        return normalize_ms(int(s))
    # absolute formats
    for fmt in (
        "%Y/%m/%d-%H:%M:%S",
        "%Y/%m/%d %H:%M:%S",
        "%Y/%m/%d-%H:%M",
        "%Y/%m/%d %H:%M",
        "%Y/%m/%d",
        "%Y-%m-%dT%H:%M:%S",
        "%Y-%m-%d %H:%M:%S",
        "%Y-%m-%d",
    ):
        try:
            dt = datetime.strptime(s, fmt)
        except ValueError:
            continue
        if tz:
            from zoneinfo import ZoneInfo

            dt = dt.replace(tzinfo=ZoneInfo(tz))
        else:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)
    raise ValueError(f"unparseable time expression: {expr!r}")


_DS_UNIT_RE = re.compile(r"^(\d+)(ms|min|[smhdw])$")


def parse_interval_ms(spec: str) -> int:
    """``5m`` / ``100ms`` / ``1h`` ... → interval in ms. ``0all`` → 0.

    Units per `src/agg/down.cpp:66-99` (ms, s, m, h, d, w; `0all` = whole
    range as a single bucket).
    """
    s = spec.strip()
    if s in ("0all", "all"):
        return 0
    m = _DS_UNIT_RE.match(s)
    if not m:
        raise ValueError(f"bad downsample interval: {spec!r}")
    return int(m.group(1)) * _UNIT_MS[m.group(2)]
