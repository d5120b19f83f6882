"""Call/event history: per-slot ring of decode events with severity,
watchdog sync, and log-file writing.

Reference parity: include/dsd-neo/core/events.h:32-166 and
src/core/util/dsd_events.c (ring of call events per slot with
severity/category, alerting, log writer, UI snapshot copy).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from enum import IntEnum
from typing import Optional


class Severity(IntEnum):
    DEBUG = 0
    INFO = 1
    NOTICE = 2
    WARNING = 3
    ALERT = 4


class CallKind(IntEnum):
    UNKNOWN = 0
    GROUP_VOICE = 1
    PRIVATE_VOICE = 2
    DATA = 3
    CONTROL = 4
    ENCRYPTED = 5


@dataclass
class CallEvent:
    when: float
    protocol: str
    kind: CallKind
    slot: int = 0
    tg: int = 0
    src: int = 0
    freq_hz: float = 0.0
    text: str = ""
    severity: Severity = Severity.INFO
    ended: Optional[float] = None

    def duration(self) -> float:
        end = self.ended if self.ended is not None else time.time()
        return max(end - self.when, 0.0)


class EventHistory:
    """Bounded per-slot ring of call events (2 TDMA slots + control)."""

    def __init__(self, capacity: int = 256, slots: int = 2,
                 log_path: str | None = None):
        self.capacity = capacity
        self.rings: dict[int, list[CallEvent]] = {s: [] for s in range(slots)}
        self.active: dict[int, Optional[CallEvent]] = {s: None for s in range(slots)}
        self.log_path = log_path
        self._log_f = open(log_path, "a") if log_path else None

    def begin_call(self, ev: CallEvent) -> CallEvent:
        slot = ev.slot
        cur = self.active.get(slot)
        if cur is not None and (cur.tg != ev.tg or cur.kind != ev.kind):
            self.end_call(slot)
            cur = None
        if cur is None:
            self.active[slot] = ev
            self._append(slot, ev)
            self._write_log(ev, "START")
            return ev
        cur.src = ev.src or cur.src
        return cur

    def end_call(self, slot: int, when: float | None = None) -> None:
        cur = self.active.get(slot)
        if cur is None:
            return
        cur.ended = when if when is not None else time.time()
        self._write_log(cur, "END")
        self.active[slot] = None

    def note(self, slot: int, text: str, severity: Severity = Severity.INFO,
             protocol: str = "") -> None:
        ev = CallEvent(when=time.time(), protocol=protocol,
                       kind=CallKind.CONTROL, slot=slot, text=text,
                       severity=severity, ended=time.time())
        self._append(slot, ev)
        self._write_log(ev, "NOTE")

    def snapshot(self, slot: int = 0, n: int = 20) -> list[CallEvent]:
        """Copy of the most recent events (the UI-facing view)."""
        return list(self.rings.get(slot, []))[-n:]

    def _append(self, slot: int, ev: CallEvent) -> None:
        ring = self.rings.setdefault(slot, [])
        ring.append(ev)
        if len(ring) > self.capacity:
            del ring[: len(ring) - self.capacity]

    def _write_log(self, ev: CallEvent, tag: str) -> None:
        if self._log_f is None:
            return
        ts = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(ev.when))
        self._log_f.write(
            f"{ts} [{tag}] {ev.protocol} slot={ev.slot} kind={ev.kind.name} "
            f"TG={ev.tg} SRC={ev.src} {ev.text}\n")
        self._log_f.flush()

    def close(self) -> None:
        for s in list(self.active):
            self.end_call(s)
        if self._log_f:
            self._log_f.close()
            self._log_f = None
