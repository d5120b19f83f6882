"""Curses terminal frontend: live decode status, event scroller,
symbol-eye visualizer.

Reference parity: the ncurses frontend family (src/ui/terminal/ —
ui_async.c lifecycle, dsd_ncurses_printer.c status panes,
ncurses_visualizers.c eye/constellation views), reduced to the
capture-replay workflow: a header pane (mode, sync counts, call state),
a scrolling event log, and an ASCII eye diagram of the recovered
symbols.
"""

from __future__ import annotations

import curses
from dataclasses import dataclass


@dataclass
class UiModel:
    mode: str = ""
    source: str = ""
    n_events: int = 0
    n_syncs: int = 0
    audio_s: float = 0.0
    lines: list = None
    soft: object = None     # np array of normalized symbols (optional)


def _eye_rows(soft, width: int, height: int = 7) -> list[str]:
    import numpy as np
    if soft is None or len(soft) < width:
        return []
    seg = np.asarray(soft[:width * 4]).reshape(-1, 4).mean(axis=1)[:width]
    rows = []
    levels = np.linspace(3.5, -3.5, height)
    for lv in levels:
        row = "".join("*" if abs(s - lv) < 0.5 else " " for s in seg)
        rows.append(row)
    return rows


def run(model: UiModel, max_idle_polls: int | None = None) -> None:
    """Blocking curses browser over a decoded capture (q quits,
    arrows/PgUp/PgDn scroll).  When stdin is not a tty the view renders
    and exits after a short idle period (headless/CI replay)."""
    import sys
    if max_idle_polls is None and not sys.stdin.isatty():
        max_idle_polls = 10
    curses.wrapper(_main, model, max_idle_polls)


def _main(scr, model: UiModel, max_idle_polls: int | None = None) -> None:
    try:
        curses.curs_set(0)
    except curses.error:
        pass
    scr.timeout(100)
    offset = max(len(model.lines or []) - 1, 0)
    idle = 0
    while True:
        h, w = scr.getmaxyx()
        scr.erase()
        head = (f" dsd-neo-tpu | mode {model.mode} | {model.source} | "
                f"events {model.n_events} | syncs {model.n_syncs} | "
                f"audio {model.audio_s:.1f}s ")
        scr.addnstr(0, 0, head.ljust(w), w - 1, curses.A_REVERSE)

        eye = _eye_rows(model.soft, min(w - 2, 120))
        y = 1
        for row in eye:
            if y >= h - 1:
                break
            scr.addnstr(y, 1, row, w - 2)
            y += 1
        if eye:
            scr.addnstr(y, 1, "-" * min(w - 2, 120), w - 2)
            y += 1

        lines = model.lines or []
        view_h = h - y - 1
        start = max(min(offset, len(lines) - view_h), 0)
        for i, line in enumerate(lines[start:start + view_h]):
            scr.addnstr(y + i, 0, line.replace("\n", " | "), w - 1)
        scr.addnstr(h - 1, 0,
                    " q quit   ↑/↓ PgUp/PgDn scroll ".ljust(w - 1), w - 1,
                    curses.A_REVERSE)
        scr.refresh()
        ch = scr.getch()
        if ch == -1:
            idle += 1
            if max_idle_polls is not None and idle >= max_idle_polls:
                break
            continue
        idle = 0
        if ch in (ord("q"), 27):
            break
        elif ch == curses.KEY_UP:
            offset = max(offset - 1, 0)
        elif ch == curses.KEY_DOWN:
            offset += 1
        elif ch == curses.KEY_PPAGE:
            offset = max(offset - view_h, 0)
        elif ch == curses.KEY_NPAGE:
            offset += view_h
