"""Talkgroup policy: allow/block/hold/preempt + CSV imports.

Reference parity: src/core/util/talkgroup_policy.c (allow/block with
modes, TG hold per slot, encrypted lockout) and src/core/file/
dsd_import.c (group list / channel map / key CSV formats per
docs/csv-formats.md).
"""

from __future__ import annotations

import csv
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class GroupEntry:
    tg: int
    mode: str = "A"        # A=allow, B=block, DE=block-when-encrypted
    label: str = ""


@dataclass
class TalkgroupPolicy:
    groups: dict[int, GroupEntry] = field(default_factory=dict)
    whitelist_mode: bool = False    # only allow listed TGs
    tg_hold: dict[int, int] = field(default_factory=dict)  # slot -> tg
    enc_lockout: bool = False

    # -- decisions --------------------------------------------------------
    def allows(self, tg: int, slot: int = 0, encrypted: bool = False) -> bool:
        hold = self.tg_hold.get(slot, 0)
        if hold and tg != hold:
            return False
        ent = self.groups.get(tg)
        if ent is None:
            return not self.whitelist_mode
        if ent.mode.upper().startswith("B"):
            return False
        if encrypted and (self.enc_lockout or ent.mode.upper() == "DE"):
            return False
        return True

    def label(self, tg: int) -> str:
        ent = self.groups.get(tg)
        return ent.label if ent else ""

    def hold(self, slot: int, tg: int) -> None:
        self.tg_hold[slot] = tg

    def release_hold(self, slot: int) -> None:
        self.tg_hold.pop(slot, None)

    # -- CSV import (group.csv: TG,Mode,Label) ----------------------------
    def import_group_csv(self, path: str) -> int:
        n = 0
        with open(path, newline="") as f:
            for row in csv.reader(f):
                if not row or row[0].strip().lower() in ("tg", "talkgroup", "#"):
                    continue
                try:
                    tg = int(row[0].strip())
                except ValueError:
                    continue
                mode = row[1].strip() if len(row) > 1 else "A"
                label = row[2].strip() if len(row) > 2 else ""
                self.groups[tg] = GroupEntry(tg, mode or "A", label)
                n += 1
        return n


@dataclass
class ChannelMapEntry:
    channel: int
    freq_hz: float
    label: str = ""


def import_channel_map_csv(path: str) -> dict[int, ChannelMapEntry]:
    """chan.csv: Channel,FrequencyHz[,Label]"""
    out: dict[int, ChannelMapEntry] = {}
    with open(path, newline="") as f:
        for row in csv.reader(f):
            if not row or not row[0].strip().isdigit():
                continue
            ch = int(row[0].strip())
            try:
                freq = float(row[1].strip())
            except (IndexError, ValueError):
                continue
            if freq < 1e5:                      # MHz convention
                freq *= 1e6
            out[ch] = ChannelMapEntry(ch, freq,
                                      row[2].strip() if len(row) > 2 else "")
    return out


def import_key_csv(path: str, hex_keys: bool = False) -> dict[int, int]:
    """key.csv: KeyID,Key (decimal, or hex with hex_keys=True)."""
    out: dict[int, int] = {}
    base = 16 if hex_keys else 10
    with open(path, newline="") as f:
        for row in csv.reader(f):
            if len(row) < 2:
                continue
            try:
                kid = int(row[0].strip(), 0)
                key = int(row[1].strip(), base)
            except ValueError:
                continue
            out[kid] = key
    return out
