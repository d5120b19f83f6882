"""Vendor privacy / scrambler keystreams (DMR Tier II radios).

Each scheme produces a static 882-bit keystream (one 18-frame voice
superframe of 49-bit AMBE payloads) applied frame-by-frame with a
rolling counter.  Reference parity: src/crypto/crypt-etc.c
(hytera_bp_apply_frame49, ken_dmr_scrambler_keystream_creation,
anytone_bp_keystream_creation, dmr_parse_static_keystream_spec).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# default silence frame, 49 bits MSB-first (reference crypt-etc.c packs
# it left-aligned in 56 bits: bit i = const >> (55-i))
AMBE_SILENT_49 = 0xF801A99F8CE080 >> 7


def hytera_bp_keystream(k1: int, k2: int = 0, k3: int = 0, k4: int = 0
                        ) -> np.ndarray:
    """Hytera Basic Privacy: 40/128/256-bit key cycled over 882 bits.

    k2==0 → 40-bit key (k1 high-aligned, period 40); k4!=0 → 256-bit."""
    if k2 == 0:
        length, k1 = 40, (k1 << 24) & 0xFFFFFFFFFFFFFFFF
    elif k4 != 0:
        length = 256
    else:
        length = 128
    tkey = np.zeros(256, dtype=np.uint8)
    for slot, k in enumerate((k1, k2, k3, k4)):
        for i in range(64):
            tkey[64 * slot + i] = (k >> (63 - i)) & 1
    return tkey[np.arange(882) % length]


def kenwood_scrambler_keystream(key15: int) -> np.ndarray:
    """Kenwood DMR 15-bit LFSR scrambler (feedback bits 1^0)."""
    lfsr = key15 & 0x7FFF
    out = np.zeros(882, dtype=np.uint8)
    for i in range(882):
        out[i] = lfsr & 1
        bit = ((lfsr >> 1) ^ lfsr) & 1
        lfsr = (lfsr >> 1) | (bit << 14)
    return out


def anytone_bp_keystream(key16: int) -> np.ndarray:
    """Anytone Basic Privacy: nibble permutation of the 16-bit key
    (nib1/3 inverted, nib2/4 +8 mod 16), repeated."""
    key16 &= 0xFFFF
    nib1 = (~(key16 >> 12)) & 0xF
    nib2 = (((key16 >> 8) & 0xF) + 8) % 16
    nib3 = (~(key16 >> 4)) & 0xF
    nib4 = ((key16 & 0xF) + 8) % 16
    kperm = (nib1 << 12) | (nib2 << 8) | (nib3 << 4) | nib4
    return np.array([(kperm >> (15 - i)) & 1 for i in range(16)],
                    dtype=np.uint8)


@dataclass
class StaticKeystream:
    """Straight mod-XOR keystream spec: arbitrary hex keystream bits with
    modulus and optional per-frame offset/step (reference
    dmr_parse_static_keystream_spec; CLI '-S hex[:mod[:off:step]]')."""
    bits: np.ndarray
    mod: int
    frame_mode: int = 0       # 1 = reset position each frame (off+step)
    frame_off: int = 0
    frame_step: int = 0
    counter: dict = field(default_factory=lambda: {0: 0, 1: 0})

    @classmethod
    def parse(cls, spec: str) -> "StaticKeystream":
        parts = spec.strip().split(":")
        hexs = parts[0]
        raw = bytes.fromhex(hexs if len(hexs) % 2 == 0 else hexs + "0")
        bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8))
        mod = int(parts[1]) if len(parts) > 1 and parts[1] else len(hexs) * 4
        mod = max(1, min(mod, 882, len(bits) if len(bits) else 1))
        out = np.zeros(882, dtype=np.uint8)
        out[:len(bits[:882])] = bits[:882]
        fm, fo, fs = 0, 0, 0
        if len(parts) > 3:
            fm, fo, fs = 1, int(parts[2] or 0), int(parts[3] or 0)
        return cls(bits=out, mod=mod, frame_mode=fm, frame_off=fo,
                   frame_step=fs)

    def apply_frame49(self, ambe49: np.ndarray, slot: int = 0) -> np.ndarray:
        """XOR one 49-bit AMBE payload; advances the rolling counter.
        Silence frames skip crypto but still advance (reference
        dmr_ambe49_should_skip_crypto + xor_keystream_bits_frame49)."""
        slot &= 1
        v = 0
        for b in ambe49:
            v = (v << 1) | int(b)
        if v == AMBE_SILENT_49:
            self._advance(slot)
            return np.asarray(ambe49, dtype=np.uint8)
        if self.frame_mode:
            pos = (self.frame_off + self.counter[slot] * self.frame_step) % self.mod
        else:
            pos = self.counter[slot] % self.mod
        out = np.asarray(ambe49, dtype=np.uint8).copy()
        for i in range(49):
            out[i] ^= self.bits[pos % self.mod]
            pos += 1
        self._advance(slot, 49)
        return out

    def _advance(self, slot: int, n: int = 49) -> None:
        if self.frame_mode:
            self.counter[slot] += 1
        else:
            self.counter[slot] = (self.counter[slot] + n) % max(self.mod, 1)


def hytera_bp_apply_frame49(ks882: np.ndarray, frame_idx: int,
                            ambe49: np.ndarray) -> np.ndarray:
    """Apply the Hytera BP superframe keystream at voice frame
    ``frame_idx`` (0-17)."""
    frame_idx = max(0, min(frame_idx, 17))
    v = 0
    for b in ambe49:
        v = (v << 1) | int(b)
    if v == AMBE_SILENT_49:
        return np.asarray(ambe49, dtype=np.uint8)
    out = np.asarray(ambe49, dtype=np.uint8).copy()
    out ^= ks882[frame_idx * 49:frame_idx * 49 + 49]
    return out
