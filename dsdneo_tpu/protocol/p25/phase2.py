"""P25 Phase 2 (TDMA, 6000 sym/s) frame decoder — burst typing layer.

Superframe walk (reference parity src/protocol/p25/phase2/p25p2_frame.c):
after the 20-symbol sync, 700 dibits cover 4 timeslots of 360 bits.
Each timeslot's DUID is an 8-bit codeword (bits 0,1,74,75,244,245,
318,319 of the slot) from the canonical set below; ISCH fields at bits
320-359 locate the superframe for descrambling.  Voice/MAC decode needs
the WACN/SYS/NAC scrambler parameters (from the Phase 1 control
channel); without them bursts are typed but not descrambled — matching
the reference's "P2 Missing Parameters" behavior.
"""

from __future__ import annotations

import numpy as np

from dsdneo_tpu.protocol.base import (DecoderContext, DibitReader,
                                      ProtocolDecoder, register)
from dsdneo_tpu.symbols.framesync import SyncHit

# canonical DUID codewords (TIA-102.BBAC; reference p25p2_frame.c:141)
DUID_CANONICAL = [0x00, 0x17, 0x2E, 0x39, 0x4B, 0x5C, 0x65, 0x72,
                  0x8D, 0x9A, 0xA3, 0xB4, 0xC6, 0xD1, 0xE8, 0xFF]

DUID_OFFSETS = [0, 1, 74, 75, 244, 245, 318, 319]


def duid_lookup(received: int) -> int:
    """Nearest-codeword DUID decode (distance ≤ 2), else -1."""
    best, best_d, ties = -1, 9, 0
    for idx, c in enumerate(DUID_CANONICAL):
        d = bin(received ^ c).count("1")
        if d < best_d:
            best, best_d, ties = idx, d, 0
        elif d == best_d:
            ties += 1
    if best_d > 2 or (best_d > 0 and ties):
        return -1
    return best


@register("p25p2")
class P25P2Decoder(ProtocolDecoder):
    protocol = "p25p2"

    def handle(self, reader: DibitReader, hit: SyncHit, ctx: DecoderContext) -> int:
        pos = hit.end
        if pos + 700 > len(reader.dibits):
            return len(reader.dibits)
        dd = reader.dibits[pos:pos + 700].astype(np.uint8)
        if reader.invert:
            dd = dd ^ 2
        bits = np.empty(1400, dtype=np.uint8)
        bits[0::2] = (dd >> 1) & 1
        bits[1::2] = dd & 1

        s = ctx.state
        have_params = bool(s.p2_wacn and s.p2_sysid and s.p2_cc)
        head = f"Sync: {hit.sync.name} "
        if not have_params:
            head += " P2 Missing Parameters            "
        ctx.emit(head, "p25p2", hit.pos)

        slot = 0
        for ts in range(4):
            if ts * 360 + 319 >= 1400:
                break
            received = 0
            for off in DUID_OFFSETS:
                received = (received << 1) | int(bits[ts * 360 + off])
            duid = duid_lookup(received)
            slot_label = f"LCH {slot} "
            if duid in (3, 12):
                name = "SACCH "
            elif duid == 13:
                name = "LCCH  "
            elif duid == 4:
                name = "LCCHs "
            elif duid in (0, 6):
                name = slot_label + ("4V" if duid == 0 else "2V")
            elif duid < 0:
                name = slot_label + f" DUID ERR {received:02X}"
            else:
                name = slot_label + f"DUID {duid}"
            ctx.emit(f"       P25p2 {name}", "p25p2", hit.pos, ts=ts, duid=duid)
            slot ^= 1
        return pos + 700
