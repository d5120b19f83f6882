"""ProVoice decoder (EDACS digital voice: IMBE 7100x4400 on 9600 baud
GFSK 2-level).

Frame walk after the 32-symbol sync: interleaved IMBE 7100 voice frames
(7×24-bit vectors); validation is structural — the reference fixture set
has no ProVoice decode case (docs/testing.md known gaps).
Reference parity: src/protocol/provoice/provoice.c.
"""

from __future__ import annotations

import numpy as np

from dsdneo_tpu.protocol.base import (DecoderContext, DibitReader,
                                      ProtocolDecoder, register)
from dsdneo_tpu.symbols.framesync import SyncHit

# ProVoice TDU cadence: voice superframes of 4 IMBE frames between syncs
FRAME_BITS = 7 * 24


@register("provoice")
class ProVoiceDecoder(ProtocolDecoder):
    protocol = "provoice"

    def handle(self, reader: DibitReader, hit: SyncHit, ctx: DecoderContext) -> int:
        pos = hit.end
        polarity = "-" if reader.invert else "+"
        label = "EA " if hit.sync.kind == "ea" else ""
        ctx.emit(f"Sync: {polarity}ProVoice {label}VOICE", "provoice", hit.pos)
        # collect two IMBE 7100 frames' worth of bits for the vocoder
        n = 2 * FRAME_BITS
        if pos + n > len(reader.dibits):
            return len(reader.dibits)
        dd = reader.dibits[pos:pos + n].astype(np.uint8)
        bits = ((dd >> 1) & 1).astype(np.uint8)     # 2-level: sign bit
        if reader.invert:
            bits ^= 1
        ctx.events[-1].fields["imbe7100_bits"] = bits
        return pos + n
