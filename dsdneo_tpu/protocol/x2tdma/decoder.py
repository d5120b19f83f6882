"""X2-TDMA decoder (Motorola's pre-standard 2-slot TDMA, P25-adjacent).

Burst geometry mirrors DMR (CACH + two payload halves around a center
sync) with AMBE+2 voice and P25-style signalling
(reference src/protocol/x2tdma/x2tdma.c; no reference e2e fixture
exists — docs/testing.md lists X2-TDMA among the known fixture gaps —
so validation is structural/synthetic).
"""

from __future__ import annotations

import numpy as np

from dsdneo_tpu.fec import blockcodes
from dsdneo_tpu.protocol.base import (DecoderContext, DibitReader,
                                      ProtocolDecoder, register)
from dsdneo_tpu.symbols.framesync import SyncHit


# burst type table (reference x2tdma_data.c x2tdma_set_fsubtype_from_bursttype)
BURST_TYPES = {
    0b0000: "PI Header", 0b0001: "VOICE Header", 0b0010: "TLC",
    0b0011: "CSBK", 0b0100: "MBC Header", 0b0101: "MBC",
    0b0110: "DATA Header", 0b0111: "RATE 1/2 DATA", 0b1000: "RATE 3/4 DATA",
    0b1001: "Slot idle", 0b1010: "Rate 1 DATA",
}


@register("x2tdma")
class X2TdmaDecoder(ProtocolDecoder):
    protocol = "x2tdma"

    def __init__(self):
        self.vc = {0: 0, 1: 0}

    def _slot_type(self, reader: DibitReader, pos: int) -> tuple[int, int] | None:
        """Raw 3-bit colour code + 4-bit burst type at sync-5..sync
        (reference x2tdma_data.c x2tdma_read_slot_type: no FEC, the
        5th dibit carries a parity bit)."""
        bits = self._bits(reader, pos - 5, 5)
        if bits is None:
            return None
        cc = (int(bits[0]) << 2) | (int(bits[1]) << 1) | int(bits[2])
        bt = (int(bits[4]) << 3) | (int(bits[5]) << 2) | \
             (int(bits[6]) << 1) | int(bits[7])
        return cc, bt

    def handle(self, reader: DibitReader, hit: SyncHit, ctx: DecoderContext) -> int:
        pos = hit.pos
        kind = hit.sync.kind
        polarity = "-" if reader.invert else "+"
        if "voice" in kind:
            s = 0 if "bs" in kind else 1
            self.vc[s] = self.vc.get(s, 0) % 6 + 1
            ctx.emit(f"Sync: {polarity}X2-TDMA {kind.replace('_', ' ').upper()}"
                     f" VC{self.vc[s]}", "x2tdma", pos)
            h1 = self._bits(reader, pos - 54, 54)
            h2 = self._bits(reader, pos + 24, 54)
            if h1 is not None and h2 is not None:
                self._voice(np.concatenate([h1, h2]), ctx)
        else:
            st = self._slot_type(reader, pos)
            detail = ""
            if st is not None:
                cc, bt = st
                name = BURST_TYPES.get(bt, f"Unknown burst type {bt:04b}")
                detail = f" | CC={cc} | {name}"
            ctx.emit(f"Sync: {polarity}X2-TDMA "
                     f"{kind.replace('_', ' ').upper()}{detail}",
                     "x2tdma", pos)
        return pos + 29 + 49

    def _bits(self, reader, start, n_dib):
        if start < 0 or start + n_dib > len(reader.dibits):
            return None
        dd = reader.dibits[start:start + n_dib].astype(np.uint8)
        if reader.invert:
            dd = dd ^ 2
        bits = np.empty(2 * n_dib, dtype=np.uint8)
        bits[0::2] = (dd >> 1) & 1
        bits[1::2] = dd & 1
        return bits

    def _voice(self, voice216: np.ndarray, ctx: DecoderContext) -> None:
        from dsdneo_tpu.protocol.dmr.ambe_frame import decode_ambe_ecc
        from dsdneo_tpu.vocoder.mbe import decode_ambe_2450
        from dsdneo_tpu.vocoder.synth import synthesize_frames
        params = []
        for k in range(3):
            bits49, _ = decode_ambe_ecc(voice216[72 * k:72 * (k + 1)])
            params.append(decode_ambe_2450(bits49))
        pcm = synthesize_frames(params)
        if pcm.size:
            ctx.emit_audio(pcm, slot=0)
