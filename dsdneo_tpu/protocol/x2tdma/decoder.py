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


@register("x2tdma")
class X2TdmaDecoder(ProtocolDecoder):
    protocol = "x2tdma"

    def __init__(self):
        self.vc = {0: 0, 1: 0}

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
            ctx.emit(f"Sync: {polarity}X2-TDMA {kind.replace('_', ' ').upper()}",
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
