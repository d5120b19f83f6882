"""ProVoice decoder (EDACS digital voice: IMBE 7100x4400 on 9600 baud
GFSK 2-level).

Frame walk after the sync (reference src/protocol/provoice/provoice.c
processProVoice + provoice_frame.c dsd_provoice_load_imbe_frame_pair):

  [N64 initial][LID 16][N64 secondary]
  [IMBE-7100 frame pair, interleaved]
  [2 pad][BF 16]
  [IMBE-7100 frame pair, interleaved]
  [2 pad]

Each pair interleaves two 7x24 IMBE-7100 code-vector frames through the
w/x index tables (protocol constants; reference copies in
provoice_const.h) with an alternating 6/6-element segment walk.  The
IMBE-7100 vocoder ECC/dequantization is not implemented (no mbelib, no
fixture — the reference test suite has no ProVoice decode case either),
so the recovered frame bits are surfaced in event fields.
"""

from __future__ import annotations

import numpy as np

from dsdneo_tpu.protocol.base import (DecoderContext, DibitReader,
                                      ProtocolDecoder, register)
from dsdneo_tpu.symbols.framesync import SyncHit

# IMBE-7100 interleave schedule (protocol constants, provoice_const.h)
_W = [0,1,2,3,4,6,0,1,2,3,4,6,0,1,2,3,4,6,0,1,2,3,5,6,0,1,2,3,5,6,0,1,2,3,5,6,
      0,1,3,4,5,6,1,2,3,4,5,6,0,1,2,3,4,6,0,1,2,3,4,6,0,1,2,3,4,6,0,1,2,3,5,6,
      0,1,2,3,5,6,0,1,2,3,5,6,1,2,3,4,5,6,1,2,3,4,5,0,1,2,3,4,6,0,1,2,3,4,6,0,
      1,2,3,5,6,0,1,2,3,5,6,0,1,2,3,5,6,0,1,2,4,5,6,1,2,3,4,5,6,1,2,3,4,6]
_X = [18,18,17,16,7,21,15,15,14,13,4,18,12,12,11,10,1,15,9,9,8,7,13,12,6,6,5,4,
      10,9,3,3,2,1,7,6,0,0,22,13,4,3,21,20,19,10,1,0,17,17,16,15,6,20,14,14,13,
      12,3,17,11,11,10,9,0,14,8,8,7,6,12,11,5,5,4,3,9,8,2,2,1,0,6,5,23,22,21,
      12,3,2,20,19,18,9,0,16,16,15,14,5,19,13,13,12,11,2,16,10,10,9,8,14,13,7,
      7,6,5,11,10,4,4,3,2,8,7,1,1,0,14,5,4,22,21,20,11,2,1,19,18,17,8,22]



def _bti(bits) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


@register("provoice")
class ProVoiceDecoder(ProtocolDecoder):
    protocol = "provoice"

    def handle(self, reader: DibitReader, hit: SyncHit, ctx: DecoderContext) -> int:
        pos = hit.end
        polarity = "-" if reader.invert else "+"
        label = "EA " if hit.sync.kind == "ea" else ""

        bits, end = self._bits(reader, pos, 736)
        if bits is None:
            ctx.emit(f"Sync: {polarity}ProVoice {label}VOICE", "provoice",
                     hit.pos)
            return len(reader.dibits)
        cur = [0]

        def take(n):
            out = bits[cur[0]:cur[0] + n]
            cur[0] += n
            return out

        initial = _bti(take(64))
        lid = _bti(take(16))
        secondary = _bti(take(64))
        line = (f"Sync: {polarity}ProVoice {label}VOICE"
                f"\n N64: {initial:016X} LID: {lid:04X} {secondary:016X}")

        frames = []
        f1, f2 = self._load_pair(take)
        frames += [f1, f2]
        take(2)
        bf = _bti(take(16))
        line += f"\n BF: {bf:04X}"
        f3, f4 = self._load_pair(take)
        frames += [f3, f4]
        take(2)

        # IMBE-7100 ECC hypothesis pass (protocol/provoice/imbe7100.py):
        # per-frame corrected-bit counts; ~0 marks a clean decode under
        # the hypothesis convention, the random floor (~11/frame) marks
        # it unverified (no off-air ProVoice material exists to grade
        # the convention — see PARITY.md round-3 notes)
        from dsdneo_tpu.protocol.provoice.imbe7100 import decode_imbe7100_ecc
        errs = []
        params = []
        for fr in frames:
            b90, e = decode_imbe7100_ecc(fr)
            params.append(b90)
            errs.append(e)
        verified = float(np.mean(errs)) <= 3.0
        line += (f"\n IMBE7100 ERRS: {errs}"
                 + ("" if verified else " (ECC hypothesis unverified)"))
        ctx.emit(line, "provoice", hit.pos, lid=lid, bf=bf,
                 imbe7100_errs=errs)
        ctx.events[-1].fields["imbe7100_frames"] = np.stack(frames)
        ctx.events[-1].fields["imbe7100_params"] = np.stack(params)
        return pos + cur[0]

    @staticmethod
    def _bits(reader: DibitReader, pos: int, n: int):
        if pos + n > len(reader.dibits):
            return None, pos
        dd = reader.dibits[pos:pos + n].astype(np.uint8)
        bits = ((dd >> 1) & 1).astype(np.uint8)   # 2-level: sign bit
        if reader.invert:
            bits = bits ^ 1
        return bits, pos + n

    @staticmethod
    def _load_pair(take):
        """Deinterleave one IMBE-7100 frame pair: both frames share each
        6-entry window of the w/x tables (frame 1 first, then frame 2
        over the same entries), with frame 2's 12th window split 4+2
        around a 2-bit stream pad and two 5-entry windows mid/end.  The
        walk order lives in encode.pair_bit_schedule so the TX-side
        interleaver (protocol/provoice/encode.py) cannot drift."""
        from dsdneo_tpu.protocol.provoice.encode import pair_bit_schedule
        f1 = np.zeros((7, 24), dtype=np.uint8)
        f2 = np.zeros((7, 24), dtype=np.uint8)
        for tag, w, x in pair_bit_schedule():
            b = take(1)[0]
            if tag == "1":
                f1[w, x] = b
            elif tag == "2":
                f2[w, x] = b
        return f1, f2
