"""P25 Phase 1 (C4FM/CQPSK) frame decoder.

Host-side protocol layer over the device dibit stream.  Structure
citations into the reference for parity checking:
  - NID read order / status skip: src/engine/dispatch/dispatch_p25p1.c:86-141
  - TSDU/TSBK: src/protocol/p25/phase1/p25p1_tsbk.c (trellis + CRC16)
  - LDU1 layout: src/protocol/p25/phase1/p25p1_ldu1.c:185-286
  - LCW formats: src/protocol/p25/p25_lcw.c
"""

from __future__ import annotations

import numpy as np

from dsdneo_tpu.fec import blockcodes, crc, rs, trellis
from dsdneo_tpu.protocol.base import (DecoderContext, DibitReader,
                                      ProtocolDecoder, register)
from dsdneo_tpu.symbols.framesync import SyncHit

DUID_NAMES = {0x0: "HDU", 0x3: "TDU", 0x5: "LDU1", 0x7: "TSDU",
              0xA: "LDU2", 0xC: "PDU", 0xF: "TDULC"}


def _bits_to_int(bits) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


@register("p25p1")
class P25P1Decoder(ProtocolDecoder):
    protocol = "p25p1"

    def handle(self, reader: DibitReader, hit: SyncHit, ctx: DecoderContext) -> int:
        reader.strip_status = True
        nid = self._read_nid(reader, ctx)
        if nid is None:
            return reader.pos
        nac, duid = nid
        s = ctx.state
        if nac not in (0, 0xFFF):
            s.nac = nac
            s.p2_cc = nac
        name = DUID_NAMES.get(duid, f"DUID {duid:X}")
        header = f"Sync: {hit.sync.name} | {ctx.frame_info()}{name}"
        ctx.emit(header, "p25p1", hit.pos, nac=nac, duid=duid)

        if duid == 0x7:
            self._tsdu(reader, hit, ctx)
        elif duid == 0x5:
            self._ldu1(reader, hit, ctx)
        elif duid == 0xA:
            self._ldu2(reader, hit, ctx)
        elif duid == 0x0:
            self._hdu(reader, hit, ctx)
        elif duid in (0x3, 0xF):
            pass  # terminator: nothing further to read before next sync
        return reader.pos

    # -- NID --------------------------------------------------------------
    def _read_nid(self, reader: DibitReader, ctx: DecoderContext):
        """63-bit BCH(63,16) + parity bit; soft ML decode."""
        if reader.remaining() < 40:
            return None
        bits, rel = reader.read_bits(32)       # status dibit auto-stripped
        code, code_rel = bits[:63], rel[:63]
        bch = blockcodes.bch_63_16()
        msg, errs = bch.decode(code, code_rel)
        if errs > 16:                           # implausible decode: noise
            return None
        nac = msg >> 4
        duid = msg & 0xF
        return nac, duid

    # -- TSDU -------------------------------------------------------------
    def _tsdu(self, reader: DibitReader, hit: SyncHit, ctx: DecoderContext) -> None:
        for _ in range(3):
            if reader.remaining() < 110:
                return
            bits, rel = reader.read_bits(98)
            llr = ((1 - 2 * bits.astype(np.int32)) * np.clip(rel * 64, 1, 127)).astype(np.int32)
            data96, _cost = trellis.p25_12_decode(bits, llr)
            if crc.crc16_bits(data96[:80], init=0, xorout=0xFFFF) != _bits_to_int(data96[80:96]):
                ctx.emit(" TSBK CRC ERR", "p25p1", hit.pos)
                return
            last = self._tsbk(data96, hit, ctx)
            if last:
                return

    def _tsbk(self, bits96: np.ndarray, hit: SyncHit, ctx: DecoderContext) -> bool:
        """Parse one TSBK; returns True when the Last Block flag is set.
        Field layouts per TIA-102.AABC (reference p25p1_tsbk.c)."""
        b = np.packbits(bits96[:96]).astype(np.int64)   # 12 bytes
        lb = (b[0] >> 7) & 1
        protect = (b[0] >> 6) & 1
        opcode = int(b[0] & 0x3F)
        mfid = int(b[1])
        s = ctx.state
        if protect or mfid >= 2:
            ctx.emit(f" TSBK MFID {mfid:02X} OP {opcode:02X}", "p25p1", hit.pos)
            return bool(lb)
        if opcode == 0x3B:    # Network Status Broadcast
            wacn = (int(b[3]) << 12) | (int(b[4]) << 4) | (int(b[5]) >> 4)
            sysid = ((int(b[5]) & 0xF) << 8) | int(b[6])
            channel = (int(b[7]) << 8) | int(b[8])
            s.p2_wacn, s.p2_sysid = wacn, sysid
            ctx.emit(f" Network Status Broadcast TSBK - Abbreviated \n"
                     f"  LRA [{int(b[2]):02X}] WACN [{wacn:05X}] SYSID [{sysid:03X}]"
                     f" NAC [{s.p2_cc:03X}] CHAN-T [{channel:04X}]",
                     "p25p1", hit.pos, wacn=wacn, sysid=sysid)
        elif opcode == 0x3A:  # RFSS Status Broadcast
            syid = ((int(b[3]) & 0xF) << 8) | int(b[4])
            rfss, site = int(b[5]), int(b[6])
            channel = (int(b[7]) << 8) | int(b[8])
            s.p2_rfssid, s.p2_siteid = rfss, site
            ctx.emit(f" RFSS Status Broadcast TSBK - Abbreviated \n"
                     f"  SYSID [{syid:03X}] RFSS [{rfss:03d}] SITE [{site:03d}]"
                     f" CHAN-T [{channel:04X}]", "p25p1", hit.pos)
        elif opcode == 0x00:  # Group Voice Channel Grant
            channel = (int(b[4]) << 8) | int(b[5])
            group = (int(b[6]) << 8) | int(b[7])
            src = (int(b[8]) << 16) | (int(b[9]) << 8) | int(b[10])
            s.last_tg, s.last_src = group, src
            ctx.emit(f" Group Voice Channel Grant Update\n"
                     f"  CHAN [{channel:04X}] TG [{group}] SRC [{src}]",
                     "p25p1", hit.pos, tg=group, src=src, channel=channel)
        elif opcode == 0x02:  # Group Voice Channel Grant Update
            ch1 = (int(b[2]) << 8) | int(b[3])
            g1 = (int(b[4]) << 8) | int(b[5])
            ch2 = (int(b[6]) << 8) | int(b[7])
            g2 = (int(b[8]) << 8) | int(b[9])
            ctx.emit(f" Group Voice Channel Grant Update"
                     f" CH1 [{ch1:04X}] TG1 [{g1}] CH2 [{ch2:04X}] TG2 [{g2}]",
                     "p25p1", hit.pos, tg=g1, channel=ch1)
        elif opcode in (0x34, 0x3D):  # IDEN_UP (VHF/UHF, 800)
            iden = int(b[2]) >> 4
            ctx.emit(f" Channel Identifier Update IDEN [{iden:X}]", "p25p1", hit.pos)
        elif opcode == 0x39:  # Secondary CC Broadcast
            ctx.emit(" Secondary Control Channel Broadcast", "p25p1", hit.pos)
        elif opcode == 0x3C:  # Adjacent Status Broadcast
            ctx.emit(" Adjacent Status Broadcast", "p25p1", hit.pos)
        else:
            ctx.emit(f" TSBK OP [{opcode:02X}]", "p25p1", hit.pos)
        return bool(lb)

    # -- LDU1 -------------------------------------------------------------
    def _read_hexwords(self, reader: DibitReader, n: int):
        """Read n Hamming(10,6,3)-protected hexbits → (values, err flags)."""
        ham = blockcodes.hamming_10_6_3()
        vals = np.zeros(n, dtype=np.int64)
        errs = np.zeros(n, dtype=np.int64)
        for i in range(n):
            bits, rel = reader.read_bits(5)
            m, e = ham.decode(bits, rel)
            vals[i] = m
            errs[i] = e
        return vals, errs

    def _ldu1(self, reader: DibitReader, hit: SyncHit, ctx: DecoderContext) -> None:
        if reader.remaining() < 820:
            return
        imbe = []
        hexwords = np.zeros(24, dtype=np.int64)
        hexerrs = np.zeros(24, dtype=np.int64)
        w = 0
        for seg in range(8):
            bits, _ = reader.read_bits(72)
            imbe.append(bits)
            if seg >= 1 and seg <= 6:
                vals, errs = self._read_hexwords(reader, 4)
                hexwords[w:w + 4] = vals
                hexerrs[w:w + 4] = errs
                w += 4
            elif seg == 7:
                reader.read(16)                    # LSD (2×(16,8) codewords)
        bits, _ = reader.read_bits(72)
        imbe.append(bits)

        code = rs.rs_24_12_13()
        word = hexwords.copy()
        eras = [int(i) for i in np.nonzero(hexerrs >= 2)[0]]
        dec, nerr = code.decode(word, erasures=eras)
        lc_bits = np.zeros(72, dtype=np.uint8)
        for i in range(12):
            for j in range(6):
                lc_bits[i * 6 + j] = (dec[i] >> (5 - j)) & 1
        if nerr < 0:
            ctx.emit(" LDU1 LC RS FEC ERR", "p25p1", hit.pos)
        else:
            self._lcw(lc_bits, hit, ctx)
        ctx.emit(" LDU1 VOICE (9 IMBE frames)", "p25p1", hit.pos,
                 imbe=np.stack(imbe))
        self._voice(imbe, ctx)

    def _voice(self, imbe_frames: list[np.ndarray], ctx: DecoderContext) -> None:
        """IMBE ECC + parameter decode + synthesis → 8 kHz PCM."""
        from dsdneo_tpu.protocol.p25.imbe_frame import decode_imbe_ecc
        from dsdneo_tpu.vocoder.mbe import decode_imbe_4400
        from dsdneo_tpu.vocoder.synth import synthesize_frames
        params = []
        for fr in imbe_frames:
            bits88, _errs = decode_imbe_ecc(fr)
            params.append(decode_imbe_4400(bits88))
        pcm = synthesize_frames(params)
        if pcm.size:
            ctx.emit_audio(pcm, slot=0)

    def _lcw(self, bits: np.ndarray, hit: SyncHit, ctx: DecoderContext) -> None:
        """Link Control Word (reference p25_lcw.c formats)."""
        lcf = _bits_to_int(bits[0:8])
        if lcf == 0x00:
            group = _bits_to_int(bits[32:48])
            src = _bits_to_int(bits[48:72])
            ctx.state.last_tg, ctx.state.last_src = group, src
            ctx.emit(f" Group Voice Channel User - Group {group} Source {src}",
                     "p25p1", hit.pos, tg=group, src=src)
        elif lcf == 0x03:
            target = _bits_to_int(bits[24:48])
            src = _bits_to_int(bits[48:72])
            ctx.emit(f" Unit to Unit Voice Channel User - Target {target} Source {src}",
                     "p25p1", hit.pos, src=src)
        elif lcf == 0x42:
            ch1 = _bits_to_int(bits[8:24])
            g1 = _bits_to_int(bits[24:40])
            ctx.emit(f" Group Voice Channel Update - Ch: {ch1:04X} TG: {g1}; ",
                     "p25p1", hit.pos, tg=g1)
        else:
            ctx.emit(f" LCW LCF [{lcf:02X}]", "p25p1", hit.pos)

    # -- LDU2 / HDU (voice continuation / header) -------------------------
    def _ldu2(self, reader: DibitReader, hit: SyncHit, ctx: DecoderContext) -> None:
        if reader.remaining() < 820:
            return
        imbe = []
        hexwords = np.zeros(24, dtype=np.int64)
        w = 0
        for seg in range(8):
            bits, _ = reader.read_bits(72)
            imbe.append(bits)
            if 1 <= seg <= 6:
                vals, _errs = self._read_hexwords(reader, 4)
                hexwords[w:w + 4] = vals
                w += 4
            elif seg == 7:
                reader.read(16)
        bits, _ = reader.read_bits(72)
        imbe.append(bits)
        code = rs.rs_24_16_9()
        dec, nerr = code.decode(hexwords)
        if nerr >= 0:
            es_bits = np.zeros(96, dtype=np.uint8)
            for i in range(16):
                for j in range(6):
                    es_bits[i * 6 + j] = (dec[i] >> (5 - j)) & 1
            algid = _bits_to_int(es_bits[72:80])
            kid = _bits_to_int(es_bits[80:96])
            ctx.emit(f" LDU2 ALG ID [{algid:02X}] KEY ID [{kid:04X}]",
                     "p25p1", hit.pos, algid=algid, kid=kid)
        ctx.emit(" LDU2 VOICE (9 IMBE frames)", "p25p1", hit.pos,
                 imbe=np.stack(imbe))
        self._voice(imbe, ctx)

    def _hdu(self, reader: DibitReader, hit: SyncHit, ctx: DecoderContext) -> None:
        """Header Data Unit: 36 Golay(18,6)-protected hexbits, RS(36,20,17)."""
        if reader.remaining() < 350:
            return
        gol = blockcodes.golay_18_6_8()
        hexwords = np.zeros(36, dtype=np.int64)
        for i in range(36):
            bits, rel = reader.read_bits(9)
            m, _e = gol.decode(bits, rel)
            hexwords[i] = m
        code = rs.rs_36_20_17()
        dec, nerr = code.decode(hexwords)
        if nerr < 0:
            ctx.emit(" HDU RS FEC ERR", "p25p1", hit.pos)
            return
        bits120 = np.zeros(120, dtype=np.uint8)
        for i in range(20):
            for j in range(6):
                bits120[i * 6 + j] = (dec[i] >> (5 - j)) & 1
        algid = _bits_to_int(bits120[72:80])
        kid = _bits_to_int(bits120[80:96])
        tgid = _bits_to_int(bits120[104:120])
        ctx.emit(f" HDU ALG ID [{algid:02X}] KEY ID [{kid:04X}] TG [{tgid}]",
                 "p25p1", hit.pos, algid=algid, tgid=tgid)
