"""P25 Phase 1 frame SYNTHESIS: TSDU/LDU dibit streams + C4FM I/Q.

The reference generates its I/Q regression fixtures with an offline
tool (tools/build_iq_fixtures.py, provenance docs/testing.md:33-66);
this module is the rebuild's equivalent generator — real BCH NID, real
1/2-rate trellis TSBKs with CRC16, real IMBE ECC voice frames, status
dibits on the 36-dibit grid — so control-channel + trunking tests and
benches can run on synthesized wideband material (the reference ships
no multi-channel capture at all).

Layouts mirror the decode side exactly:
  - NID read order / status stripping: protocol/p25/phase1.py _read_nid
    (reference src/engine/dispatch/dispatch_p25p1.c:86-141)
  - TSDU: 3 trellis blocks (reference p25p1_tsbk.c:1054 processTSBK)
  - LDU voice-frame offsets: engine/voicebatch.py LDU_IMBE_OFFSETS
    (reference p25p1_ldu1.c:185-286)
"""

from __future__ import annotations

import numpy as np

from dsdneo_tpu.fec import blockcodes, crc, trellis

def _p25_sync_dibits() -> np.ndarray:
    from dsdneo_tpu.symbols import framesync
    d = next(x for x in framesync.SYNC_DEFS if x.name == "+P25p1")
    return np.asarray([int(c) for c in d.pattern], dtype=np.uint8)


SYNC_DIBITS = _p25_sync_dibits()


def nid_dibits(nac: int, duid: int) -> np.ndarray:
    """BCH(63,16)-encoded NID + 1 pad bit → 32 dibits."""
    code = blockcodes.bch_63_16().encode(((nac & 0xFFF) << 4) | (duid & 0xF))
    bits64 = np.concatenate([code, np.zeros(1, np.uint8)])
    return ((bits64[0::2] << 1) | bits64[1::2]).astype(np.uint8)


def tsbk_bytes(opcode: int, args: bytes | list[int], mfid: int = 0,
               lb: bool = False) -> np.ndarray:
    """One 12-byte TSBK: header + 8 argument bytes + CRC16(xor 0xFFFF)."""
    b = np.zeros(12, dtype=np.uint8)
    b[0] = (0x80 if lb else 0) | (opcode & 0x3F)
    b[1] = mfid & 0xFF
    a = list(args)
    b[2:2 + len(a)] = a
    bits = np.unpackbits(b[:10])
    v = crc.crc16_bits(bits, init=0, xorout=0xFFFF)
    b[10] = (v >> 8) & 0xFF
    b[11] = v & 0xFF
    return b


def iden_up_tsbk(iden: int, base_hz: float, spacing_hz: float,
                 offset_hz: float = 0.0, bw: int = 0x4,
                 lb: bool = False) -> np.ndarray:
    """Identifier Update (opcode 0x3D): channel→frequency math record
    (decode side: phase1._iden_update; reference p25_frequency.c)."""
    base = int(round(base_hz / 5.0))
    spac = int(round(spacing_hz / 125.0)) & 0x3FF
    raw = int(round(abs(offset_hz) / 250e3)) & 0xFF
    sign = 1 if offset_hz >= 0 else 0
    args = [
        ((iden & 0xF) << 4) | ((bw >> 5) & 0xF),
        ((bw & 0x1F) << 3) | (sign << 2) | ((raw >> 6) & 3),
        ((raw & 0x3F) << 2) | ((spac >> 8) & 3),
        spac & 0xFF,
        (base >> 24) & 0xFF, (base >> 16) & 0xFF,
        (base >> 8) & 0xFF, base & 0xFF,
    ]
    return tsbk_bytes(0x3D, args, lb=lb)


def iden_up_tdma_tsbk(iden: int, base_hz: float, spacing_hz: float,
                      offset_hz: float = 0.0, chan_type: int = 3,
                      lb: bool = False) -> np.ndarray:
    """Identifier Update for TDMA (opcode 0x33): like iden_up but the
    channel-type nibble marks the slots/channel (3 → 2-slot Phase 2;
    decode side: phase1._iden_update chan_type slots map; reference
    p25_frequency.c TDMA iden records)."""
    base = int(round(base_hz / 5.0))
    spac = int(round(spacing_hz / 125.0)) & 0x3FF
    raw = int(round(abs(offset_hz) / 250e3)) & 0x1FFF
    sign = 1 if offset_hz >= 0 else 0
    args = [
        ((iden & 0xF) << 4) | (chan_type & 0xF),
        (sign << 7) | ((raw >> 6) & 0x7F),
        ((raw & 0x3F) << 2) | ((spac >> 8) & 3),
        spac & 0xFF,
        (base >> 24) & 0xFF, (base >> 16) & 0xFF,
        (base >> 8) & 0xFF, base & 0xFF,
    ]
    return tsbk_bytes(0x33, args, lb=lb)


def group_grant_tsbk(channel16: int, tg: int, src: int, svc: int = 0,
                     lb: bool = False) -> np.ndarray:
    """Group Voice Channel Grant (opcode 0x00): svc@2 chan@3-4
    group@5-6 src@7-9 (decode side: phase1._tsbk opcode 0x00)."""
    args = [svc & 0xFF,
            (channel16 >> 8) & 0xFF, channel16 & 0xFF,
            (tg >> 8) & 0xFF, tg & 0xFF,
            (src >> 16) & 0xFF, (src >> 8) & 0xFF, src & 0xFF]
    return tsbk_bytes(0x00, args, lb=lb)


def _with_status(data_dibits: np.ndarray, start: int = 24) -> np.ndarray:
    """Insert status dibits (value 0) so data lands only at raw stream
    positions q (relative to frame start) with q % 36 != 35 — the
    inverse of voicebatch._status_strip_map."""
    out = []
    q = start
    for d in data_dibits:
        while q % 36 == 35:
            out.append(0)
            q += 1
        out.append(int(d))
        q += 1
    return np.asarray(out, dtype=np.uint8)


def tsdu_frame(nac: int, payloads: list[np.ndarray]) -> np.ndarray:
    """One TSDU frame (sync + NID + up to 3 TSBK trellis blocks) as a
    raw dibit stream with status dibits in place.  The LAST payload
    should carry the Last Block flag (tsbk_bytes lb=True)."""
    assert 1 <= len(payloads) <= 3
    data = [nid_dibits(nac, 0x7)]
    for p in payloads:
        bits196 = trellis.p25_12_encode(np.unpackbits(np.asarray(p, np.uint8)))
        data.append(((bits196[0::2] << 1) | bits196[1::2]).astype(np.uint8))
    body = _with_status(np.concatenate(data), start=len(SYNC_DIBITS))
    return np.concatenate([SYNC_DIBITS, body])


def ldu_frame(nac: int, frames144: np.ndarray, duid: int = 5,
              seed: int = 0) -> np.ndarray:
    """One LDU frame: sync + NID + 9 ECC'd IMBE frames ([9, 144] bits)
    at the voicebatch LDU offsets; LCW/LSD gap dibits are random."""
    from dsdneo_tpu.engine.voicebatch import (LDU_DATA_DIBITS,
                                              LDU_IMBE_OFFSETS)
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 4, 32 + LDU_DATA_DIBITS).astype(np.uint8)
    data[:32] = nid_dibits(nac, duid)
    for j, off in enumerate(LDU_IMBE_OFFSETS):
        b = np.asarray(frames144[j], dtype=np.uint8)
        data[32 + off:32 + off + 72] = (b[0::2] << 1) | b[1::2]
    body = _with_status(data, start=len(SYNC_DIBITS))
    return np.concatenate([SYNC_DIBITS, body])


def c4fm_iq(dibits: np.ndarray, sps: int = 10, fs: float = 48000.0,
            dev_hz: float = 1800.0, snr_db: float = 30.0,
            seed: int = 0) -> np.ndarray:
    """Dibit stream → complex C4FM-style baseband (same shaping as the
    DSP unit tests' generator, tests/test_dsp.py synth_c4fm)."""
    lv = np.array([1.0, 3.0, -1.0, -3.0])[np.asarray(dibits)]
    inst = np.repeat(lv, sps) * (dev_hz / 3.0)
    k = max(sps // 2, 1)
    inst = np.convolve(inst, np.ones(k) / k, mode="same")
    phase = 2 * np.pi * np.cumsum(inst) / fs
    x = np.exp(1j * phase)
    rng = np.random.default_rng(seed)
    noise = rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
    return (x + noise * 10 ** (-snr_db / 20)).astype(np.complex64)


def random_voice_ldus(n_ldus: int, seed: int = 0) -> np.ndarray:
    """[n_ldus, 9, 144] ECC'd IMBE voice frames with coherent random
    parameters (through the real quantizer + ECC encoders)."""
    from dsdneo_tpu.protocol.p25.imbe_frame import encode_imbe_ecc
    from dsdneo_tpu.vocoder.imbe import ImbeParams, encode_frame, \
        harmonics_for_b0
    rng = np.random.default_rng(seed)
    w0, L, K = harmonics_for_b0(80)
    out = np.zeros((n_ldus, 9, 144), dtype=np.uint8)
    prev = None
    for i in range(n_ldus):
        for j in range(9):
            p = ImbeParams(b0=80, w0=w0, L=L, K=K,
                           voiced_bands=np.ones(K, np.uint8),
                           log_m=rng.uniform(1.0, 5.0, size=L),
                           gain_code=40)
            out[i, j] = encode_imbe_ecc(encode_frame(p, prev))
            prev = p
    return out
