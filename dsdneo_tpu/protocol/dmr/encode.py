"""DMR TX-side synthesis for tests/benchmarks: Tier III control-channel
CSBK bursts assembled exactly along the decoder's own burst geometry
(protocol/dmr/bs.py _data_burst; engine/ccbatch.py _ST_OFFS /
_PAYLOAD_OFFS), so a synthesized stream and the decode walk share one
layout definition by construction.

The reference has no DMR transmitter; this module exists (like
protocol/provoice/encode.py) to close fixture gaps: ETSI TS 102 361-4
Tier III CC traffic for closed-loop trunking tests where no off-air
capture with a *grant + voice on a second channel* exists.

Burst layout on the 4.8 kdib/s stream, relative to the 24-dibit BS data
sync at position p: payload dibits [p-54, p-5), slot type [p-5, p) +
[p+24, p+29), sync [p, p+24), payload [p+29, p+78).  A full TDMA
slot-burst is CACH (12 dibits) + 132 burst dibits = 144 dibits.
"""

from __future__ import annotations

import numpy as np

from dsdneo_tpu.fec import blockcodes, crc as crcmod
from dsdneo_tpu.fec.bptc import bptc_196_96_encode

# '1' = +3 = dibit 1, '3' = -3 = dibit 3 (symbols/framesync.py alphabet)
_BS_DATA_SYNC = np.array(
    [1 if ch == "1" else 3 for ch in "313333111331131131331131"],
    dtype=np.uint8)


def _put(bits: np.ndarray, at: int, width: int, value: int) -> None:
    for i in range(width):
        bits[at + i] = (value >> (width - 1 - i)) & 1


def csbk_bits(op: int, fid: int, data: bytes | list[int],
              lb: bool = True) -> np.ndarray:
    """One 96-bit CSBK: LB|PF|opcode6, FID, 8 data bytes, CRC16 with
    the 0xA5A5 CSBK mask (the screen in engine/ccbatch.py
    BatchedDmrControlPipeline and fec CRC check both use it)."""
    data = bytes(data)
    assert len(data) == 8, "CSBK carries 8 data bytes"
    bits = np.zeros(96, dtype=np.uint8)
    bits[0] = 1 if lb else 0
    _put(bits, 2, 6, op)
    _put(bits, 8, 8, fid)
    for i, b in enumerate(data):
        _put(bits, 16 + 8 * i, 8, b)
    c = crcmod.crc16_bits(bits[:80], poly=0x1021, init=0,
                          xorout=0xFFFF) ^ 0xA5A5
    _put(bits, 80, 16, c)
    return bits


def tv_grant_csbk(lpcn: int, ts: int, tg: int, src: int,
                  emergency: bool = False) -> np.ndarray:
    """Talkgroup Voice Channel Grant (TV_Grant, opcode 49): lpcn at
    bits 16:12, TS bit 28, emergency bit 30, target 32:24, source
    56:24 (csbk.py _grant field map = dmr_csbk.c handle_grants)."""
    data = bytes([
        (lpcn >> 4) & 0xFF,
        ((lpcn & 0xF) << 4) | ((ts & 1) << 3) | ((1 if emergency else 0) << 1),
        (tg >> 16) & 0xFF, (tg >> 8) & 0xFF, tg & 0xFF,
        (src >> 16) & 0xFF, (src >> 8) & 0xFF, src & 0xFF,
    ])
    return csbk_bits(49, 0, data)


def data_burst_dibits(bits96: np.ndarray, cc: int = 1,
                      dtype: int = 3) -> np.ndarray:
    """96 payload bits → one 132-dibit data burst: BPTC(196,96) encode
    + interleave, Golay(20,8) slot type (msg = cc<<4 | dtype), BS data
    sync center."""
    on_air = bptc_196_96_encode(np.asarray(bits96, np.uint8))
    pay = (on_air[0::2] * 2 + on_air[1::2]).astype(np.uint8)   # 98 dibits
    st_bits = blockcodes.golay_20_8().encode(((cc & 0xF) << 4)
                                             | (dtype & 0xF))
    st = (st_bits[0::2] * 2 + st_bits[1::2]).astype(np.uint8)  # 10 dibits
    return np.concatenate([pay[:49], st[:5], _BS_DATA_SYNC,
                           st[5:], pay[49:]])


def cc_stream_dibits(csbks: list[np.ndarray], cc: int = 1,
                     seed: int = 0) -> np.ndarray:
    """A Tier III CC dibit stream: each CSBK rides one slot-burst
    (CACH filler + burst), bursts back to back as on a dedicated
    TSCC."""
    rng = np.random.default_rng(seed)
    parts = [rng.integers(0, 4, 60).astype(np.uint8)]
    for bits96 in csbks:
        parts.append(rng.integers(0, 4, 12).astype(np.uint8))   # CACH
        parts.append(data_burst_dibits(bits96, cc=cc))
    parts.append(rng.integers(0, 4, 60).astype(np.uint8))
    return np.concatenate(parts)
