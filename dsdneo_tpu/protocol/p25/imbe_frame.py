"""P25 Phase 1 IMBE voice frame ECC: interleave, PN descramble, FEC.

A 144-bit voice frame carries 8 code vectors: u0-u3 Golay(23,12),
u4-u6 Hamming(15,11), u7 raw 7 bits → 88 parameter bits.  Vectors
u1-u6 are scrambled by the IMBE PN sequence seeded from the corrected
u0.  The dibit interleave schedule is the P25 CAI table (reference copy
at include/dsd-neo/protocol/p25/p25p1_const.h).

STATUS: interleave + u0 Golay are validated bit-exact on the reference
fixtures (u0 decodes with 0 errors on every clean frame).  The PN
recurrence used for u1-u6 descrambling is a placeholder — the exact
TIA-102.BABA sequence constants remain to be sourced (the fixture's
repeated frames defeat empirical recovery), so u1-u6 decode with
residual errors; see PARITY.md.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from dsdneo_tpu.fec import gf
from dsdneo_tpu.fec.blockcodes import MLBlockCode, hamming_15_11

IMBE_W = [0,2,4,1,3,5,0,2,4,1,3,6,0,2,4,1,3,6,0,2,4,1,3,6,
          0,2,4,1,3,6,0,2,4,1,3,6,0,2,5,1,3,6,0,2,5,1,3,6,
          0,2,5,1,3,7,0,2,5,1,3,7,0,2,5,1,4,7,0,3,5,2,4,7]
IMBE_X = [22,20,10,20,18,0,20,18,8,18,16,13,18,16,6,16,14,11,
          16,14,4,14,12,9,14,12,2,12,10,7,12,10,0,10,8,5,
          10,8,13,8,6,3,8,6,11,6,4,1,6,4,9,4,2,6,
          4,2,7,2,0,4,2,0,5,0,13,2,0,21,3,21,11,0]
IMBE_Y = [1,3,5,0,2,4,1,3,6,0,2,4,1,3,6,0,2,4,1,3,6,0,2,4,
          1,3,6,0,2,4,1,3,6,0,2,5,1,3,6,0,2,5,1,3,6,0,2,5,
          1,3,6,0,2,5,1,3,7,0,2,5,1,4,7,0,3,5,2,4,7,1,3,5]
IMBE_Z = [21,19,1,21,19,9,19,17,14,19,17,7,17,15,12,17,15,5,
          15,13,10,15,13,3,13,11,8,13,11,1,11,9,6,11,9,14,
          9,7,4,9,7,12,7,5,2,7,5,10,5,3,0,5,3,8,
          3,1,5,3,1,6,1,14,3,1,22,4,22,12,1,22,20,2]


@lru_cache(maxsize=None)
def golay_23_12() -> MLBlockCode:
    """Perfect binary Golay(23,12,7), generator 0xAE3, data-first."""
    cb = gf.systematic_codebook(0b101011100011, 23, 12)
    return MLBlockCode(cb, 23, 12, "Golay(23,12,7)")


def _pn_bits(seed12: int, n: int) -> np.ndarray:
    pr = 16 * seed12
    out = np.zeros(n, dtype=np.uint8)
    for i in range(n):
        pr = (173 * pr + 13849) & 0xFFFF
        out[i] = pr >> 15
    return out


def _bti(bits) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def decode_imbe_ecc(bits144: np.ndarray) -> tuple[np.ndarray, int]:
    """144 on-air bits → (88 imbe_d parameter bits, bit error count)."""
    fr = np.zeros((8, 23), dtype=np.uint8)
    b = np.asarray(bits144, dtype=np.uint8)
    for j in range(72):
        fr[IMBE_W[j]][IMBE_X[j]] = b[2 * j]
        fr[IMBE_Y[j]][IMBE_Z[j]] = b[2 * j + 1]

    g23 = golay_23_12()
    h15 = hamming_15_11()
    errs = 0

    u0, e0 = g23.decode(fr[0])
    errs += e0
    pn = _pn_bits(u0, 114)
    pos = 0
    out = np.zeros(88, dtype=np.uint8)
    out[0:12] = [(u0 >> (11 - i)) & 1 for i in range(12)]
    k = 12
    for row in range(1, 4):
        word = fr[row] ^ pn[pos:pos + 23]
        pos += 23
        m, e = g23.decode(word)
        errs += e
        out[k:k + 12] = [(m >> (11 - i)) & 1 for i in range(12)]
        k += 12
    for row in range(4, 7):
        word = fr[row][:15] ^ pn[pos:pos + 15]
        pos += 15
        m, e = h15.decode(word)
        errs += e
        out[k:k + 11] = [(m >> (10 - i)) & 1 for i in range(11)]
        k += 11
    out[k:k + 7] = fr[7][:7]
    return out, errs
