"""AMBE+2 (3600x2450) voice frame ECC for DMR/dPMR/NXDN/YSF.

A 72-bit frame carries 4 code vectors: C0 Golay(24,12), C1 Golay(23,12)
(PN-scrambled from the corrected C0), C2 11 raw bits, C3 14 raw bits →
49 parameter bits.  The DMR dibit interleave is the standard map
(reference copy include/dsd-neo/core/ambe_interleave.h).

STATUS: fully recovered empirically from the NXDN fixtures' clean
voice (137 zero-error C0 anchors).  C0 = Golay(23,12) generator 0xAE3
over frame bits [0:23] with overall parity at bit 23.  C1 PN: the
shared 173x+13849 recurrence (MSB out), seeded with 16x the corrected
C0 row bits [12..24) read LSB-first (the parity bit participates),
applied in reverse bit order over C1's 23 bits — C1 then decodes at
0.13 avg corrections/frame (vs ~2.4 = random) across 87 distinct
frames.
"""

from __future__ import annotations

import numpy as np

from dsdneo_tpu.protocol.p25.imbe_frame import golay_23_12, _pn_bits

# (high_row, high_col, low_row, low_col) per dibit
AMBE_MAP = [
    (0, 23, 0, 5), (1, 10, 2, 3), (0, 22, 0, 4), (1, 9, 2, 2), (0, 21, 0, 3), (1, 8, 2, 1),
    (0, 20, 0, 2), (1, 7, 2, 0), (0, 19, 0, 1), (1, 6, 3, 13), (0, 18, 0, 0), (1, 5, 3, 12),
    (0, 17, 1, 22), (1, 4, 3, 11), (0, 16, 1, 21), (1, 3, 3, 10), (0, 15, 1, 20), (1, 2, 3, 9),
    (0, 14, 1, 19), (1, 1, 3, 8), (0, 13, 1, 18), (1, 0, 3, 7), (0, 12, 1, 17), (2, 10, 3, 6),
    (0, 11, 1, 16), (2, 9, 3, 5), (0, 10, 1, 15), (2, 8, 3, 4), (0, 9, 1, 14), (2, 7, 3, 3),
    (0, 8, 1, 13), (2, 6, 3, 2), (0, 7, 1, 12), (2, 5, 3, 1), (0, 6, 1, 11), (2, 4, 3, 0),
]


def deinterleave_ambe72(bits72: np.ndarray) -> np.ndarray:
    """72 on-air bits (36 dibits) → ambe_fr[4][24]."""
    fr = np.zeros((4, 24), dtype=np.uint8)
    b = np.asarray(bits72, dtype=np.uint8)
    for j, (hr, hc, lr, lc) in enumerate(AMBE_MAP):
        fr[hr][hc] = b[2 * j]
        fr[lr][lc] = b[2 * j + 1]
    return fr


def decode_ambe_ecc(bits72: np.ndarray) -> tuple[np.ndarray, int]:
    """72 on-air bits → (49 AMBE parameter bits, error count)."""
    fr = deinterleave_ambe72(bits72)
    g23 = golay_23_12()
    errs = 0
    c0, e0 = g23.decode(fr[0][0:23])
    errs += e0
    cw0 = g23.codebook[c0]
    parity = int(cw0.sum()) & 1
    if parity != int(fr[0][23]):
        errs += 1                      # overall parity mismatch
    # PN seed: corrected C0 row bits [12..24) LSB-first (incl. parity)
    foo = 0
    for k in range(11):
        foo |= int(cw0[12 + k]) << k
    foo |= parity << 11
    pn = _pn_bits(foo, 23)
    c1, e1 = g23.decode(fr[1][:23] ^ pn[::-1])
    errs += e1
    out = np.zeros(49, dtype=np.uint8)
    out[0:12] = [(c0 >> (11 - i)) & 1 for i in range(12)]
    out[12:24] = [(c1 >> (11 - i)) & 1 for i in range(12)]
    out[24:35] = fr[2][:11]
    out[35:49] = fr[3][:14]
    return out, errs


def encode_ambe_ecc(bits49: np.ndarray) -> np.ndarray:
    """49 AMBE parameter bits → 72 on-air bits (inverse of
    ``decode_ambe_ecc``; tests/loopback tooling)."""
    b = np.asarray(bits49, dtype=np.uint8)
    g23 = golay_23_12()
    fr = np.zeros((4, 24), dtype=np.uint8)
    m0 = 0
    for i in range(12):
        m0 = (m0 << 1) | int(b[i])
    cw0 = g23.codebook[m0]
    parity = int(cw0.sum()) & 1
    fr[0][:23] = cw0
    fr[0][23] = parity
    foo = 0
    for k in range(11):
        foo |= int(cw0[12 + k]) << k
    foo |= parity << 11
    pn = _pn_bits(foo, 23)
    m1 = 0
    for i in range(12):
        m1 = (m1 << 1) | int(b[12 + i])
    fr[1][:23] = g23.codebook[m1] ^ pn[::-1]
    fr[2][:11] = b[24:35]
    fr[3][:14] = b[35:49]
    out = np.zeros(72, dtype=np.uint8)
    for j, (hr, hc, lr, lc) in enumerate(AMBE_MAP):
        out[2 * j] = fr[hr][hc]
        out[2 * j + 1] = fr[lr][lc]
    return out
