"""CRC families used by the LMR protocols (exact integer semantics).

Reference parity: src/protocol/p25/p25_crc.c, src/protocol/nxdn/nxdn_crc.c,
M17 CRC16 in src/protocol/m17/m17.c.
"""

from __future__ import annotations

import numpy as np


def crc16_bits(bits: np.ndarray, poly: int = 0x1021, init: int = 0xFFFF,
               xorout: int = 0x0000) -> int:
    """Bitwise CRC-16 over a 0/1 bit array (msb-first)."""
    crc = init
    for b in np.asarray(bits, dtype=np.uint8):
        fb = ((crc >> 15) & 1) ^ int(b)
        crc = (crc << 1) & 0xFFFF
        if fb:
            crc ^= poly
    return crc ^ xorout


def crc12_bits(bits: np.ndarray, poly: int = 0x80F, init: int = 0x000,
               xorout: int = 0x000) -> int:
    crc = init
    for b in np.asarray(bits, dtype=np.uint8):
        fb = ((crc >> 11) & 1) ^ int(b)
        crc = (crc << 1) & 0xFFF
        if fb:
            crc ^= poly
    return crc ^ xorout


def crc9_bits(bits: np.ndarray, poly: int = 0x059, init: int = 0x000,
              xorout: int = 0x000) -> int:
    crc = init
    for b in np.asarray(bits, dtype=np.uint8):
        fb = ((crc >> 8) & 1) ^ int(b)
        crc = (crc << 1) & 0x1FF
        if fb:
            crc ^= poly
    return crc ^ xorout


def crc8_bits(bits: np.ndarray, poly: int = 0x07, init: int = 0x00,
              xorout: int = 0x00) -> int:
    crc = init
    for b in np.asarray(bits, dtype=np.uint8):
        fb = ((crc >> 7) & 1) ^ int(b)
        crc = (crc << 1) & 0xFF
        if fb:
            crc ^= poly
    return crc ^ xorout


def crc32_bits(bits: np.ndarray, poly: int = 0x04C11DB7, init: int = 0xFFFFFFFF,
               xorout: int = 0xFFFFFFFF) -> int:
    crc = init
    for b in np.asarray(bits, dtype=np.uint8):
        fb = ((crc >> 31) & 1) ^ int(b)
        crc = (crc << 1) & 0xFFFFFFFF
        if fb:
            crc ^= poly
    return crc ^ xorout
