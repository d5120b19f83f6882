"""Trellis codes: P25 1/2-rate and DMR 3/4-rate decoders.

The P25 1/2-rate code (TIA-102.BAAA 5.3) maps each data dibit (which is
also the encoder state) to a 4-bit constellation nibble selected by
(previous state, next state); 49 steps cover 48 data dibits + flush.
The 98-dibit interleave is the standard P25 data interleave schedule.
Reference parity: src/protocol/p25/p25_12.c, src/fec/trellis34.c.

Host path is an exact Viterbi in numpy; the device path (fec.device)
runs the same 4-state lattice as a lax.scan over a channel batch.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

# (prev_state<<2 | next_state) -> transmitted nibble (dibit pair), per the
# P25 trellis state-transition matrix (TIA-102.BAAA table; same constant
# table in reference src/protocol/p25/p25_12.c:19).
P25_DTM = np.array([2, 12, 1, 15, 14, 0, 13, 3, 9, 7, 10, 4, 5, 11, 6, 8],
                   dtype=np.uint8)


@lru_cache(maxsize=None)
def interleave_98() -> np.ndarray:
    """P25/DMR 98-dibit interleave schedule: received dibit i carries
    deinterleaved position ``interleave_98()[i]``."""
    seq = []
    for base in (0, 2, 4, 6):
        for k in range(13):
            for off in (0, 1):
                v = base + 8 * k + off
                if v <= 97:
                    seq.append(v)
    out = np.array(seq, dtype=np.int64)
    assert out.shape[0] == 98 and len(set(out.tolist())) == 98
    return out


def p25_12_deinterleave_bits(bits196: np.ndarray) -> np.ndarray:
    """Deinterleave a 196-bit (98-dibit) trellis block."""
    il = interleave_98()
    out = np.zeros(196, dtype=bits196.dtype)
    out[il * 2] = bits196[0::2]
    out[il * 2 + 1] = bits196[1::2]
    return out


def p25_12_encode(bits96: np.ndarray) -> np.ndarray:
    """96 data bits → one 196-bit trellis block (for loopback tests)."""
    data = np.asarray(bits96, dtype=np.uint8)
    dibits = (data[0::2] << 1) | data[1::2]
    states = list(dibits) + [0]              # flush step
    dei = np.zeros(98, dtype=np.uint8)
    prev = 0
    for i, s in enumerate(states):
        nib = int(P25_DTM[(prev << 2) | int(s)])
        dei[2 * i] = (nib >> 2) & 3
        dei[2 * i + 1] = nib & 3
        prev = int(s)
    tx = dei[interleave_98()]
    out = np.zeros(196, dtype=np.uint8)
    out[0::2] = (tx >> 1) & 1
    out[1::2] = tx & 1
    return out


def p25_12_decode(bits196: np.ndarray, llr196: np.ndarray | None = None
                  ) -> tuple[np.ndarray, int]:
    """Decode one 196-bit P25 1/2-rate trellis block → (96 data bits,
    path cost).  Soft decoding when ``llr196`` (positive = bit 0 more
    likely... sign convention: llr > 0 ⇒ bit=0) is given.
    """
    if llr196 is None:
        llr196 = (1 - 2 * bits196.astype(np.int32)) * 64  # hard → ±64
    llr = np.zeros(196, dtype=np.int64)
    il = interleave_98()
    llr[il * 2] = llr196[0::2]
    llr[il * 2 + 1] = llr196[1::2]

    # per-step cost of each expected nibble: cost(bit=1) = max(llr,0) etc.
    steps = llr.reshape(49, 4)
    # cost_table[step, nibble] = sum over 4 bits
    nibbles = ((np.arange(16)[:, None] >> np.arange(3, -1, -1)[None, :]) & 1)  # [16,4]
    pos = np.maximum(steps, 0)    # cost if expected bit is 1
    neg = np.maximum(-steps, 0)   # cost if expected bit is 0
    cost_table = (nibbles[None] * pos[:, None, :] + (1 - nibbles[None]) * neg[:, None, :]).sum(-1)  # [49,16]

    INF = np.int64(1 << 60)
    metric = np.full(4, INF, dtype=np.int64)
    metric[0] = 0
    metric[1:] = 256  # mild bias toward the specified start state
    backptr = np.zeros((49, 4), dtype=np.int8)
    expect = P25_DTM[(np.arange(4)[:, None] << 2) | np.arange(4)[None, :]]  # [prev, next]
    for i in range(49):
        cand = metric[:, None] + cost_table[i][expect]
        backptr[i] = np.argmin(cand, axis=0)
        metric = np.min(cand, axis=0)

    st = int(np.argmin(metric))
    cost = int(np.min(metric))
    states = np.zeros(49, dtype=np.uint8)
    for i in range(48, -1, -1):
        states[i] = st
        st = int(backptr[i, st])
    data_dibits = states[:48]
    bits = np.zeros(96, dtype=np.uint8)
    bits[0::2] = (data_dibits >> 1) & 1
    bits[1::2] = data_dibits & 1
    return bits, cost
