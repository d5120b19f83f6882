"""IMBE 7200x4400 parameter quantizer/dequantizer (P25 Phase 1 full rate).

The reference delegates this to the external mbelib-neo (call contract
src/core/vocoder/dsd_mbe.c:1908-1916); neither that library nor the
TIA-102.BABA tables are available in this environment, so this is a
ground-up implementation of the IMBE parameter model with the bit
layout recovered empirically from the reference's own off-air fixtures
(tests/fixtures/iq/p25p1_*_vc) using FEC-validated voice frames:

RECOVERED (fixture-validated, see tests):
  - parameter-bit basis: each Golay(23,12) vector contributes codeword
    bits [22..11] MSB-first (the same convention that seeds the frame's
    PN scrambler), each Hamming(15,11) vector bits [14..4], u7 reversed;
  - b2 (gain, 6 bits) at S[0:6] — smooth track on speech;
  - b0 bits 7..2 at S[6:12] — monotone flip-rate ramp 0.07->0.51 and a
    smooth in-range pitch track; b0 bits 1,0 at S[44], S[43] (weak
    evidence: best cross-capture smoothness of ~5.5k candidate pairs);
  - b1 (voicing, K bits, band 1 first) at S[48:48+K] — transition
    density 0.11 vs 0.5 for random bits;
  - S[87] alternates every frame: the sync bit.

INFERRED (standard MBE structure, not bit-exact vs DVSI):
  - the spectral-amplitude transform: 6-block DCT of log2 prediction
    residuals with the block DCs encoded through a 6-point PRBA DCT,
    inter-frame prediction with decay 0.7;
  - the adaptive bit allocation: a deterministic greedy water-fill over
    (73 - K) bits (exactly invertible — see tests' encode/decode
    roundtrip), standing in for the spec's allocation tables;
  - quantizer step sizes.

Frames: 20 ms, 160 samples at 8 kHz.  b0 in [0, 207],
w0 = 4*pi/(b0+39.5), L in [9, 56], K = ceil(L/3) capped at 12.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

MAX_L = 56
PRED_DECAY = 0.7        # inter-frame log-amplitude prediction coefficient
GAIN_STEP = 10.5 / 63.0  # b2 in [0,63] -> G1 in [-1.5, 9.0] (log2 domain)
GAIN_MIN = -1.5
QUANT_SPAN = 2.2         # uniform quantizer span in sigmas


def bits_total_amp(K: int) -> int:
    """Amplitude bits per frame: 87 info bits minus b0(8), b2(6), b1(K)."""
    return 73 - K


def harmonics_for_b0(b0: int) -> tuple[float, int, int]:
    """b0 -> (w0, L, K)."""
    b0 = int(np.clip(b0, 0, 207))
    w0 = 4.0 * np.pi / (b0 + 39.5)
    L = int(0.9254 * int(np.pi / w0 + 0.25))
    L = max(9, min(L, MAX_L))
    K = min((L + 2) // 3, 12)
    return w0, L, K


def block_lengths(L: int) -> list[int]:
    """Partition L harmonics into 6 near-equal DCT blocks (longer blocks
    first when L % 6 != 0)."""
    base, rem = divmod(L, 6)
    return [base + 1 if i < rem else base for i in range(6)]


@lru_cache(maxsize=None)
def bit_allocation(L: int, K: int) -> tuple[list[int], list[list[int]]]:
    """Deterministic greedy water-fill of (73-K) bits.

    Cached: there are only ~48 (L, K) pairs, the result is a pure
    function of them, and the host voice path calls this per frame
    (50 Hz per call) — callers treat the returned lists as read-only.

    Returns (gbits[5] for G2..G6, cbits[6][J_i-1] for the higher-order
    DCT coefficients of each block).  Stands in for the TIA-102.BABA
    allocation tables; exactly mirrored by the encoder.
    """
    J = block_lengths(L)
    # priority weights: PRBA gain vector first, then low-order DCT coeffs
    items = []                     # (weight, order, kind, idx)
    for m in range(5):             # G2..G6
        items.append([4.2 - 0.4 * m, ("g", m)])
    for i in range(6):
        for k in range(J[i] - 1):  # C_{i, k+2}
            items.append([3.2 - 0.85 * k - 0.02 * i, ("c", i, k)])
    total = bits_total_amp(K)
    counts = [0] * len(items)
    weights = [it[0] for it in items]
    for _ in range(total):
        # argmax with deterministic index tie-break
        j = int(np.argmax(weights))
        if counts[j] >= 10:
            weights[j] = -1e9
            j = int(np.argmax(weights))
            if weights[j] <= -1e8:
                break
        counts[j] += 1
        weights[j] -= 1.0
        if counts[j] >= 10:
            weights[j] = -1e9
    gbits = [0] * 5
    cbits = [[0] * (J[i] - 1) for i in range(6)]
    for it, n in zip(items, counts):
        tag = it[1]
        if tag[0] == "g":
            gbits[tag[1]] = n
        else:
            cbits[tag[1]][tag[2]] = n
    return gbits, cbits


def _sigma_g(m: int) -> float:
    return 1.0 * (0.8 ** m)          # m = 0 for G2


def _sigma_c(k: int) -> float:
    return 0.65 * (0.78 ** k)        # k = 0 for C_{i,2}


def _dequant_uniform(code: int, nbits: int, sigma: float) -> float:
    if nbits <= 0:
        return 0.0
    step = 2.0 * QUANT_SPAN * sigma / (1 << nbits)
    return (code - ((1 << nbits) - 1) / 2.0) * step


def _quant_uniform(x: float, nbits: int, sigma: float) -> int:
    if nbits <= 0:
        return 0
    step = 2.0 * QUANT_SPAN * sigma / (1 << nbits)
    code = int(round(x / step + ((1 << nbits) - 1) / 2.0))
    return int(np.clip(code, 0, (1 << nbits) - 1))


def _dct(x: np.ndarray) -> np.ndarray:
    """DCT-II, spec-style normalization: X[0] = mean, X[m] =
    (2/J) sum x[j] cos(pi m (j+0.5)/J)."""
    J = len(x)
    j = np.arange(J)
    out = np.zeros(J)
    out[0] = x.mean()
    for m in range(1, J):
        out[m] = (2.0 / J) * np.sum(x * np.cos(np.pi * m * (j + 0.5) / J))
    return out


def _idct(X: np.ndarray) -> np.ndarray:
    J = len(X)
    j = np.arange(J)
    x = np.full(J, X[0], dtype=float)
    for m in range(1, J):
        x += X[m] * np.cos(np.pi * m * (j + 0.5) / J)
    return x


# -- priority-string field positions (recovered layout) -------------------
GAIN_POS = list(range(0, 6))            # b2 MSB-first
B0_HI_POS = list(range(6, 12))          # b0 bits 7..2
B0_LO_POS = [44, 43]                    # b0 bits 1, 0
VOICING_START = 48                      # b1 band-1-first, K bits
SYNC_POS = 87


@lru_cache(maxsize=None)
def _amp_positions(K: int) -> list[int]:
    """Amplitude bit positions in priority order: everything that is not
    gain/b0/voicing/sync.  Cached (pure in K, read-only use)."""
    used = set(GAIN_POS) | set(B0_HI_POS) | set(B0_LO_POS) | {SYNC_POS}
    used |= set(range(VOICING_START, VOICING_START + K))
    return [i for i in range(88) if i not in used]


@dataclass
class ImbeParams:
    b0: int
    w0: float
    L: int
    K: int
    voiced_bands: np.ndarray     # [K] 0/1
    log_m: np.ndarray            # [L] log2 spectral amplitudes
    gain_code: int = 0


def decode_frame(S: np.ndarray, prev: ImbeParams | None = None) -> ImbeParams:
    """88-bit recovered-layout parameter string -> dequantized params."""
    S = np.asarray(S, dtype=np.uint8)
    gain_code = int(sum(int(S[p]) << (5 - i) for i, p in enumerate(GAIN_POS)))
    b0 = int(sum(int(S[p]) << (7 - i) for i, p in enumerate(B0_HI_POS)))
    b0 |= (int(S[B0_LO_POS[0]]) << 1) | int(S[B0_LO_POS[1]])
    w0, L, K = harmonics_for_b0(b0)
    vb = np.array([S[VOICING_START + k] for k in range(K)], dtype=np.uint8)

    gbits, cbits = bit_allocation(L, K)
    pos = _amp_positions(K)
    cursor = 0

    def take(n):
        nonlocal cursor
        v = 0
        for _ in range(n):
            v = (v << 1) | int(S[pos[cursor]])
            cursor += 1
        return v

    G = np.zeros(6)
    G[0] = GAIN_MIN + gain_code * GAIN_STEP
    for m in range(5):
        G[m + 1] = _dequant_uniform(take(gbits[m]), gbits[m], _sigma_g(m))
    J = block_lengths(L)
    R = _idct(G)                       # block DC values
    T = np.zeros(L)
    at = 0
    for i in range(6):
        coef = np.zeros(J[i])
        coef[0] = R[i]
        for k in range(J[i] - 1):
            coef[k + 1] = _dequant_uniform(take(cbits[i][k]), cbits[i][k],
                                           _sigma_c(k))
        T[at:at + J[i]] = _idct(coef)
        at += J[i]

    log_m = T + _prediction(prev, L)
    return ImbeParams(b0=b0, w0=w0, L=L, K=K, voiced_bands=vb, log_m=log_m,
                      gain_code=gain_code)


def _prediction(prev: ImbeParams | None, L: int) -> np.ndarray:
    """0.7 x previous log amplitudes resampled to the new harmonic count,
    mean-removed so the PRBA DC fully controls frame level."""
    if prev is None or prev.L < 1:
        return np.zeros(L)
    src = prev.log_m
    k = (np.arange(1, L + 1) * prev.L / L) - 1.0
    k0 = np.clip(np.floor(k).astype(int), 0, prev.L - 1)
    k1 = np.clip(k0 + 1, 0, prev.L - 1)
    frac = np.clip(k - k0, 0.0, 1.0)
    p = (1 - frac) * src[k0] + frac * src[k1]
    p = PRED_DECAY * (p - p.mean())
    return p


def encode_frame(params: ImbeParams, prev: ImbeParams | None = None,
                 sync: int = 0) -> np.ndarray:
    """Inverse of decode_frame (used for roundtrip tests / TX tooling).

    Quantizes params.log_m against the same prediction and allocation;
    returns the 88-bit recovered-layout string."""
    S = np.zeros(88, dtype=np.uint8)
    b0 = int(params.b0) & 0xFF       # raw code preserved (>207: tone/silence)
    w0, L, K = harmonics_for_b0(b0)
    for i, p in enumerate(GAIN_POS):
        S[p] = (params.gain_code >> (5 - i)) & 1
    for i, p in enumerate(B0_HI_POS):
        S[p] = (b0 >> (7 - i)) & 1
    S[B0_LO_POS[0]] = (b0 >> 1) & 1
    S[B0_LO_POS[1]] = b0 & 1
    for k in range(K):
        S[VOICING_START + k] = params.voiced_bands[k] & 1

    T = params.log_m - _prediction(prev, L)
    J = block_lengths(L)
    R = np.zeros(6)
    coefs = []
    at = 0
    for i in range(6):
        c = _dct(T[at:at + J[i]])
        R[i] = c[0]
        coefs.append(c[1:])
        at += J[i]
    G = _dct(R)
    G[0] = GAIN_MIN + params.gain_code * GAIN_STEP  # G1 carried by b2

    gbits, cbits = bit_allocation(L, K)
    pos = _amp_positions(K)
    cursor = 0

    def put(v, n):
        nonlocal cursor
        for i in range(n):
            S[pos[cursor]] = (v >> (n - 1 - i)) & 1
            cursor += 1

    for m in range(5):
        put(_quant_uniform(G[m + 1], gbits[m], _sigma_g(m)), gbits[m])
    for i in range(6):
        for k in range(J[i] - 1):
            put(_quant_uniform(coefs[i][k], cbits[i][k], _sigma_c(k)),
                cbits[i][k])
    S[SYNC_POS] = sync & 1
    return S
