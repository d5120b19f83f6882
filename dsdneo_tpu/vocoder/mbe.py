"""MBE-family vocoder parameter decode (IMBE 88-bit / AMBE+2 49-bit).

The reference delegates synthesis to the external mbelib-neo
(vcpkg-ports/mbe-neo; call contract at src/core/vocoder/dsd_mbe.c), so
this is a ground-up implementation of the Multi-Band Excitation model:

  frame → fundamental ω0, harmonic count L, per-band voiced/unvoiced
  decisions, per-harmonic spectral amplitudes → harmonic synthesis
  (dsdneo_tpu.vocoder.synth) → 160 samples of 8 kHz PCM per 20 ms frame.

STATUS: the parameter layout below decodes the structurally fixed
fields (fundamental, voicing, gain) per the MBE model; the spectral
amplitude bit-allocation uses a uniform approximation of the standard's
adaptive allocation tables, so synthesis is speech-like rather than
bit-exact.  Validation is structural (pitch range, energy tracking,
frame cadence) pending the full TIA-102.BABA allocation tables.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class MbeFrame:
    w0: float                 # fundamental (radians/sample at 8 kHz)
    L: int                    # number of harmonics
    voiced: np.ndarray        # [L] 0/1 per harmonic
    amps: np.ndarray          # [L] linear spectral amplitudes
    errs: int = 0

    MAX_L = 56


def _bits_to_int(bits) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def decode_imbe_4400(bits88: np.ndarray) -> MbeFrame:
    """Decode an 88-bit IMBE parameter frame (P25 Phase 1 full rate)."""
    b = np.asarray(bits88, dtype=np.uint8)
    b0 = _bits_to_int(b[0:8])
    if b0 > 207:
        b0 = 207
    w0 = 4.0 * np.pi / (b0 + 39.5)
    L = int(0.9254 * int(np.pi / w0 + 0.25))
    L = max(9, min(L, MbeFrame.MAX_L))
    K = min((L + 2) // 3, 12)

    vbits = b[8:8 + K]
    voiced = np.zeros(L, dtype=np.uint8)
    for l in range(L):
        band = min(l // 3, K - 1)
        voiced[l] = vbits[band]

    gain_idx = _bits_to_int(b[8 + K:8 + K + 6])
    # 6-bit log-domain gain (≈ 1.3 dB steps across the speech range)
    gain = 10.0 ** ((gain_idx - 32) * 1.3 / 20.0)

    # spectral amplitude residuals: uniform allocation approximation
    rest = b[8 + K + 6:]
    amps = np.ones(L, dtype=np.float32)
    if L > 1 and rest.size > 0:
        per = max(rest.size // (L - 1), 1)
        pos = 0
        for l in range(1, L):
            nb = min(per, rest.size - pos)
            if nb <= 0:
                break
            q = _bits_to_int(rest[pos:pos + nb])
            pos += nb
            # symmetric residual in ≈ ±6 dB
            r = (q / max((1 << nb) - 1, 1)) * 2.0 - 1.0
            amps[l] = 10.0 ** (r * 6.0 / 20.0)
    # spectral tilt: speech energy falls off with harmonic index
    tilt = np.exp(-0.02 * np.arange(L, dtype=np.float32))
    amps = amps * tilt
    amps = amps / max(np.sqrt(np.mean(amps ** 2)), 1e-9) * gain * 0.02
    return MbeFrame(w0=float(w0), L=L, voiced=voiced, amps=amps)


def decode_ambe_2450(bits49: np.ndarray) -> MbeFrame:
    """Decode a 49-bit AMBE+2 parameter frame (DMR/NXDN/dPMR/YSF)."""
    b = np.asarray(bits49, dtype=np.uint8)
    b0 = _bits_to_int(b[0:7])
    # AMBE pitch index → fundamental
    pitch = 2.0 ** (4.312 - b0 * 0.0212)   # ≈ 20..120 sample periods
    w0 = 2.0 * np.pi / max(np.clip(pitch * 19.0, 19.0, 120.0), 19.0)
    L = int(0.9254 * int(np.pi / w0 + 0.25))
    L = max(9, min(L, MbeFrame.MAX_L))

    vband = _bits_to_int(b[7:12])          # 5 voicing-band bits
    voiced = np.zeros(L, dtype=np.uint8)
    nb = 5
    for l in range(L):
        band = min(l * nb // L, nb - 1)
        voiced[l] = (vband >> (nb - 1 - band)) & 1

    gain_idx = _bits_to_int(b[12:18])
    gain = 10.0 ** ((gain_idx - 32) * 1.3 / 20.0)

    rest = b[18:]
    amps = np.ones(L, dtype=np.float32)
    if L > 1 and rest.size:
        per = max(rest.size // (L - 1), 1)
        pos = 0
        for l in range(1, L):
            nbits = min(per, rest.size - pos)
            if nbits <= 0:
                break
            q = _bits_to_int(rest[pos:pos + nbits])
            pos += nbits
            r = (q / max((1 << nbits) - 1, 1)) * 2.0 - 1.0
            amps[l] = 10.0 ** (r * 6.0 / 20.0)
    tilt = np.exp(-0.02 * np.arange(L, dtype=np.float32))
    amps = amps * tilt
    amps = amps / max(np.sqrt(np.mean(amps ** 2)), 1e-9) * gain * 0.02
    return MbeFrame(w0=float(w0), L=L, voiced=voiced, amps=amps)


def frames_to_arrays(frames: list[MbeFrame]):
    """Pack a frame list into fixed-shape arrays for the device kernel."""
    F = len(frames)
    ML = MbeFrame.MAX_L
    w0 = np.zeros(F, dtype=np.float32)
    amps = np.zeros((F, ML), dtype=np.float32)
    voiced = np.zeros((F, ML), dtype=np.float32)
    for i, fr in enumerate(frames):
        w0[i] = fr.w0
        amps[i, :fr.L] = fr.amps
        voiced[i, :fr.L] = fr.voiced
    return w0, amps, voiced
