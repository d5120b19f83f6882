"""FIR filter design (host-side, numpy).

Windowed-sinc lowpass and root-raised-cosine designs used to build the
channel filters at runtime, mirroring the reference's runtime filter
design (reference: src/dsp/firdes.cpp, profile cutoffs documented at
src/dsp/demod_pipeline.cpp:112-141).  Taps are designed once on host and
baked into the jitted device pipeline as constants.

Channel low-pass profiles (reference parity, demod_pipeline.cpp:133-141):
the cutoff passed to ``lowpass`` is the *center* of the transition band
(GNU Radio convention), so profile edges include a half-transition guard.
"""

from __future__ import annotations

import math

import numpy as np

# Channel LPF profile edges in Hz (passband edge + half-transition guard),
# matching reference demod_pipeline.cpp:133-141.
CH_LPF_TRANSITION_HZ = 1200.0
_GUARD = CH_LPF_TRANSITION_HZ * 0.5
CH_LPF_CUTOFF_HZ = {
    "wide": 8000.0 + _GUARD,       # analog / wide FM
    "6k25": 3125.0 + _GUARD,       # NXDN48 / dPMR / D-STAR
    "12k5": 6250.0 + _GUARD,       # DMR / NXDN96 / X2-TDMA / YSF / M17
    "provoice": 6250.0 + _GUARD,
    "p25_c4fm": 6250.0 + _GUARD,
    "p25_cqpsk": 7250.0,
}
CH_LPF_TAPS = 144  # reference kChannelLpfTaps headroom bound


def _window(kind: str, n: int) -> np.ndarray:
    m = np.arange(n)
    if kind == "hamming":
        return 0.54 - 0.46 * np.cos(2 * np.pi * m / (n - 1))
    if kind == "hann":
        return 0.5 - 0.5 * np.cos(2 * np.pi * m / (n - 1))
    if kind == "blackman":
        return (0.42 - 0.5 * np.cos(2 * np.pi * m / (n - 1))
                + 0.08 * np.cos(4 * np.pi * m / (n - 1)))
    if kind == "blackman-harris":
        return (0.35875 - 0.48829 * np.cos(2 * np.pi * m / (n - 1))
                + 0.14128 * np.cos(4 * np.pi * m / (n - 1))
                - 0.01168 * np.cos(6 * np.pi * m / (n - 1)))
    raise ValueError(f"unknown window {kind!r}")


def lowpass(fs: float, cutoff: float, transition: float = CH_LPF_TRANSITION_HZ,
            window: str = "hamming", max_taps: int = 1023) -> np.ndarray:
    """Windowed-sinc lowpass. ``cutoff`` is the transition-band center (Hz).

    Tap count follows the classic window-dependent estimate (e.g. Hamming:
    ntaps ≈ 53*fs / (22*transition)), forced odd, clamped to ``max_taps``.
    """
    beta = {"hamming": 53.0, "hann": 62.0, "blackman": 74.0,
            "blackman-harris": 92.0}[window]
    ntaps = int(beta * fs / (22.0 * transition))
    ntaps = min(max(ntaps | 1, 7), max_taps | 1)
    return lowpass_taps(ntaps, fs, cutoff, window)


def lowpass_taps(ntaps: int, fs: float, cutoff: float, window: str = "hamming") -> np.ndarray:
    """Design exactly ``ntaps`` windowed-sinc lowpass taps, unit DC gain."""
    if ntaps % 2 == 0:
        ntaps += 1
    m = np.arange(ntaps) - (ntaps - 1) / 2
    fc = cutoff / fs
    h = np.sinc(2 * fc * m) * 2 * fc
    h *= _window(window, ntaps)
    h /= np.sum(h)
    return h.astype(np.float32)


def channel_lpf(fs: float, profile: str, ntaps: int = CH_LPF_TAPS - 1) -> np.ndarray:
    """Channel low-pass for a decode profile at sample rate ``fs``."""
    cutoff = CH_LPF_CUTOFF_HZ[profile]
    if ntaps % 2 == 0:
        ntaps -= 1
    return lowpass_taps(ntaps, fs, cutoff, window="hamming")


def rrc(sps: float, ntaps: int, alpha: float = 0.2) -> np.ndarray:
    """Root-raised-cosine taps (unit energy), symbol period ``sps`` samples."""
    if ntaps % 2 == 0:
        ntaps += 1
    t = (np.arange(ntaps) - (ntaps - 1) / 2) / sps
    h = np.empty(ntaps)
    for i, ti in enumerate(t):
        if abs(ti) < 1e-8:
            h[i] = 1.0 - alpha + 4 * alpha / math.pi
        elif abs(abs(4 * alpha * ti) - 1.0) < 1e-8:
            h[i] = (alpha / math.sqrt(2)) * (
                (1 + 2 / math.pi) * math.sin(math.pi / (4 * alpha))
                + (1 - 2 / math.pi) * math.cos(math.pi / (4 * alpha)))
        else:
            h[i] = (math.sin(math.pi * ti * (1 - alpha))
                    + 4 * alpha * ti * math.cos(math.pi * ti * (1 + alpha))) / (
                math.pi * ti * (1 - (4 * alpha * ti) ** 2))
    h /= np.sqrt(np.sum(h * h))
    return h.astype(np.float32)


def halfband(ntaps: int = 31, window: str = "blackman-harris") -> np.ndarray:
    """Half-band lowpass for decimate-by-2 (odd taps, zero even taps)."""
    if ntaps % 2 == 0:
        ntaps += 1
    m = np.arange(ntaps) - (ntaps - 1) / 2
    h = np.sinc(m / 2.0) * 0.5
    h *= _window(window, ntaps)
    # force exact halfband structure: every second tap (except center) is 0
    h[(np.arange(ntaps) - (ntaps - 1) // 2) % 2 == 0] = 0.0
    h[(ntaps - 1) // 2] = 0.5
    h /= np.sum(h)
    return h.astype(np.float32)
