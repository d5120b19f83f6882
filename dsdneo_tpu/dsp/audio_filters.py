"""Decoded-audio conditioning: deemphasis, DC block, HPF/LPF bank, gain.

Reference parity: src/dsp/dsd_filters.c (deemphasis, one-pole audio LPF,
DC block, HPF/LPF/PBF bank for decoded voice) and src/core/audio/gain.c
(auto/manual gain).  One-pole IIRs are short lax.scan carries over the
sample axis — cheap at 8 kHz audio rates — with the channel batch
vectorized.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _one_pole(x: jax.Array, a: float) -> jax.Array:
    """y[n] = a·y[n-1] + (1-a)·x[n] along the last axis."""
    def body(carry, xn):
        y = a * carry + (1.0 - a) * xn
        return y, y
    xt = jnp.moveaxis(x, -1, 0)
    _, yt = jax.lax.scan(body, jnp.zeros(x.shape[:-1], x.dtype), xt)
    return jnp.moveaxis(yt, 0, -1)


def deemphasis(x: jax.Array, fs: float = 8000.0, tau_us: float = 750.0) -> jax.Array:
    """Standard NFM deemphasis (750 µs default)."""
    a = float(np.exp(-1.0 / (fs * tau_us * 1e-6)))
    return _one_pole(x, a)


def dc_block(x: jax.Array, fs: float = 8000.0, fc: float = 30.0) -> jax.Array:
    """Remove slow DC wander: x - lowpass(x)."""
    a = float(np.exp(-2.0 * np.pi * fc / fs))
    return x - _one_pole(x, a)


def audio_lpf(x: jax.Array, fs: float = 8000.0, fc: float = 3400.0) -> jax.Array:
    a = float(np.exp(-2.0 * np.pi * fc / fs))
    return _one_pole(x, a)


def audio_hpf(x: jax.Array, fs: float = 8000.0, fc: float = 300.0) -> jax.Array:
    return x - audio_lpf(x, fs, fc)


class AutoGain:
    """Slow AGC for synthesized voice (reference gain.c auto mode)."""

    def __init__(self, target_rms: float = 0.15, max_gain: float = 40.0,
                 alpha: float = 0.2):
        self.gain = 1.0
        self.target = target_rms
        self.max_gain = max_gain
        self.alpha = alpha

    def apply(self, pcm: np.ndarray) -> np.ndarray:
        rms = float(np.sqrt(np.mean(np.square(pcm)) + 1e-12))
        want = min(self.target / max(rms, 1e-6), self.max_gain)
        self.gain += self.alpha * (want - self.gain)
        return np.clip(pcm * self.gain, -1.0, 1.0)


def upsample_8k_to_48k(pcm: jax.Array) -> jax.Array:
    """8 kHz voice → 48 kHz playback rate (reference dsd_audio.c
    upsample path), via the polyphase resampler."""
    from dsdneo_tpu.dsp.resampler import resample
    return resample(pcm, 8000, 48000)


class AudioGate:
    """Squelch-style voice gate (reference src/core/audio/dsd_audio_gate.c):
    opens when short-term RMS exceeds the open threshold, holds for
    ``hang_frames`` below the close threshold, then mutes.  Block-wise
    and bounded-state for the streaming path."""

    def __init__(self, open_rms: float = 0.01, close_rms: float = 0.004,
                 hang_frames: int = 8):
        self.open_rms = open_rms
        self.close_rms = close_rms
        self.hang_frames = hang_frames
        self.open = False
        self._below = 0

    def process(self, pcm: np.ndarray) -> np.ndarray:
        rms = float(np.sqrt(np.mean(np.square(pcm)))) if len(pcm) else 0.0
        if rms >= self.open_rms:
            self.open = True
            self._below = 0
        elif self.open and rms < self.close_rms:
            self._below += 1
            if self._below >= self.hang_frames:
                self.open = False
                self._below = 0
        return pcm if self.open else np.zeros_like(pcm)


class AudioConcealer:
    """Underrun concealment: fade-repeat of the last good buffer, −6 dB
    per consecutive underrun, silence after ``max_repeats`` (reference
    src/platform/audio_concealment.c contract — bounded-time)."""

    def __init__(self, max_repeats: int = 4, fade: float = 0.5):
        self.max_repeats = max_repeats
        self.fade = fade
        self._last: np.ndarray | None = None
        self._repeats = 0
        self.concealed = 0

    def feed(self, pcm: np.ndarray | None, n: int) -> np.ndarray:
        """pcm = the available buffer or None on underrun; always
        returns ``n`` samples."""
        if pcm is not None and len(pcm) >= n:
            self._last = np.asarray(pcm[:n], dtype=np.float32).copy()
            self._repeats = 0
            return self._last
        self.concealed += 1
        if self._last is None or self._repeats >= self.max_repeats:
            return np.zeros(n, dtype=np.float32)
        self._repeats += 1
        self._last = self._last * self.fade
        return self._last
