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
