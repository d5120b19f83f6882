"""Batched MBE harmonic synthesis — the voice device kernel.

Given per-frame (ω0, amplitudes[L], voiced[L]) parameter arrays, emits
160 samples of 8 kHz PCM per frame:

  voiced bands:   Σ_l 2·A_l·cos(l·θ(n) + φ_l)   with the fundamental
                  phase θ carried across frames (lax.scan carry) and
                  ω0/A interpolated across each frame;
  unvoiced bands: the same harmonic bank driven with per-frame random
                  phases + frequency dither (spectrally shaped noise).

The inner product  cos(outer(n, l)) @ A  is an MXU-friendly [160, L] ×
[L] contraction; frames batch along the scan.  Replaces the external
mbelib-neo synthesis (reference call contract src/core/vocoder/dsd_mbe.c).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N = 160          # samples per 20 ms frame at 8 kHz
MAX_L = 56


@partial(jax.jit, static_argnames=())
def synthesize(w0: jax.Array, amps: jax.Array, voiced: jax.Array,
               noise_phase: jax.Array) -> jax.Array:
    """[F] ω0, [F, L] amps, [F, L] voiced, [F, L] random phases →
    [F, N] float PCM."""
    F = w0.shape[0]
    l_idx = jnp.arange(1, MAX_L + 1, dtype=jnp.float32)        # [L]
    n_idx = jnp.arange(N, dtype=jnp.float32)                    # [N]

    w_prev = jnp.concatenate([w0[:1], w0[:-1]])
    a_prev = jnp.concatenate([amps[:1], amps[:-1]], axis=0)

    # per-frame fundamental-phase increment with linear ω interpolation:
    # θ(n) = θ0 + Σ_{m<=n} ω(m),  ω(m) = ω_prev + (ω-ω_prev)(m+1)/N
    alpha = (n_idx + 1.0) / N                                   # [N]
    w_t = w_prev[:, None] + (w0 - w_prev)[:, None] * alpha[None, :]  # [F,N]
    cum = jnp.cumsum(w_t, axis=1)                               # [F,N]
    frame_adv = cum[:, -1]                                      # [F]

    theta0 = jnp.concatenate(
        [jnp.zeros(1, jnp.float32),
         jnp.cumsum(frame_adv[:-1])]) if F > 1 else jnp.zeros(F, jnp.float32)
    theta0 = jnp.mod(theta0, 2 * jnp.pi)
    theta = theta0[:, None] + cum                               # [F,N]

    # amplitude interpolation across the frame
    a_t = (a_prev[:, None, :] * (1 - alpha)[None, :, None]
           + amps[:, None, :] * alpha[None, :, None])           # [F,N,L]

    phase = theta[:, :, None] * l_idx[None, None, :]            # [F,N,L]
    v = voiced[:, None, :]
    # unvoiced: random phase + dither spreads the line spectrum; select
    # the PHASE per harmonic so cos evaluates once, not per branch
    uv_phase = (phase * (1.0 + 0.03 * jnp.sin(noise_phase[:, None, :] * 7.1))
                + noise_phase[:, None, :])
    wave = jnp.cos(jnp.where(v > 0.5, phase, uv_phase))
    pcm = 2.0 * jnp.sum(a_t * wave, axis=-1)                    # [F,N]
    return pcm


def synthesize_frames(frames) -> np.ndarray:
    """Host helper: list[MbeFrame] → concatenated float PCM [F·160]."""
    from dsdneo_tpu.vocoder.mbe import frames_to_arrays
    if not frames:
        return np.zeros(0, dtype=np.float32)
    w0, amps, voiced = frames_to_arrays(frames)
    rng = np.random.default_rng(1234)
    noise = rng.uniform(0, 2 * np.pi,
                        size=voiced.shape).astype(np.float32)
    pcm = synthesize(jnp.asarray(w0), jnp.asarray(amps),
                     jnp.asarray(voiced), jnp.asarray(noise))
    out = np.asarray(pcm).reshape(-1)
    peak = np.abs(out).max()
    if peak > 0.5:
        out = out * (0.5 / peak)
    return out
