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


def synthesize_stream(w0: jax.Array, amps: jax.Array, voiced: jax.Array,
                      noise_phase: jax.Array, theta_in: jax.Array,
                      w_in: jax.Array, a_in: jax.Array):
    """Streaming form: ``(theta_in, w_in, a_in)`` is the carry from the
    previous block of the same voice stream (fundamental phase at the
    block seam, last frame's ω0 and amplitudes), so consecutive blocks
    concatenate without a phase/amplitude discontinuity.  ``w_in <= 0``
    means "no previous frame" (fresh stream / silence before): the
    first frame then anchors interpolation to itself, which reproduces
    the one-shot behavior exactly.  Returns (pcm [F, N], theta_out,
    w_out, a_out)."""
    F = w0.shape[0]
    n_idx = jnp.arange(N, dtype=jnp.float32)                    # [N]

    fresh = w_in <= 0.0
    w_prev0 = jnp.where(fresh, w0[0], w_in)
    a_prev0 = jnp.where(fresh, amps[0], a_in)
    w_prev = jnp.concatenate([w_prev0[None], w0[:-1]])
    a_prev = jnp.concatenate([a_prev0[None, :], amps[:-1]], axis=0)

    # per-frame fundamental-phase increment with linear ω interpolation:
    # θ(n) = θ0 + Σ_{m<=n} ω(m),  ω(m) = ω_prev + (ω-ω_prev)(m+1)/N
    alpha = (n_idx + 1.0) / N                                   # [N]
    w_t = w_prev[:, None] + (w0 - w_prev)[:, None] * alpha[None, :]  # [F,N]
    cum = jnp.cumsum(w_t, axis=1)                               # [F,N]
    frame_adv = cum[:, -1]                                      # [F]

    theta0 = jnp.concatenate(
        [jnp.zeros(1, jnp.float32),
         jnp.cumsum(frame_adv[:-1])]) if F > 1 else jnp.zeros(F, jnp.float32)
    theta0 = jnp.mod(theta_in + theta0, 2 * jnp.pi)
    theta = theta0[:, None] + cum                               # [F,N]
    theta_out = jnp.mod(theta_in + jnp.sum(frame_adv), 2 * jnp.pi)

    v = voiced > 0.5                                            # [F,L]
    P = jnp.where(v, 1.0, jnp.cos(noise_phase))                 # [F,L]
    Q = jnp.where(v, 0.0, -jnp.sin(noise_phase))                # [F,L]

    # Harmonic phasors z^l = e^{ilθ} built by log-doubling from the
    # single transcendental pair (cosθ, sinθ): new_powers = powers ·
    # z^k doubles the bank per step, so the full [F, N, L] cos/sin
    # tables cost 6 complex-multiply passes instead of 2·F·N·L
    # transcendental evaluations — the dominant cost of the batched
    # voice chain on TPU.
    pr = jnp.cos(theta)[:, :, None]                             # [F,N,1]
    pi = jnp.sin(theta)[:, :, None]
    while pr.shape[-1] < MAX_L:
        zkr = pr[:, :, -1:]                                     # z^k
        zki = pi[:, :, -1:]
        pr, pi = (jnp.concatenate([pr, pr * zkr - pi * zki], axis=-1),
                  jnp.concatenate([pi, pr * zki + pi * zkr], axis=-1))
    pr = pr[:, :, :MAX_L]                                       # cos(lθ)
    pi = pi[:, :, :MAX_L]                                       # sin(lθ)

    # wave_l = P_l·cos(lθ) + Q_l·sin(lθ) (voiced: pure harmonic;
    # unvoiced: per-frame random phase by angle addition), and the
    # amplitude interpolation a_t = a_prev·(1−α) + a·α is separable in
    # n, so the harmonic sum reduces to two MXU contractions per table:
    cc = jnp.stack([amps * P, a_prev * P], axis=-1)             # [F,L,2]
    cs = jnp.stack([amps * Q, a_prev * Q], axis=-1)
    S = (jnp.einsum("fnl,flk->fnk", pr, cc)
         + jnp.einsum("fnl,flk->fnk", pi, cs))                  # [F,N,2]
    pcm = 2.0 * (alpha[None, :] * S[:, :, 0]
                 + (1.0 - alpha)[None, :] * S[:, :, 1])         # [F,N]
    return pcm, theta_out, w0[-1], amps[-1]


@partial(jax.jit, static_argnames=())
def synthesize(w0: jax.Array, amps: jax.Array, voiced: jax.Array,
               noise_phase: jax.Array) -> jax.Array:
    """[F] ω0, [F, L] amps, [F, L] voiced, [F, L] random phases →
    [F, N] float PCM (one-shot: the whole stream in one call)."""
    pcm, _t, _w, _a = synthesize_stream(
        w0, amps, voiced, noise_phase, jnp.float32(0.0),
        jnp.float32(0.0), jnp.zeros_like(amps[0]))
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
