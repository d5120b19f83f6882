"""Device-side DSP front-end: pure JAX functions over batched I/Q blocks.

All functions operate on a channel-batched layout ``[C, N]`` (C channels,
N complex samples) so that one jitted step processes many channels at
once — the TPU-native replacement for the reference's per-channel demod
thread (reference: src/dsp/demod_pipeline.cpp full_demod, the per-block
chain at :964-1330).

The chain for digital voice modes:
  cu8 widen → (fs/4 rotate) → halfband decimation cascade → channel LPF
  → FM discriminator (FSK/C4FM) | CQPSK carrier+timing chain → symbols.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def widen_cu8(raw: jax.Array) -> jax.Array:
    """uint8 interleaved I/Q ``[C, 2N]`` → complex64 ``[C, N]`` in ~[-1,1].

    Reference parity: src/dsp/simd_widen*.cpp (CU8→float widen; the fused
    fs/4 rotation is applied separately by :func:`fs4_rotate`).
    """
    x = raw.astype(jnp.float32) * (1.0 / 127.5) - 1.0
    return jax.lax.complex(x[..., 0::2], x[..., 1::2])


def fs4_rotate(x: jax.Array, sign: int = 1) -> jax.Array:
    """Multiply by exp(±j·π/2·n): shifts spectrum by fs/4 without multiplies."""
    n = x.shape[-1]
    rot = jnp.asarray([1, 1j * sign, -1, -1j * sign], dtype=jnp.complex64)
    return x * jnp.tile(rot, (n + 3) // 4)[:n]


def _fir_real(x: jax.Array, taps: jax.Array) -> jax.Array:
    """'Same'-aligned FIR of real ``[C, N]`` with 1-D taps (group delay removed)."""
    c, n = x.shape
    t = taps.shape[0]
    lhs = x[:, None, :]
    rhs = taps[::-1][None, None, :].astype(x.dtype)
    pad = ((t - 1) // 2, t - 1 - (t - 1) // 2)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[pad],
        dimension_numbers=("NCW", "OIW", "NCW"))
    return out[:, 0, :]


def fir_complex(x: jax.Array, taps: jax.Array) -> jax.Array:
    """Complex FIR with real taps over ``[C, N]`` (same length, zero delay).

    Reference parity: src/dsp/simd_fir.cpp simd_fir_complex_apply.
    """
    return jax.lax.complex(_fir_real(x.real, taps), _fir_real(x.imag, taps))


def fir_real(x: jax.Array, taps: jax.Array) -> jax.Array:
    """Real FIR over ``[C, N]`` (same length, zero group delay)."""
    return _fir_real(x, taps)


def decimate2_halfband(x: jax.Array, taps: jax.Array) -> jax.Array:
    """Filter + decimate-by-2 of complex ``[C, N]`` → ``[C, N//2]``.

    Reference parity: src/dsp/halfband.cpp + simd_hb_decim2_complex.
    """
    y = fir_complex(x, taps)
    return y[:, ::2]


def fm_discriminate(x: jax.Array) -> jax.Array:
    """Per-sample quadrature FM discriminator over ``[C, N]``.

    out[n] = angle(x[n] · conj(x[n-1])) / π  ∈ [-1, 1]  (1.0 = Nyquist
    deviation).  First output repeats the second to keep length N.
    Reference parity: src/dsp/fsk_modem.c dsd_fsk_modem_discriminator_process
    (atan2 discriminator; DC/peak tracking is done downstream in the
    symbol-level estimator instead of here).
    """
    prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    p = x * jnp.conj(prev)
    return jnp.arctan2(p.imag, p.real) * (1.0 / jnp.pi)


def iq_power(x: jax.Array) -> jax.Array:
    """Mean power per channel ``[C]`` (squelch/level metric)."""
    return jnp.mean(jnp.abs(x) ** 2, axis=-1)


def dc_block(x: jax.Array) -> jax.Array:
    """Remove per-channel complex DC (mean) — simple block-wise DC blocker."""
    return x - jnp.mean(x, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("profile_taps_len",))
def _noop(x, profile_taps_len=0):  # pragma: no cover - placeholder for ABI stability
    return x
