"""Feed-forward symbol timing recovery (TPU-native design).

The reference recovers symbol timing with a per-sample feedback loop
(src/dsp/dsd_symbol.c getSymbol: dynamic timing window with jitter
tracking; src/dsp/ted.cpp Gardner).  Feedback loops serialize on the
sample axis, which is hostile to a wide vector machine, so this module
uses the classic *feed-forward* square-law spectral estimator
(Oerder & Meyr) instead:

  1. nonlinearity  e[n] = (d[n] - dc)²  puts a spectral line at the
     symbol rate whose phase encodes the timing offset;
  2. the complex sum  X_w = Σ_w e[n]·exp(-j2πn/sps)  per window of a few
     hundred symbols yields the per-window timing phase
     τ_w = -arg(X_w)·sps/2π  (mod sps);
  3. unwrapping τ across windows tracks clock drift (ppm-level skew);
  4. symbols are read out by parallel interpolated gathers at
     t_k = k·sps + τ(t_k).

Every step is embarrassingly parallel over both the channel batch and the
sample axis — no scan, no sequential dependency — and achieves the same
tracking ability as the reference's loop for the block sizes used here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _unwrap_mod(tau: jax.Array, period: float) -> jax.Array:
    """Unwrap a sequence defined modulo ``period`` along the last axis."""
    d = jnp.diff(tau, axis=-1)
    d = jnp.mod(d + period / 2, period) - period / 2
    return jnp.concatenate([tau[..., :1], tau[..., :1] + jnp.cumsum(d, axis=-1)], axis=-1)


def decision_positions(e: jax.Array, sps: float, win_symbols: int = 256,
                       max_symbols: int | None = None) -> jax.Array:
    """Per-symbol decision instants ``[C, K]`` from a (nonnegative)
    timing-energy signal ``[C, N]`` via windowed O&M + drift unwrap."""
    c, n = e.shape
    L = max(int(round(win_symbols * sps)), 8)
    nw = max(n // L, 1)
    idx = jnp.arange(n, dtype=jnp.float32)
    tone = jnp.exp(-2j * jnp.pi * idx / sps)
    prod = (e * tone)[:, : nw * L].reshape(c, nw, L)
    X = jnp.sum(prod, axis=-1)
    tau = _unwrap_mod(jnp.mod(-jnp.angle(X) * (sps / (2 * jnp.pi)), sps), sps)
    centers = (jnp.arange(nw, dtype=jnp.float32) + 0.5) * L
    K = max_symbols if max_symbols is not None else int((n - 2 * sps) // sps)
    base = jnp.arange(K, dtype=jnp.float32) * sps
    off = jax.vmap(lambda tc: jnp.interp(base, centers, tc))(tau)
    return jnp.clip(base[None, :] + off, 0.0, n - 2.0)


@partial(jax.jit, static_argnames=("sps", "win_symbols", "max_symbols"))
def recover_symbols(d: jax.Array, sps: float, win_symbols: int = 256,
                    max_symbols: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Recover symbol-rate samples from ``[C, N]`` demodulated samples.

    Args:
      d: ``[C, N]`` float32 discriminator (or I/Q-derived) samples.
      sps: samples per symbol (may be fractional).
      win_symbols: timing-estimation window length in symbols.
      max_symbols: static output symbol count; default fills the input.

    Returns:
      (symbols ``[C, K]`` float32, positions ``[C, K]`` float32 sample
      coordinates of each symbol decision instant).
    """
    c, n = d.shape
    L = max(int(round(win_symbols * sps)), 8)
    nw = max(n // L, 1)

    dc = jnp.mean(d, axis=-1, keepdims=True)
    e = (d - dc) ** 2

    idx = jnp.arange(n, dtype=jnp.float32)
    tone = jnp.exp(-2j * jnp.pi * idx / sps)
    prod = (e * tone)[:, : nw * L].reshape(c, nw, L)
    X = jnp.sum(prod, axis=-1)                      # [C, nw]

    tau = jnp.mod(-jnp.angle(X) * (sps / (2 * jnp.pi)), sps)  # [C, nw]
    tau = _unwrap_mod(tau, sps)

    centers = (jnp.arange(nw, dtype=jnp.float32) + 0.5) * L   # window centers

    K = max_symbols if max_symbols is not None else int((n - 2 * sps) // sps)
    k = jnp.arange(K, dtype=jnp.float32)
    base = k * sps

    # piecewise-linear interpolation of tau at each symbol's nominal position
    def interp_one(tau_c):
        return jnp.interp(base, centers, tau_c)

    off = jax.vmap(interp_one)(tau)                  # [C, K]
    pos = base[None, :] + off                         # decision instants

    pos = jnp.clip(pos, 0.0, n - 2.0)
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0.astype(jnp.float32)
    g0 = jnp.take_along_axis(d, i0, axis=-1)
    g1 = jnp.take_along_axis(d, i0 + 1, axis=-1)
    sym = g0 * (1.0 - frac) + g1 * frac
    return sym, pos


@partial(jax.jit, static_argnames=("sps", "win_symbols", "max_symbols"))
def recover_symbols_fixed(d: jax.Array, sps: float, win_symbols: int = 256,
                          max_symbols: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Single global timing phase variant (no drift tracking) — cheaper,
    for short blocks where clock skew is negligible."""
    c, n = d.shape
    dc = jnp.mean(d, axis=-1, keepdims=True)
    e = (d - dc) ** 2
    idx = jnp.arange(n, dtype=jnp.float32)
    tone = jnp.exp(-2j * jnp.pi * idx / sps)
    X = jnp.sum(e * tone, axis=-1)                    # [C]
    tau = jnp.mod(-jnp.angle(X) * (sps / (2 * jnp.pi)), sps)

    K = max_symbols if max_symbols is not None else int((n - 2 * sps) // sps)
    k = jnp.arange(K, dtype=jnp.float32)
    pos = k[None, :] * sps + tau[:, None]
    pos = jnp.clip(pos, 0.0, n - 2.0)
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0.astype(jnp.float32)
    g0 = jnp.take_along_axis(d, i0, axis=-1)
    g1 = jnp.take_along_axis(d, i0 + 1, axis=-1)
    return g0 * (1.0 - frac) + g1 * frac, pos
