"""The many-channel TPU device step — the serving hot path.

One jitted function consumes a ``[C, B]`` block of framed I/Q (C
channels — the data-parallel axis, B samples), runs channel filter, FM
discrimination, feed-forward timing recovery and 4-level slicing for
every channel at once, and emits per-channel dibits + soft symbols +
power metrics.  This is the rebuild's equivalent of running C copies of
the reference demod thread (src/dsp/demod_pipeline.cpp full_demod), as
one batched XLA program.

TPU-first choices:
  - levels via windowed min/max (VPU reductions) instead of quantile
    sorts;
  - timing via the Oerder&Meyr spectral estimate (elementwise + matmul
    reductions), no per-sample feedback scan;
  - interpolated symbol pickup via gathers;
  - everything in float32/bf16-friendly shapes; C is the mesh-shardable
    axis (see dsdneo_tpu.parallel).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from dsdneo_tpu.dsp import firdes, frontend
from dsdneo_tpu.engine.modes import MODES, ModeConfig


def frontend_step(iq: jax.Array, taps: jax.Array, sps: float, n_sym: int,
                  four_level: bool = True, use_pallas: bool = False):
    """Pure function: I/Q → (dibits, soft, power) for a ``[C, B]`` batch.

    ``iq`` is either complex64 ``[C, B]`` or float32 ``[C, B, 2]``
    (I/Q planes) — the axon TPU runtime cannot transfer complex arrays
    across the host boundary, so the serving path feeds float planes and
    forms complex on device.  C shards over the mesh with no
    cross-channel communication.

    ``use_pallas`` routes the FIR + discriminator through the fused
    MXU kernel (ops.pallas_frontend); requires ``taps`` to be a host
    numpy array.
    """
    if iq.ndim == 3:
        xr, xi = iq[..., 0], iq[..., 1]
    else:
        xr, xi = jnp.real(iq), jnp.imag(iq)
    if use_pallas:
        from dsdneo_tpu.ops import pallas_frontend
        d = pallas_frontend.fir_discriminate(xr, xi, np.asarray(taps))
    else:
        y = frontend.fir_complex(jax.lax.complex(xr, xi), taps)
        d = frontend.fm_discriminate(y)
    dibits, norm = symbolize_step(d, sps, n_sym, four_level)
    power = jnp.mean(xr * xr + xi * xi, axis=-1)
    return dibits, norm, power


def symbolize_step(d: jax.Array, sps: float, n_sym: int,
                   four_level: bool = True):
    """Timing recovery + level tracking + slicing on a ``[C, B]`` batch
    of DISCRIMINATOR samples → (dibits, soft symbols).

    The entry point for demodulated-PCM inputs (the reference's UDP/TCP
    discriminator-tap sources, src/io/audio_backends/udp_input.c /
    tcp_input.c, which bypass the I/Q front end and feed getSymbol
    directly); frontend_step routes its own discriminator output here.
    """
    c, n = d.shape
    # -- timing: windowed energy-normalized O&M estimate per block -------
    # A block-global Σ e·tone lets a dead-carrier span swamp the timing
    # estimate: when a trunked call ends mid-block (the last block of
    # EVERY call), the noise tail's discriminator variance dwarfs the
    # live span's and the recovered tau goes wrong for the whole block.
    # Normalizing each window's phasor by its own energy makes live
    # windows vote coherently while noise windows contribute bounded
    # random phasors — the coherent majority wins.
    dc = jnp.mean(d, axis=-1, keepdims=True)
    e = (d - dc) ** 2
    idx = jnp.arange(n, dtype=jnp.float32)
    # all-real phasor arithmetic: complex arrays hit emulated paths on
    # the TPU backend (measured 10x on the frontend step)
    ang = (2.0 * jnp.pi / sps) * idx
    wlen = min(2048, n)                        # ~200 symbols at sps=10
    nww = n // wlen
    ec = e[:, : nww * wlen].reshape(c, nww, wlen)
    cr = jnp.cos(ang[: nww * wlen]).reshape(nww, wlen)
    ci = jnp.sin(ang[: nww * wlen]).reshape(nww, wlen)
    Xr = jnp.sum(ec * cr[None], axis=-1)       # [C, nw]
    Xi = -jnp.sum(ec * ci[None], axis=-1)
    w = 1.0 / (jnp.sum(ec, axis=-1) + 1e-9)
    Xre = jnp.sum(Xr * w, axis=-1)
    Xim = jnp.sum(Xi * w, axis=-1)
    tau = jnp.mod(-jnp.arctan2(Xim, Xre) * (sps / (2 * jnp.pi)), sps)

    isps = int(round(sps))
    if abs(sps - isps) < 1e-9 and n_sym * isps + isps <= n:
        # integer samples/symbol (every supported mode at 48 kHz): the
        # per-channel gather collapses to a reshape + one-hot contraction
        # over the symbol phase — TPU-friendly (no dynamic gather)
        o = jnp.floor(tau).astype(jnp.int32)            # [C] in [0, sps)
        frac = (tau - o.astype(jnp.float32))[:, None]   # [C, 1]
        dr = d[:, :n_sym * isps].reshape(c, n_sym, isps)
        nxt = d[:, isps:n_sym * isps + isps:isps]       # next symbol's s0
        dr = jnp.concatenate([dr, nxt[:, :, None]], axis=2)  # [C,K,sps+1]
        j = jnp.arange(isps + 1, dtype=jnp.int32)[None, :]
        w = (jnp.where(j == o[:, None], 1.0 - frac, 0.0)
             + jnp.where(j == o[:, None] + 1, frac, 0.0))    # [C, sps+1]
        sym = jnp.einsum("ckj,cj->ck", dr, w)
    else:
        k = jnp.arange(n_sym, dtype=jnp.float32)
        pos = k[None, :] * sps + tau[:, None]
        pos = jnp.clip(pos, 0.0, n - 2.0)
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - i0.astype(jnp.float32)
        g0 = jnp.take_along_axis(d, i0, axis=-1)
        g1 = jnp.take_along_axis(d, i0 + 1, axis=-1)
        sym = g0 * (1.0 - frac) + g1 * frac

    # -- levels: windowed min/max (robust enough post-LPF) ---------------
    win = min(256, n_sym)        # small blocks: one window is the block
    nw = max(n_sym // win, 1)
    body = sym[:, : nw * win].reshape(c, nw, win)
    hi = jnp.max(body, axis=-1)
    lo = jnp.min(body, axis=-1)
    center = jnp.repeat((hi + lo) * 0.5, win, axis=-1)
    # a window with no real discriminator swing (muted/blanked input,
    # e.g. ring-underflow zeros) must slice to SILENCE, not have its
    # numerical dust amplified to full-scale symbols — all-zero dibit
    # runs pass zero-syndrome FEC gates and synthesize phantom voice.
    # Any real signal, even pure noise, swings far above 1e-5 (an FM
    # discriminator of noise spans ±π).
    swing = jnp.maximum((hi - lo) * 0.5, 1e-6)
    scale = jnp.repeat(jnp.where(swing < 1e-5, jnp.inf, swing),
                       win, axis=-1)
    pad = n_sym - nw * win
    if pad > 0:
        center = jnp.concatenate([center, center[:, -1:].repeat(pad, axis=-1)], axis=-1)
        scale = jnp.concatenate([scale, scale[:, -1:].repeat(pad, axis=-1)], axis=-1)
    norm = (sym - center) / scale * 3.0

    if four_level:
        neg = norm < 0.0
        outer = jnp.abs(norm) > 2.0
        dibits = jnp.where(neg, jnp.where(outer, 3, 2), jnp.where(outer, 1, 0))
    else:
        dibits = jnp.where(norm < 0.0, 3, 1)
    return dibits.astype(jnp.uint8), norm


@lru_cache(maxsize=8)
def make_frontend_step(mode_name: str, B: int, fs: float = 48000.0,
                       use_pallas: bool | None = None):
    """Build a jitted ``[C, B]`` front-end step for a decode mode.

    ``use_pallas=None`` auto-selects: the fused MXU kernel on TPU, the
    plain XLA chain elsewhere (pallas interpret mode is debug-only).
    """
    mode = MODES[mode_name]
    sps = fs / mode.symbol_rate
    n_sym = int(B // sps) - 2
    # keep taps as a host constant: eager device ops are slow on the
    # tunneled TPU and complex/constant transfers can be unsupported
    taps = firdes.channel_lpf(fs, mode.lpf_profile)
    if use_pallas is None:
        # TPU only: the kernel builds pltpu.VMEM BlockSpecs, which fail
        # to lower on GPU/ROCm backends
        use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def step(iq: jax.Array):
        return frontend_step(iq, taps, sps, n_sym, mode.four_level,
                             use_pallas=use_pallas)

    return step
