"""The jitted device demod step: framed I/Q → soft symbols + dibits.

This is the rebuild's equivalent of the reference demod thread's
``full_demod`` (src/dsp/demod_pipeline.cpp:1311): one traced function
per (mode, shape) that runs the channel filter, discriminator, timing
recovery and slicing for a whole ``[C, N]`` batch on device.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from dsdneo_tpu.dsp import firdes, frontend
from dsdneo_tpu.engine.modes import MODES, ModeConfig
from dsdneo_tpu.symbols import slicer, timing


@lru_cache(maxsize=32)
def _taps_for(profile: str, fs: float) -> np.ndarray:
    return firdes.channel_lpf(fs, profile)


@partial(jax.jit, static_argnames=("sps", "four_level", "n_sym", "freeze",
                                   "use_lpf"))
def _demod_fm_jit(x: jax.Array, taps: jax.Array, sps: float, four_level: bool,
                  n_sym: int, freeze: bool = False, use_lpf: bool = True):
    # DSD_NEO_CHANNEL_LPF=0 bypasses the channel low-pass (the
    # reference auto-enables it at DSP rates ≥20 kHz; mode passbands
    # protect nominal channel edges — docs/cli.md:571-572)
    y = frontend.fir_complex(x, taps) if use_lpf else x
    d = frontend.fm_discriminate(y)
    # power gate: dead-air samples (numeric dust after resampling /
    # channelizing) give full-scale random discriminator angles that
    # poison timing and level estimation — the reference's squelch
    # analogue (src/dsp/demod_pipeline.cpp squelch stage)
    p = jnp.abs(y) ** 2
    d = jnp.where(p > 0.02 * jnp.max(p, axis=-1, keepdims=True), d, 0.0)
    # DSD_NEO_WINDOW_FREEZE: freeze symbol-center window timing (one
    # global phase, no drift tracking) for debugging symbol-center
    # drift (docs/cli.md:312-314)
    if freeze:
        sym, pos = timing.recover_symbols_fixed(d, sps, max_symbols=n_sym)
    else:
        sym, pos = timing.recover_symbols(d, sps, win_symbols=256,
                                          max_symbols=n_sym)
    dibits, norm = slicer.slice_dibits(sym, win=512, four_level=four_level)
    power = frontend.iq_power(x)
    return dibits, norm, power


def gated_frontend_step(x, taps, sps: float, n_sym: int,
                        four_level: bool = True):
    """Traceable power-gated front end for BURSTY protocols (YSF, dPMR
    transmissions have dead-air gaps): the _demod_fm_jit chain —
    discriminator samples under 2% of peak power are zeroed before
    timing/level estimation, and slicing uses the windowed robust
    levels (win=512) — as a composable piece for the batched
    pipelines.  ``x`` is complex [C, B] or float [C, B, 2] planes."""
    from dsdneo_tpu.dsp import frontend as fe
    from dsdneo_tpu.symbols import slicer as slc
    from dsdneo_tpu.symbols import timing as tmg
    xc = jax.lax.complex(x[..., 0], x[..., 1]) if x.ndim == 3 else x
    y = fe.fir_complex(xc, taps)
    d = fe.fm_discriminate(y)
    p = jnp.abs(y) ** 2
    d = jnp.where(p > 0.02 * jnp.max(p, axis=-1, keepdims=True), d, 0.0)
    sym, _pos = tmg.recover_symbols(d, sps, win_symbols=256,
                                    max_symbols=n_sym)
    dibits, soft = slc.slice_dibits(sym, win=512, four_level=four_level)
    return dibits, soft


def demod_cqpsk_path(samples: np.ndarray, mode: ModeConfig | str,
                     fs: float = 48000.0) -> tuple[np.ndarray, np.ndarray]:
    """CQPSK/LSM demod → (dibits, soft) in the shared ±1/±3 alphabet."""
    from dsdneo_tpu.dsp.cqpsk import demod_cqpsk
    if isinstance(mode, str):
        mode = MODES[mode]
    x = np.asarray(samples)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    # CQPSK tuning knobs (docs/cli.md:310-314, 569-576): loop-dynamics
    # equivalents for the feed-forward chain + polarity tweaks
    from dsdneo_tpu.runtime import config as rtcfg
    cfg = rtcfg.get()
    if cfg.cqpsk_sync_neg:
        # DSD_NEO_CQPSK_SYNC_NEG: spectral inversion of the capture
        x = np.conj(x)
    pull_in = cfg.costas_bw * float(mode.symbol_rate) \
        if cfg.costas_bw > 0 else 0.0
    prior, alpha = None, 1.0
    if cfg.costas_damping > 0:
        prior = getattr(demod_cqpsk_path, "_cfo_ema", None)
        alpha = 1.0 / (1.0 + cfg.costas_damping)
    # DSD_NEO_CFO_WINDOWS: carrier-drift tracking granularity.  0 (the
    # default) picks one ~0.25 s estimation window per block — the
    # feed-forward stand-in for the reference FLL's continuous tracking
    # (src/dsp/costas.cpp:1176); 1 forces the legacy whole-block
    # estimate; N>1 forces N windows.
    windows = cfg.cfo_windows
    if windows <= 0:
        windows = max(1, int(x.shape[-1] / (fs * 0.25)))
    soft, cfo = demod_cqpsk(jnp.asarray(x), fs, float(mode.symbol_rate),
                            ted_gain=cfg.ted_gain, pull_in_hz=pull_in,
                            cfo_prior=prior, cfo_alpha=alpha,
                            cfo_windows=windows)
    if cfg.costas_damping > 0:
        demod_cqpsk_path._cfo_ema = float(np.asarray(cfo).mean())
    if cfg.debug_cqpsk:
        from dsdneo_tpu.runtime import log
        log.debug("CQPSK: cfo=%.1f Hz win_gain=%.2f pull_in=%.0f Hz",
                  float(np.asarray(cfo).mean()), cfg.ted_gain, pull_in)
    soft = np.asarray(soft)
    if cfg.cqpsk_sync_inv:
        # DSD_NEO_CQPSK_SYNC_INV: symbol polarity inversion
        soft = -soft
    neg = soft < 0
    outer = np.abs(soft) > 2
    dibits = np.where(neg, np.where(outer, 3, 2),
                      np.where(outer, 1, 0)).astype(np.uint8)
    if squeeze:
        return dibits[0], soft[0]
    return dibits, soft


def demod_fm(samples: np.ndarray, mode: ModeConfig | str, fs: float = 48000.0
             ) -> tuple[np.ndarray, np.ndarray]:
    """Demodulate ``[N]`` or ``[C, N]`` complex baseband → (dibits, soft).

    FM/FSK/C4FM path (CQPSK uses :func:`demod_cqpsk_path`).
    """
    if isinstance(mode, str):
        mode = MODES[mode]
    x = np.asarray(samples)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    sps = fs / mode.symbol_rate
    n_sym = int((x.shape[1] - 2 * sps) // sps)
    taps = jnp.asarray(_taps_for(mode.lpf_profile, fs))
    from dsdneo_tpu.runtime import config as rtcfg
    _cfg = rtcfg.get()
    dibits, norm, _power = _demod_fm_jit(jnp.asarray(x), taps, sps,
                                         mode.four_level, n_sym,
                                         freeze=_cfg.window_freeze,
                                         use_lpf=_cfg.channel_lpf)
    dibits = np.asarray(dibits)
    norm = np.asarray(norm)
    if squeeze:
        return dibits[0], norm[0]
    return dibits, norm


@partial(jax.jit, static_argnames=("sps", "four_level", "n_sym"))
def _symbolize_jit(d, sps, four_level, n_sym):
    from dsdneo_tpu.engine.batched import symbolize_step
    return symbolize_step(d, sps, n_sym, four_level)


def demod_disc(samples: np.ndarray, mode: ModeConfig | str,
               fs: float = 48000.0) -> tuple[np.ndarray, np.ndarray]:
    """Demodulated-PCM (discriminator-tap) input → (dibits, soft):
    timing + slicing only, no I/Q front end (the reference's UDP/TCP
    PCM16LE sources, src/io/audio_backends/udp_input.c:1)."""
    if isinstance(mode, str):
        mode = MODES[mode]
    x = np.asarray(samples, dtype=np.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    sps = fs / mode.symbol_rate
    n_sym = int((x.shape[1] - 2 * sps) // sps)
    dibits, norm = _symbolize_jit(jnp.asarray(x), sps, mode.four_level,
                                  n_sym)
    dibits = np.asarray(dibits)
    norm = np.asarray(norm)
    if squeeze:
        return dibits[0], norm[0]
    return dibits, norm
