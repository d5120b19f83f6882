"""Signal-quality estimators: per-modulation SNR, squelch, spectrum.

Reference parity: src/dsp/snr_estimator.cpp (C4FM eye / QPSK
constellation / GFSK eye SNR) + snr_bias.cpp corrections, the power
squelch in demod_pipeline.cpp, and the spectrum snapshot feeding the
UI/auto-PPM (src/io/radio/rtl_metrics.cpp).
All batched ``[C, ...]`` pure functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def snr_c4fm_eye(norm_symbols: jax.Array) -> jax.Array:
    """Eye-based SNR (dB) for 4-level symbols normalized to ±1/±3:
    signal power of the ideal levels vs residual around nearest level."""
    lv = jnp.asarray([1.0, 3.0, -1.0, -3.0])
    d = jnp.min(jnp.abs(norm_symbols[..., None] - lv), axis=-1)
    noise = jnp.mean(d ** 2, axis=-1)
    sig = jnp.mean(norm_symbols ** 2, axis=-1)
    return 10.0 * jnp.log10(jnp.maximum(sig / jnp.maximum(noise, 1e-9), 1e-9))


def snr_qpsk_constellation(symbols: jax.Array) -> jax.Array:
    """SNR (dB) from unit-circle spread of differential QPSK phasors."""
    mag = jnp.abs(symbols)
    mean_mag = jnp.mean(mag, axis=-1, keepdims=True)
    err = jnp.mean((mag - mean_mag) ** 2, axis=-1)
    sig = jnp.mean(mag ** 2, axis=-1)
    return 10.0 * jnp.log10(jnp.maximum(sig / jnp.maximum(err, 1e-9), 1e-9))


# -- SNR bias correction (reference src/dsp/snr_bias.cpp) ------------------
#
# The variance-ratio estimators above are biased by (a) the statistics of
# the clustering method and (b) the ratio of channel-filter noise
# bandwidth to symbol rate.  bias_total = bias_est + 10 log10(Bn / Rs).

_ESTIMATOR_BIAS_DB = {"c4fm": 5.73, "evm": 1.92}

# Noise-equivalent bandwidth (Hz) per channel-LPF profile, computed as
# Bn = (Fs/2)·Σh²/(Σh)² for the reference 24 kHz designs
# (snr_bias.cpp kNoiseBw*).
NOISE_BW_HZ = {"wide": 8415.0, "6k25": 3540.0, "12k5": 6665.0,
               "provoice": 6665.0, "p25_c4fm": 6665.0, "p25_cqpsk": 7065.0}


def snr_bias_db(kind: str, symbol_rate: float,
                lpf_profile: str = "wide") -> float:
    """Total bias (dB) to subtract from a raw eye/EVM SNR estimate.

    kind: 'c4fm' (4-level eye) or 'evm' (QPSK/GFSK constellation).
    Fallbacks match the reference's original empirical calibrations
    (7.95 dB / 2.43 dB) when the symbol rate is unknown."""
    est = _ESTIMATOR_BIAS_DB.get(kind, _ESTIMATOR_BIAS_DB["evm"])
    if symbol_rate <= 0:
        return est + (2.2 if kind == "c4fm" else 0.5)
    bn = NOISE_BW_HZ.get(lpf_profile, NOISE_BW_HZ["wide"])
    return est + 10.0 * float(np.log10(bn / symbol_rate))


def snr_corrected_db(raw_db, kind: str, symbol_rate: float,
                     lpf_profile: str = "wide"):
    """Apply the bias correction to a raw SNR estimate."""
    return raw_db - snr_bias_db(kind, symbol_rate, lpf_profile)


def power_squelch(iq: jax.Array, threshold_db: float = -110.0) -> jax.Array:
    """Per-channel open/closed gate from mean input power (dBFS)."""
    p = jnp.mean(jnp.abs(iq) ** 2, axis=-1)
    db = 10.0 * jnp.log10(jnp.maximum(p, 1e-20))
    return db > threshold_db


def spectrum_snapshot(iq: jax.Array, nfft: int = 1024) -> jax.Array:
    """Averaged power spectrum ``[C, nfft]`` in dB (UI + auto-PPM food)."""
    c, n = iq.shape
    m = n // nfft
    x = iq[:, : m * nfft].reshape(c, m, nfft)
    w = jnp.hanning(nfft).astype(jnp.float32)
    spec = jnp.fft.fftshift(jnp.abs(jnp.fft.fft(x * w, axis=-1)) ** 2, axes=-1)
    avg = jnp.mean(spec, axis=1)
    return 10.0 * jnp.log10(jnp.maximum(avg, 1e-20))


def estimate_cfo_fm(disc: jax.Array, fs: float) -> jax.Array:
    """Carrier-offset estimate (Hz) from discriminator DC — the auto-PPM
    observable (reference src/io/radio/rtl_auto_ppm.cpp)."""
    return jnp.mean(disc, axis=-1) * (fs / 2.0)
