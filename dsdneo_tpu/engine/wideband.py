"""Wideband multi-channel decode: one wideband I/Q capture → every
active narrowband channel decoded.

The reference time-shares a single tuner across a trunked system
(src/io/radio/rtl_stream.c retune + src/engine/trunk_scan.c); the TPU
build instead channelizes the whole band in one device program — the
2x-oversampled PFB (dsp.channelizer.channelize_os2) plus a halfband
decimator yields critically-clean 48 kHz basebands without the
channel-edge aliasing of a plain critically-sampled bank — and decodes
every channel that carries power.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from dsdneo_tpu.dsp import firdes, frontend
from dsdneo_tpu.dsp.channelizer import (channel_frequencies, channelize,
                                        channelize_os2)
from dsdneo_tpu.engine.decoder import decode_samples
from dsdneo_tpu.protocol import base as proto_base

CHANNEL_RATE = 48000.0


@dataclass
class ChannelResult:
    index: int
    freq_hz: float                 # signed offset from band center
    power_db: float
    ctx: proto_base.DecoderContext = field(repr=False)


def channelize_band(samples: np.ndarray, fs: float, n_ch: int | None = None,
                    oversampled: bool = True
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Wideband complex ``[B]`` → (``[n_ch, B/n_ch]`` 48 kHz basebands,
    channel center offsets in Hz)."""
    if n_ch is None:
        n_ch = int(round(fs / CHANNEL_RATE))
    if n_ch < 2:
        raise ValueError(f"wideband decode needs fs >= 96 kHz (fs={fs:g})")
    if abs(fs - n_ch * CHANNEL_RATE) > 1.0:
        raise ValueError(
            f"sample rate {fs:g} is not a multiple of 48 kHz "
            f"({n_ch} channels would need {n_ch * CHANNEL_RATE:g})")
    import jax.numpy as jnp
    x = jnp.asarray(np.ascontiguousarray(samples))
    if oversampled:
        ch2 = channelize_os2(x, n_ch, taps_per_branch=12)
        hb = firdes.lowpass_taps(62, 2.0, 0.5,
                                 window="blackman-harris").astype(np.float32)
        ch = np.asarray(frontend.decimate2_halfband(ch2, hb))
    else:
        ch = np.asarray(channelize(x, n_ch, taps_per_branch=12))
    return ch.astype(np.complex64), channel_frequencies(n_ch, fs)


def decode_wideband(samples: np.ndarray, fs: float, mode="auto",
                    n_ch: int | None = None, oversampled: bool = True,
                    power_gate_db: float = -20.0, **decode_kw
                    ) -> list[ChannelResult]:
    """Channelize a wideband capture and decode every active channel.

    ``power_gate_db``: channels whose mean power is more than this far
    below the strongest channel are skipped (dead air)."""
    ch, freqs = channelize_band(samples, fs, n_ch, oversampled)
    pw = (np.abs(ch) ** 2).mean(axis=-1)
    ref = float(pw.max())
    if ref <= 0:
        return []
    gate = ref * 10.0 ** (power_gate_db / 10.0)
    out: list[ChannelResult] = []
    for k in np.argsort(freqs):
        if pw[k] < gate or pw[k] < 1e-9:
            continue
        ctx = decode_samples(ch[k], mode, fs=CHANNEL_RATE, **decode_kw)
        out.append(ChannelResult(index=int(k), freq_hz=float(freqs[k]),
                                 power_db=10.0 * np.log10(pw[k] / ref),
                                 ctx=ctx))
    return out
