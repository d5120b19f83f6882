"""CQPSK carrier-drift robustness: the feed-forward chain must track a
drifting oscillator within a block the way the reference's FLL does
continuously (src/dsp/costas.cpp:1176).  The whole-block 4th-power
estimate smears beyond ~150 Hz/s on 2 s blocks; the windowed estimator
(DSD_NEO_CFO_WINDOWS) restores tracking up to the pull-in bound."""

import numpy as np
import jax.numpy as jnp

from dsdneo_tpu.dsp import firdes
from dsdneo_tpu.dsp.cqpsk import demod_cqpsk
from dsdneo_tpu.runtime import config as C

FS, RS = 48000.0, 4800.0
SPS = FS / RS
K = 9000                                   # ~1.9 s of symbols
RNG = np.random.default_rng(7)
DIBITS = RNG.choice([-3, -1, 1, 3], size=K)


def synth_pi4dqpsk(dibits, f0_hz, slope_hz_s):
    """π/4-DQPSK at RS sym/s: phase increments of dibit·π/4, RRC
    shaping, then a linear carrier ramp f(t) = f0 + slope·t."""
    ph = np.cumsum(np.asarray(dibits) * np.pi / 4.0)
    sym = np.exp(1j * ph)
    n = int(len(dibits) * SPS) + int(16 * SPS)
    x = np.zeros(n, np.complex64)
    idx = (np.arange(len(dibits)) * SPS + 8 * SPS).astype(int)
    x[idx] = sym
    taps = np.asarray(firdes.rrc(SPS, int(8 * SPS) | 1, 0.2))
    x = np.convolve(x, taps, mode="same")
    t = np.arange(n) / FS
    x = x * np.exp(2j * np.pi * (f0_hz * t + 0.5 * slope_hz_s * t * t))
    return x.astype(np.complex64)


def accuracy(soft):
    s = np.asarray(soft)[0]
    sl = np.clip(np.round((s + 3) / 2) * 2 - 3, -3, 3)
    best = 0.0
    for off in range(20):
        m = min(len(sl) - off, K)
        best = max(best, float(np.mean(sl[off:off + m] == DIBITS[:m])))
    return best


def _ramp(slope):
    # center the ramp on 0 Hz so it stays inside the default ±Rs/8
    # pull-in bound (the reference FLL has the same bounded pull-in)
    return synth_pi4dqpsk(DIBITS, -slope * (K / RS) / 2.0, slope)


def test_windowed_cfo_tracks_drift_ramp():
    """600 Hz/s drift: whole-block estimate degrades, 8-window tracking
    recovers the symbols cleanly."""
    x = jnp.asarray(_ramp(600.0)[None, :])
    soft1, _ = demod_cqpsk(x, FS, RS, cfo_windows=1)
    soft8, _ = demod_cqpsk(x, FS, RS, cfo_windows=8)
    assert accuracy(soft1) < 0.95          # documents the failure mode
    assert accuracy(soft8) > 0.995


def test_windowed_cfo_no_regression_on_static_carrier():
    """A constant 200 Hz offset decodes identically through both paths."""
    x = jnp.asarray(synth_pi4dqpsk(DIBITS, 200.0, 0.0)[None, :])
    soft1, cfo1 = demod_cqpsk(x, FS, RS, cfo_windows=1)
    soft8, cfo8 = demod_cqpsk(x, FS, RS, cfo_windows=8)
    assert accuracy(soft1) > 0.999
    assert accuracy(soft8) > 0.999
    assert abs(float(cfo1[0]) - 200.0) < 10.0
    assert abs(float(cfo8[0]) - 200.0) < 10.0


def test_cfo_windows_knob_reaches_engine_path():
    """DSD_NEO_CFO_WINDOWS: auto (0) survives the drift ramp through
    demod_cqpsk_path; forcing the legacy single window (1) fails on the
    same input — the knob is consumed."""
    from dsdneo_tpu.engine.demod import demod_cqpsk_path
    x = _ramp(600.0)
    old = C._config
    try:
        C._config = C.RuntimeConfig(cfo_windows=0)
        dib_auto, _ = demod_cqpsk_path(x, "p25p1", fs=FS)
        C._config = C.RuntimeConfig(cfo_windows=1)
        dib_one, _ = demod_cqpsk_path(x, "p25p1", fs=FS)
    finally:
        C._config = old
    # map decoded dibit codes back to the ±1/±3 alphabet used above
    lut = np.array([1, 3, -1, -3])
    acc = [0.0, 0.0]
    for i, d in enumerate((dib_auto, dib_one)):
        s = lut[np.asarray(d).ravel()]
        for off in range(20):
            m = min(len(s) - off, K)
            acc[i] = max(acc[i], float(np.mean(s[off:off + m]
                                               == DIBITS[:m])))
    assert acc[0] > 0.995
    assert acc[1] < 0.95
