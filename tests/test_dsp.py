"""DSP front-end unit tests with synthetic signals (mirrors the
reference's tests/dsp/ strategy: generated FSK driving the full chain)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dsdneo_tpu.dsp import firdes, frontend
from dsdneo_tpu.symbols import framesync, slicer, timing


def synth_c4fm(dibits, sps=10, fs=48000.0, dev_hz=1800.0, snr_db=30.0, seed=0,
               frac_offset=0.3):
    """Synthesize C4FM-style 4-level FSK baseband from a dibit sequence."""
    lv = np.array([1.0, 3.0, -1.0, -3.0])[np.asarray(dibits)]
    inst = np.repeat(lv, sps) * (dev_hz / 3.0)
    # simple pulse shaping: moving average over half a symbol
    k = sps // 2
    inst = np.convolve(inst, np.ones(k) / k, mode="same")
    phase = 2 * np.pi * np.cumsum(inst) / fs
    x = np.exp(1j * phase)
    # fractional-sample delay via linear interp to exercise timing recovery
    t = np.arange(len(x) - 1) + frac_offset
    x = x[:-1] * (1 - frac_offset) + x[1:] * frac_offset
    rng = np.random.default_rng(seed)
    noise = (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape))
    x = x + noise * 10 ** (-snr_db / 20)
    return x.astype(np.complex64)


def test_fir_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 500)).astype(np.float32)
    taps = firdes.lowpass_taps(31, 48000, 6000)
    out = np.asarray(frontend.fir_real(jnp.asarray(x), jnp.asarray(taps)))
    ref = np.stack([np.convolve(r, taps, mode="same") for r in x])
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_discriminator_recovers_tone():
    fs = 48000.0
    f0 = 1200.0
    n = 4800
    x = np.exp(2j * np.pi * f0 * np.arange(n) / fs).astype(np.complex64)
    d = np.asarray(frontend.fm_discriminate(jnp.asarray(x[None, :])))[0]
    # expected normalized frequency: f0 / (fs/2)
    np.testing.assert_allclose(d[10:], f0 / (fs / 2), atol=1e-3)


def test_timing_recovery_and_slicing_synthetic():
    rng = np.random.default_rng(5)
    dibits = rng.integers(0, 4, 2000).astype(np.uint8)
    x = synth_c4fm(dibits, sps=10)
    taps = jnp.asarray(firdes.channel_lpf(48000.0, "p25_c4fm"))
    d = frontend.fm_discriminate(frontend.fir_complex(jnp.asarray(x)[None], taps))
    sym, _ = timing.recover_symbols(d, 10.0, win_symbols=128)
    out, norm = slicer.slice_dibits(sym, win=256)
    out = np.asarray(out)[0]
    # ignore edges; allow tiny error rate
    match = (out[10:1900] == dibits[10:1900]).mean()
    assert match > 0.99, f"dibit accuracy {match}"


def test_framesync_finds_pattern():
    rng = np.random.default_rng(6)
    dibits = rng.integers(0, 4, 600).astype(np.uint8)
    pat = framesync.SYNC_DEFS[0]   # +P25p1
    pd = np.array(["13".index(c) * 2 + 1 for c in pat.pattern], dtype=np.uint8)
    dibits[100:100 + len(pd)] = pd
    soft = np.array([1.0, 3.0, -1.0, -3.0], dtype=np.float32)[dibits]
    hits = framesync.find_syncs(soft, framesync.patterns_for({"p25p1"}),
                                threshold=0.9)
    assert any(h.pos == 100 and h.sync.name == "+P25p1" for h in hits)


def test_halfband_decimation_preserves_passband():
    fs = 48000.0
    f0 = 3000.0
    n = 9600
    x = np.exp(2j * np.pi * f0 * np.arange(n) / fs).astype(np.complex64)
    taps = jnp.asarray(firdes.halfband(31))
    y = np.asarray(frontend.decimate2_halfband(jnp.asarray(x)[None], taps))[0]
    assert y.shape[0] == n // 2
    # tone should appear at same absolute freq in the decimated signal
    spec = np.fft.fftfreq(len(y), d=2 / fs)[np.argmax(np.abs(np.fft.fft(y)))]
    assert abs(spec - f0) < 50


def test_audio_gate_opens_and_hangs():
    from dsdneo_tpu.dsp.audio_filters import AudioGate
    g = AudioGate(open_rms=0.01, close_rms=0.004, hang_frames=2)
    quiet = np.zeros(160, dtype=np.float32) + 1e-4
    loud = (0.1 * np.sin(np.arange(160))).astype(np.float32)
    assert not g.process(quiet).any()            # closed
    out = g.process(loud)
    assert out.any()                             # opens on voice
    assert g.process(quiet).any()                # hang keeps it open
    g.process(quiet)
    assert not g.process(quiet).any()            # closes after hang


def test_audio_concealment_fade_repeat():
    from dsdneo_tpu.dsp.audio_filters import AudioConcealer
    c = AudioConcealer(max_repeats=2, fade=0.5)
    buf = np.ones(160, dtype=np.float32)
    np.testing.assert_array_equal(c.feed(buf, 160), buf)
    r1 = c.feed(None, 160)                       # first underrun: -6 dB
    np.testing.assert_allclose(r1, 0.5)
    r2 = c.feed(None, 160)
    np.testing.assert_allclose(r2, 0.25)
    r3 = c.feed(None, 160)                       # beyond max: silence
    assert not r3.any()
    assert c.concealed == 3
    # recovery resets the fade chain
    np.testing.assert_array_equal(c.feed(buf, 160), buf)
    np.testing.assert_allclose(c.feed(None, 160), 0.5)


def test_snr_bias_reference_values():
    """Bias corrections match the reference's calibration identities
    (snr_bias.cpp: C4FM 7.95 dB at 8 kHz Bn / 4800 sym/s, EVM 2.43 dB
    at 5.4 kHz Bn / 4800 sym/s, and the per-profile Bn table)."""
    from dsdneo_tpu.dsp.measure import NOISE_BW_HZ, snr_bias_db
    # estimator-bias identities the reference derives its constants from
    assert abs(snr_bias_db("c4fm", 8000.0 / (10 ** 0.222), "wide")
               - (5.73 + 10 * np.log10(8415.0 / (8000.0 / 10 ** 0.222)))) < 1e-9
    # fallback values (unknown symbol rate)
    assert abs(snr_bias_db("c4fm", 0) - 7.93) < 0.03
    assert abs(snr_bias_db("evm", 0) - 2.42) < 0.03
    # profile table
    assert NOISE_BW_HZ["p25_cqpsk"] == 7065.0
    assert NOISE_BW_HZ["6k25"] == 3540.0


def test_stream_decoder_reports_corrected_snr():
    """A clean synthesized 4-level stream reports a high corrected SNR;
    adding noise lowers it."""
    from dsdneo_tpu.engine.stream import StreamDecoder
    rng = np.random.default_rng(0)
    sps = 10
    sym = rng.choice([-3.0, -1.0, 1.0, 3.0], 3000)
    base = np.repeat(sym, sps) * 0.25
    # FM-modulate at 48 kHz so demod_fm round-trips the levels
    phase = np.cumsum(base) * (2 * np.pi * 1200 / 48000.0)
    iq = np.exp(1j * phase).astype(np.complex64)
    sd = StreamDecoder("dmr", fs=48000.0)
    sd.push(iq)
    clean = sd.last_snr_db
    sd2 = StreamDecoder("dmr", fs=48000.0)
    noisy = iq + (0.20 * (rng.standard_normal(len(iq))
                          + 1j * rng.standard_normal(len(iq)))
                  ).astype(np.complex64)
    sd2.push(noisy)
    assert clean > sd2.last_snr_db
    assert clean > 10.0
