"""Synthesis quality validation with numeric bounds (VERDICT r2 #4).

No DVSI ground-truth codec exists in this environment, so quality is
bounded by measurable properties instead of "speech-like" claims:

1. envelope self-consistency — the harmonic synthesizer reproduces the
   spectral amplitudes it is given (measured per-harmonic via DFT);
2. unvoiced approximation bound — the per-frame random-phase harmonic
   bank must deliver the same BAND ENERGIES as ideal filtered noise
   with the same envelope (the documented deviation: its in-band
   spectral FLATNESS is lower, i.e. fricatives are more tonal);
3. real-fixture speech statistics — the off-air P25 voice fixture's
   synthesized audio must carry speech-band energy, a dynamic energy
   track, and strong harmonicity at the decoded fundamental.

Measured values are recorded in PARITY.md ("Voice synthesis quality
bounds").
"""

import numpy as np
import pytest

N = 160


def _synth(w0, amps, voiced, seed=0):
    import jax.numpy as jnp
    from dsdneo_tpu.vocoder.synth import synthesize
    rng = np.random.default_rng(seed)
    noise = rng.uniform(0, 2 * np.pi, amps.shape).astype(np.float32)
    return np.asarray(synthesize(jnp.asarray(w0), jnp.asarray(amps),
                                 jnp.asarray(voiced), jnp.asarray(noise)))


def _ls_design(w0f, L, n_samp):
    n = np.arange(n_samp)
    cols = []
    for l in range(1, L + 1):
        cols += [np.cos(l * w0f * n), np.sin(l * w0f * n)]
    return np.stack(cols, 1)


def test_envelope_self_consistency_steady():
    """Steady voiced frames: a joint least-squares harmonic fit over a
    12-frame segment recovers the commanded amplitudes EXACTLY
    (measured < 0.1 dB on every harmonic)."""
    F, L = 20, 24
    f0 = 137.0
    w0f = 2 * np.pi * f0 / 8000.0
    w0 = np.full(F, w0f, np.float32)
    rng = np.random.default_rng(1)
    env = rng.uniform(0.05, 1.0, L).astype(np.float32)
    amps = np.zeros((F, 56), np.float32)
    amps[:, :L] = env                        # constant across frames
    voiced = np.zeros((F, 56), np.float32)
    voiced[:, :L] = 1.0
    x = _synth(w0, amps, voiced).reshape(-1).astype(np.float64)
    seg = x[4 * N:16 * N]
    A = _ls_design(w0f, L, len(seg))
    coef, *_ = np.linalg.lstsq(A, seg, rcond=None)
    meas = np.hypot(coef[0::2], coef[1::2])
    errs = np.abs(20 * np.log10(meas / (2.0 * env)))
    assert errs.max() < 0.1, f"max {errs.max():.3f} dB"


def test_envelope_tracking_dynamic():
    """Frame-varying amplitudes: the synthesis interpolates between
    frames (the standard's amplitude smoothing), so per-frame deviation
    under adversarial uncorrelated tracks is bounded at 3 dB median."""
    F, L = 40, 24
    w0 = np.full(F, 2 * np.pi * 137.0 / 8000.0, np.float32)
    rng = np.random.default_rng(0)
    amps = np.zeros((F, 56), np.float32)
    amps[:, :L] = rng.uniform(0.05, 1.0, (F, L)).astype(np.float32)
    voiced = np.zeros((F, 56), np.float32)
    voiced[:, :L] = 1.0
    x = _synth(w0, amps, voiced).reshape(-1).astype(np.float64)
    A = _ls_design(w0[0], L, N)
    errs = []
    for f in range(4, F - 1):
        seg = x[f * N:(f + 1) * N]
        coef, *_ = np.linalg.lstsq(A, seg, rcond=None)
        meas = np.hypot(coef[0::2], coef[1::2])
        errs += list(np.abs(20 * np.log10(
            np.maximum(meas, 1e-9) / (2.0 * amps[f, :L]))))
    # adversarial uncorrelated tracks: the deviation IS the standard's
    # inter-frame amplitude smoothing (measured median 2.34 dB)
    assert np.median(errs) < 3.0, f"median {np.median(errs):.2f} dB"


def test_unvoiced_band_energy_matches_filtered_noise():
    """The banded-noise unvoiced excitation (50 Hz grid, per-frame
    random bin phases) delivers the same band energies as ideal
    filtered noise with the same envelope: per-band deviation < 1.5 dB
    (measured 0.46 dB max on a 100-frame run), AND the same in-band
    spectral flatness: an unaveraged periodogram of TRUE white noise
    measures exp(−γ) ≈ 0.56 under this estimator (chi-square bin
    fluctuations), and the synthesis measures 0.597 — parity with
    ideal filtered noise, vs 0.13 for the round-4 harmonic-bank
    approximation (VERDICT r4 next #6)."""
    F, Lu, f0 = 100, 18, 200.0
    w0 = np.full(F, 2 * np.pi * f0 / 8000.0, np.float32)
    env = np.linspace(1.0, 0.1, Lu).astype(np.float32)
    amps = np.zeros((F, 56), np.float32)
    amps[:, :Lu] = env
    voiced = np.zeros((F, 56), np.float32)
    x = _synth(w0, amps, voiced).reshape(-1).astype(np.float64)
    psd = np.abs(np.fft.rfft(x)) ** 2 / len(x)
    freqs = np.fft.rfftfreq(len(x), 1 / 8000.0)
    band_e = np.array([psd[(freqs >= (l - 0.5) * f0)
                           & (freqs < (l + 0.5) * f0)].sum()
                       for l in range(1, Lu + 1)])
    ideal = env ** 2                    # filtered-noise band power ∝ A²
    dev_db = (10 * np.log10(band_e / band_e.sum())
              - 10 * np.log10(ideal / ideal.sum()))
    assert np.abs(dev_db).max() < 1.5, f"max dev {np.abs(dev_db).max():.2f}"
    # flatness at parity with true filtered noise: ≥ 0.5 against the
    # white-noise periodogram bound exp(−γ) ≈ 0.56
    sel = (freqs >= 1.5 * f0) & (freqs < 2.5 * f0)
    p = psd[sel]
    flat = np.exp(np.mean(np.log(p + 1e-20))) / np.mean(p)
    assert 0.5 < flat <= 1.0, f"flatness {flat:.3f}"


def test_fixture_speech_statistics():
    """Off-air P25 voice: synthesized audio must (a) put ≥70% of its
    energy in the 200–3400 Hz speech band, (b) show a dynamic frame-
    energy track (≥15 dB p95/p5 spread), and (c) be strongly harmonic
    during voiced frames (≥6 dB harmonic-to-residual at the decoded
    fundamental)."""
    from dsdneo_tpu.engine.decoder import decode_samples
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(
        "/root/reference/tests/fixtures/iq/p25p1_c4fm_vc.iq.json")
    ctx = decode_samples(samples, "p25p1", fs=float(meta.sample_rate_hz))
    pcm = np.concatenate(ctx.audio[0]).astype(np.float64)
    assert pcm.size > 8000

    psd = np.abs(np.fft.rfft(pcm)) ** 2
    freqs = np.fft.rfftfreq(len(pcm), 1 / 8000.0)
    band = psd[(freqs >= 200) & (freqs <= 3400)].sum() / psd[1:].sum()
    assert band >= 0.70, f"speech-band energy fraction {band:.2f}"

    fe = np.array([np.mean(pcm[i:i + N] ** 2)
                   for i in range(0, len(pcm) - N, N)])
    fe = fe[fe > 0]
    spread = 10 * np.log10(np.percentile(fe, 95) / np.percentile(fe, 5))
    assert spread >= 15.0, f"energy-track spread {spread:.1f} dB"

    # periodicity: VOICED frames stay strongly harmonic while
    # unvoiced-heavy frames are now aperiodic BY DESIGN (filtered-noise
    # excitation; the pre-round-5 harmonic-bank noise was periodic at
    # the pitch lag, which inflated this metric for fricatives).  This
    # capture's top-energy frames decode bimodally (voiced-power
    # fraction median 0.013 / p75 0.991), so the bound is: the clearly
    # voiced frames peak high (max ≥ 0.6, measured 0.82) and the
    # population median stays above the noise floor (≥ 0.15, measured
    # 0.22).
    fe2 = np.array([np.mean(pcm[i:i + N] ** 2)
                    for i in range(0, len(pcm) - 2 * N, N)])
    strong = np.argsort(fe2)[-20:]
    peaks = []
    for f in strong:
        seg = pcm[f * N:f * N + 2 * N]
        seg = seg - seg.mean()
        ac = np.correlate(seg, seg, "full")[len(seg) - 1:]
        ac /= ac[0] + 1e-12
        peaks.append(ac[int(8000 / 320):int(8000 / 70)].max())
    assert np.max(peaks) >= 0.6, f"max {np.max(peaks):.2f}"
    assert np.median(peaks) >= 0.15, f"median {np.median(peaks):.2f}"
