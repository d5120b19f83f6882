"""Pallas fused FIR+discriminator vs the reference XLA chain."""

import numpy as np
import pytest


def _xla_chain(x, taps):
    import jax.numpy as jnp
    from dsdneo_tpu.dsp import frontend
    y = frontend.fir_complex(jnp.asarray(x), jnp.asarray(taps))
    return np.asarray(frontend.fm_discriminate(y))


def test_fused_fir_discriminate_matches_xla():
    from dsdneo_tpu.dsp import firdes
    from dsdneo_tpu.ops.pallas_frontend import fir_discriminate

    rng = np.random.default_rng(7)
    taps = firdes.channel_lpf(48000.0, "p25_c4fm")
    c, b = 4, 1000
    # realistic input: lowpass-ish FM signal so discriminator angles are
    # small and wrap-free
    phase = np.cumsum(rng.normal(scale=0.4, size=(c, b)), axis=-1)
    x = np.exp(1j * phase).astype(np.complex64)

    want = _xla_chain(x, taps)
    got = np.asarray(fir_discriminate(
        x.real.astype(np.float32), x.imag.astype(np.float32),
        taps, interpret=True))
    assert got.shape == want.shape
    assert got[0, 0] == 0.0 and abs(want[0, 0]) < 1e-6
    np.testing.assert_allclose(got[:, 1:], want[:, 1:], atol=2e-4)


def test_fused_fir_discriminate_odd_sizes():
    """Non-multiple-of-8 channels, non-multiple-of-128 samples."""
    from dsdneo_tpu.dsp import firdes
    from dsdneo_tpu.ops.pallas_frontend import fir_discriminate

    rng = np.random.default_rng(3)
    taps = firdes.channel_lpf(48000.0, "6k25")
    c, b = 3, 517
    phase = np.cumsum(rng.normal(scale=0.2, size=(c, b)), axis=-1)
    x = np.exp(1j * phase).astype(np.complex64)
    want = _xla_chain(x, taps)
    got = np.asarray(fir_discriminate(
        x.real.astype(np.float32), x.imag.astype(np.float32),
        taps, interpret=True))
    np.testing.assert_allclose(got[:, 1:], want[:, 1:], atol=2e-4)


def test_band_matrix_is_fir():
    """H columns reproduce the 'same'-aligned FIR directly."""
    from dsdneo_tpu.ops.pallas_frontend import FRAME, band_matrix
    taps = np.arange(1, 8, dtype=np.float32)
    h = band_matrix(taps)
    x = np.arange(3 * FRAME, dtype=np.float32)
    y = x @ h
    # lane j, current: y[n] = sum_t taps[t] x[FRAME + j + 3 - t]
    for j in (0, 5, 127):
        n = FRAME + j
        want = sum(taps[t] * x[n + 3 - t] for t in range(7))
        assert y[FRAME + j] == pytest.approx(want)
        want_prev = sum(taps[t] * x[n - 1 + 3 - t] for t in range(7))
        assert y[j] == pytest.approx(want_prev)


def test_pallas_tpu_parity_when_tpu_present():
    """On a real TPU backend (run outside the CPU-forced conftest, e.g.
    `JAX_PLATFORMS='' pytest -p no:cacheprovider tests/test_pallas_ops.py -k tpu_parity`):
    the fused Mosaic kernel must match the plain-XLA chain.  bench.py
    reports the same number as pallas_parity_max_err every round."""
    import jax
    if jax.default_backend() in ("cpu",):
        pytest.skip("no TPU in this session (conftest forces CPU)")
    import numpy as np
    from bench import bench_pallas_parity
    err = bench_pallas_parity()
    assert err < 1e-3, f"Pallas/Mosaic vs XLA soft-symbol mismatch: {err}"
