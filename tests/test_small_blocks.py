"""Small-block robustness of the batched front end (regression: the
windowed level estimator reshaped [C, n_sym] to 256-wide windows and
crashed for n_sym < 256) + wideband single-channel guard."""

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import pytest


def test_frontend_step_small_block():
    from dsdneo_tpu.engine.batched import make_frontend_step
    step = make_frontend_step("p25p1", 2560)     # n_sym = 254
    rng = np.random.default_rng(0)
    d, s, p = step(rng.normal(size=(2, 2560, 2)).astype(np.float32))
    assert d.shape == (2, 254) and s.shape == (2, 254)


def test_wideband_device_rejects_single_channel():
    from dsdneo_tpu.engine.wideband import channelize_band_device
    with pytest.raises(ValueError):
        channelize_band_device(np.zeros(4800, np.complex64), fs=48000.0)
