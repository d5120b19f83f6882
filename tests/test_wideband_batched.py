"""Wideband channelizer → batched voice chain, device-resident
(BASELINE config "wideband polyphase-channelizer N-channel mode")."""

import os

import numpy as np
import pytest

FIXTURE = "/root/reference/tests/fixtures/iq/p25p1_c4fm_vc.iq.json"

pytestmark = [pytest.mark.slow,     # full tier (docs/testing.md)
              pytest.mark.skipif(not os.path.exists(FIXTURE),
                                reason="reference fixtures unavailable")]


def test_wideband_to_batched_voice():
    """The P25 voice fixture upconverted onto two channel slots of a
    768 kHz band decodes to voice PCM in exactly those channels."""
    from dsdneo_tpu.engine.wideband import decode_wideband_voice_batched
    from dsdneo_tpu.io import read_iq_capture

    meta, nb = read_iq_capture(FIXTURE)
    fs_nb = float(meta.sample_rate_hz)
    assert fs_nb == 48000.0
    n_ch = 16
    fs = n_ch * 48000.0
    up = int(fs // fs_nb)
    # upsample by zero-stuff + the channelizer's own filtering will
    # select the band; place copies at channel slots +2 and -5
    t = np.arange(len(nb) * up) / fs
    wide = np.zeros(len(nb) * up, dtype=np.complex64)
    x = np.repeat(nb, up)           # crude hold interpolation
    for k in (2, -5):
        wide += (x * np.exp(2j * np.pi * (k * 48000.0) * t)
                 ).astype(np.complex64)

    pcm, freqs = decode_wideband_voice_batched(wide, fs, n_ch)
    assert pcm.shape[0] == n_ch
    energy = np.abs(pcm).mean(axis=1)
    hot = set(np.where(energy > max(energy.max() * 0.2, 1e-6))[0])
    want = {int(np.argmin(np.abs(freqs - 2 * 48000.0))),
            int(np.argmin(np.abs(freqs - (-5) * 48000.0)))}
    assert want <= hot, (sorted(hot), sorted(want), energy.round(4))
    # quiet channels produce no voice
    quiet = [k for k in range(n_ch) if k not in want]
    assert energy[want.pop()] > 10 * max(energy[quiet].max(), 1e-9)
