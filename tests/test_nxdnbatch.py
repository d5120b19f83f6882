"""Batched NXDN48 voice pipeline vs the event decoder on the real
fixture (BASELINE config "NXDN48 + dPMR narrowband")."""

import os

import numpy as np
import pytest

FIXTURE = "/root/reference/tests/fixtures/iq/nxdn48.iq.json"

pytestmark = [pytest.mark.slow,     # full tier (docs/testing.md)
              pytest.mark.skipif(not os.path.exists(FIXTURE),
                                reason="reference fixtures unavailable")]


def _planes(C):
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(FIXTURE)
    iq1 = np.stack([samples.real, samples.imag], axis=-1).astype(np.float32)
    return float(meta.sample_rate_hz), np.broadcast_to(
        iq1[None], (C,) + iq1.shape).copy()


def test_nxdn_batched_matches_event_decoder():
    from dsdneo_tpu.engine.decoder import decode_capture
    from dsdneo_tpu.engine.nxdnbatch import BatchedNxdnVoicePipeline

    fs, iq = _planes(2)
    pipe = BatchedNxdnVoicePipeline(2, fs=fs)
    dibits_dev, idx, vq, dq, lich, n_sym = pipe.frontend_sync_device(iq)
    ac, at, ai, fch, forder = pipe.pick_frames(idx, vq, dq, lich, n_sym)
    n_ch0 = int(np.sum(ac == 0))

    ctx = decode_capture(FIXTURE, "nxdn48")
    ev_voice = sum(1 for e in ctx.events
                   if "Voice" in e.line and "V" in e.line)
    # the batched path accepts only parity-valid full-voice frames; the
    # event decoder sees at least as many voice-ish frames
    assert n_ch0 >= 3, f"only {n_ch0} full-voice frames accepted"
    assert n_ch0 <= ev_voice + 2

    pcm = pipe.decode_block(iq)
    assert pcm.shape[0] == 2
    assert pcm.shape[1] == (int(forder.max()) + 1 + 31) // 32 * 32 * 160 \
        or pcm.shape[1] > 0
    assert 0 < np.abs(pcm[0]).max() <= 1.0


def test_nxdn_batched_frame_bits_match_host():
    """Device gather + descramble + AMBE ECC equals the host decoder's
    49-bit frames at the same positions."""
    from dsdneo_tpu.engine.nxdnbatch import (BatchedNxdnVoicePipeline,
                                             _voice_tables)
    from dsdneo_tpu.fec.device import ambe_ecc_batch
    from dsdneo_tpu.protocol.dmr.ambe_frame import decode_ambe_ecc

    fs, iq = _planes(1)
    pipe = BatchedNxdnVoicePipeline(1, fs=fs)
    dibits_dev, idx, vq, dq, lich, n_sym = pipe.frontend_sync_device(iq)
    ac, at, ai, fch, forder = pipe.pick_frames(idx, vq, dq, lich, n_sym)
    assert ac.size >= 3
    rec = np.asarray(dibits_dev)[0]
    offs, flips = _voice_tables()
    for t, inv in zip(at, ai):
        dd = rec[np.clip(int(t) + offs, 0, rec.size - 1)]
        dd = dd ^ (int(inv) * 2) ^ (flips * 2)
        dd = dd.reshape(4, 36)
        b72 = np.zeros((4, 72), np.uint8)
        b72[:, 0::2] = (dd >> 1) & 1
        b72[:, 1::2] = dd & 1
        dev_bits, dev_errs = (np.asarray(x) for x in ambe_ecc_batch(b72))
        for k in range(4):
            hb, he = decode_ambe_ecc(b72[k])
            assert np.array_equal(dev_bits[k], hb)
            assert dev_errs[k] == he


def test_nxdn96_batched_voice_fixture():
    """NXDN96 (9600 bps) through the same batched pipeline: the real
    nxdn96 fixture's full-voice frames (LICH 0x56) decode to non-silent
    PCM with the event decoder's frame census as the bound."""
    import numpy as np
    from dsdneo_tpu.engine.decoder import decode_capture
    from dsdneo_tpu.engine.nxdnbatch import BatchedNxdnVoicePipeline
    from dsdneo_tpu.io import read_iq_capture
    fx = "/root/reference/tests/fixtures/iq/nxdn96.iq.json"
    meta, samples = read_iq_capture(fx)
    iq = np.stack([samples.real, samples.imag],
                  axis=-1).astype(np.float32)[None]
    pipe = BatchedNxdnVoicePipeline(1, fs=float(meta.sample_rate_hz),
                                    mode="nxdn96")
    dibits_dev, idx, vq, dq, lich, n_sym = pipe.frontend_sync_device(iq)
    ac, at, ai, fch, forder = pipe.pick_frames(idx, vq, dq, lich, n_sym)
    ctx = decode_capture(fx, "nxdn96")
    n_voice_events = sum(1 for e in ctx.events if "RDCH Voice" in e.line)
    assert ac.size >= max(n_voice_events - 2, 1), (
        f"batched accepted {ac.size} vs serial {n_voice_events}")
    assert ac.size <= n_voice_events + 2
    pcm = pipe.decode_block(iq)
    assert pcm.shape[1] > 0 and np.abs(pcm).max() > 1e-4
