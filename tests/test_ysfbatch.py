"""Batched YSF V/D2 voice pipeline (engine.ysfbatch) vs the serial
decoder on the real ysf fixture."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)

FX = "/root/reference/tests/fixtures/iq/ysf.iq.json"


def _fixture():
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(FX)
    iq = np.stack([samples.real, samples.imag],
                  axis=-1).astype(np.float32)
    return float(meta.sample_rate_hz), samples, iq


def test_ysf_batched_bits_match_serial_extraction():
    """The device V/D2 extraction (de-interleave + PN + majority vote)
    recovers the same 49-bit AMBE frames the serial decoder extracts,
    frame for frame, on every V/D2 frame of the fixture."""
    from dsdneo_tpu.engine.decoder import decode_samples
    from dsdneo_tpu.engine.ysfbatch import BatchedYsfVoicePipeline
    from dsdneo_tpu.vocoder import mbe as mbemod
    fs, samples, iq = _fixture()

    serial_frames = []
    orig = mbemod.decode_ambe_2450

    def spy(bits49):
        serial_frames.append(np.asarray(bits49).copy())
        return orig(bits49)

    # only V/D2 frames are comparable (V/D1 and VWFR extract through
    # different layouts the V/D2 pipeline does not cover)
    from dsdneo_tpu.protocol.ysf.decoder import YsfDecoder
    o1, o2 = YsfDecoder._voice_vd1, YsfDecoder._voice_fr
    mbemod.decode_ambe_2450 = spy
    YsfDecoder._voice_vd1 = lambda self, p, ctx: None
    YsfDecoder._voice_fr = lambda self, p, fn, ft, ctx: None
    try:
        ctx = decode_samples(samples, "ysf", fs=fs)
    finally:
        mbemod.decode_ambe_2450 = orig
        YsfDecoder._voice_vd1, YsfDecoder._voice_fr = o1, o2
    n_vd2 = sum(1 for e in ctx.events if "V/D2" in e.line
                and "CRC ERR" not in e.line)
    assert n_vd2 >= 5 and serial_frames

    pipe = BatchedYsfVoicePipeline(1, fs=fs)
    ambe, verr = pipe.decode_block_bits49(iq[None])
    assert ambe.shape[0] >= 5 * (n_vd2 - 1)
    # voice frames: low vote disagreement, and the batched set must
    # contain (nearly) every serially-extracted frame
    truth = {f.tobytes() for f in serial_frames}
    got = {ambe[i].tobytes() for i in range(ambe.shape[0])
           if verr[i] <= 5}
    inter = len(truth & got)
    assert inter >= 0.9 * len(truth), (
        f"batched matched {inter}/{len(truth)} serial AMBE frames")


def test_ysf_batched_pcm_and_vote_gate():
    """decode_block produces bounded non-silent PCM; the vote gate
    mutes the fixture's DCH/data frames rather than synthesizing
    garbage."""
    from dsdneo_tpu.engine.ysfbatch import BatchedYsfVoicePipeline
    fs, _samples, iq = _fixture()
    C = 2
    iqb = np.broadcast_to(iq[None], (C,) + iq.shape).copy()
    pipe = BatchedYsfVoicePipeline(C, fs=fs)
    pcm = pipe.decode_block(iqb)
    assert pcm.shape[0] == C and pcm.shape[1] % 160 == 0
    assert 0 < np.abs(pcm).max() <= 1.0
    # identical inputs: identical voiced content per channel (unvoiced
    # noise phases are channel-local by design)
    assert np.abs(pcm[1]).max() > 1e-4


def test_ysf_batched_rejects_noise():
    from dsdneo_tpu.engine.ysfbatch import BatchedYsfVoicePipeline
    rng = np.random.default_rng(0)
    iq = rng.normal(size=(1, 48000, 2)).astype(np.float32)
    pipe = BatchedYsfVoicePipeline(1, fs=48000.0)
    pcm = pipe.decode_block(iq)
    # noise: either no sync hits at all, or vote-gated to silence
    assert pcm.shape[1] == 0 or np.abs(pcm).max() < 1e-6
