"""Batched X2-TDMA voice pipeline (engine.x2batch)."""

import numpy as np


def test_x2_batched_bits_exact():
    """Device superframe gather + AMBE ECC recovers the generator's
    exact parameter bits on the synthetic 2-slot X2 stream."""
    from dsdneo_tpu.engine.x2batch import (BatchedX2VoicePipeline,
                                           synth_x2_voice_stream)
    from dsdneo_tpu.engine.dmrbatch import _sf_frame_offsets
    from dsdneo_tpu.fec.device import ambe_ecc_batch
    samples, dib, bits49 = synth_x2_voice_stream(n_superframes=4, seed=7)
    iq = np.stack([samples.real, samples.imag],
                  axis=-1).astype(np.float32)[None]
    pipe = BatchedX2VoicePipeline(1, fs=48000.0)
    dibits_dev, idx, vq, dq, eq, n_sym = pipe.frontend_sync_device(iq)
    ac, at, ai, fch, forder = pipe.pick_superframes(idx, vq, dq, eq, n_sym)
    assert ac.size >= 5, f"accepted {ac.size} superframes"
    recovered = np.asarray(dibits_dev)[0]
    offs = _sf_frame_offsets()
    matched = 0
    for t in at:
        dd = recovered[np.clip(int(t) + offs, 0, recovered.size - 1)]
        b72 = np.zeros((18, 72), np.uint8)
        b72[:, 0::2] = (dd >> 1) & 1
        b72[:, 1::2] = dd & 1
        out, errs = (np.asarray(x) for x in ambe_ecc_batch(b72))
        for slot in (0, 1):
            for sf in range(4):
                want = bits49[slot, 18 * sf:18 * (sf + 1)]
                n_exact = sum(np.array_equal(out[i], want[i])
                              for i in range(18))
                if n_exact >= 12:
                    matched += 1
    assert matched >= ac.size - 2, f"{matched}/{ac.size} superframes"


def test_x2_batched_vs_serial_decoder():
    """Serial x2tdma decoder (independent walk) decodes the same
    synthetic stream's voice — cross-validates generator geometry."""
    from dsdneo_tpu.engine.decoder import decode_samples
    from dsdneo_tpu.engine.x2batch import synth_x2_voice_stream
    samples, _d, _b = synth_x2_voice_stream(n_superframes=3, seed=2)
    ctx = decode_samples(samples, "x2tdma", fs=48000.0)
    text = "\n".join(e.line for e in ctx.events)
    assert "X2-TDMA" in text and "VC" in text
    assert ctx.audio and sum(len(np.concatenate(v))
                             for v in ctx.audio.values()) > 0


def test_x2_batched_pcm():
    from dsdneo_tpu.engine.x2batch import (BatchedX2VoicePipeline,
                                           synth_x2_voice_stream)
    samples, _d, _b = synth_x2_voice_stream(n_superframes=3, seed=5)
    iq = np.stack([samples.real, samples.imag],
                  axis=-1).astype(np.float32)[None]
    pipe = BatchedX2VoicePipeline(1, fs=48000.0)
    pcm = pipe.decode_block(iq)
    assert pcm.shape[1] % 160 == 0 and pcm.shape[1] > 0
    assert 0 < np.abs(pcm).max() <= 1.0
