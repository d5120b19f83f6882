"""IMA ADPCM wire format (ops.audio_wire + native/audio_codec.cpp):
device encode vs NumPy reference, native vs NumPy decode, speech-band
roundtrip SNR, and the pipeline-level adpcm path."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)


def _speech_like(n: int, streams: int = 4, seed: int = 7) -> np.ndarray:
    """Synthetic speech stand-in: harmonic stack with pitch/amplitude
    modulation + breath noise, peak-normalized like the pipelines'
    post-scale PCM."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 8000.0
    out = np.zeros((streams, n), dtype=np.float32)
    for s in range(streams):
        f0 = 90.0 + 60.0 * rng.random() + 8.0 * np.sin(2 * np.pi * 2.3 * t)
        ph = 2 * np.pi * np.cumsum(f0) / 8000.0
        x = sum(np.sin(k * ph + rng.random() * 6.28) / k
                for k in range(1, 9))
        env = 0.3 + 0.7 * np.abs(np.sin(2 * np.pi * 1.7 * t + s))
        x = x * env + 0.02 * rng.standard_normal(n)
        out[s] = 0.6 * x / np.max(np.abs(x))
    return out.astype(np.float32)


def _encode_np(pcm: np.ndarray) -> np.ndarray:
    """NumPy reference IMA encoder (mirrors adpcm_compress)."""
    from dsdneo_tpu.ops.audio_wire import INDEX_TABLE, STEP_TABLE
    S, T = pcm.shape
    x = np.round(pcm * 32767.0).astype(np.int64)
    pred = np.zeros(S, np.int64)
    idx = np.zeros(S, np.int64)
    codes = np.zeros((S, T), np.uint8)
    for t in range(T):
        step = STEP_TABLE[idx].astype(np.int64)
        diff = x[:, t] - pred
        sign = (diff < 0).astype(np.int64)
        ad = np.abs(diff)
        b2 = (ad >= step).astype(np.int64)
        ad -= b2 * step
        b1 = (ad >= step >> 1).astype(np.int64)
        ad -= b1 * (step >> 1)
        b0 = (ad >= step >> 2).astype(np.int64)
        vpdiff = (step >> 3) + b2 * step + b1 * (step >> 1) + b0 * (step >> 2)
        pred = np.clip(pred + np.where(sign == 1, -vpdiff, vpdiff),
                       -32768, 32767)
        code = (sign << 3) | (b2 << 2) | (b1 << 1) | b0
        idx = np.clip(idx + INDEX_TABLE[code], 0, 88)
        codes[:, t] = code
    return (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)


def test_device_encode_matches_numpy_reference():
    from dsdneo_tpu.ops.audio_wire import adpcm_compress
    pcm = _speech_like(1600, streams=3)
    dev = np.asarray(adpcm_compress(pcm))
    ref = _encode_np(pcm)
    np.testing.assert_array_equal(dev, ref)


def test_native_decode_matches_numpy_decode():
    from dsdneo_tpu.ops.audio_wire import adpcm_expand_np
    from dsdneo_tpu.runtime import native
    rng = np.random.default_rng(3)
    blob = rng.integers(0, 256, size=(5, 4000), dtype=np.uint8)
    out_native = native.adpcm_decode(blob)
    if out_native is None:
        pytest.skip("native library unavailable")
    np.testing.assert_allclose(out_native, adpcm_expand_np(blob),
                               rtol=0, atol=1e-7)


def test_roundtrip_snr_speech_band():
    """Encode→decode SNR on the speech stand-in must clear 22 dB —
    the IMA/DVI-4 quality class (telephony ADPCM)."""
    from dsdneo_tpu.ops.audio_wire import adpcm_compress, adpcm_expand
    pcm = _speech_like(16000, streams=4)
    out = adpcm_expand(np.asarray(adpcm_compress(pcm)))
    err = out - pcm
    snr = 10 * np.log10(np.sum(pcm ** 2) / np.sum(err ** 2))
    assert snr > 22.0, snr


def test_wire_expand_dispatch():
    from dsdneo_tpu.ops.audio_wire import adpcm_compress, wire_expand
    pcm = _speech_like(3200, streams=2)
    a = np.asarray(adpcm_compress(pcm))
    out = wire_expand(a, "adpcm", 2)
    assert out.shape == pcm.shape and out.dtype == np.float32
    f16 = wire_expand(pcm.astype(np.float16), "f16", 2)
    assert f16.dtype == np.float32


def test_voicebatch_adpcm_path_parity():
    """BatchedP25VoicePipeline(pcm_fmt='adpcm') on the real fixture:
    the wire-compressed audio stays close to the f16 path."""
    import os
    fx = "/root/reference/tests/fixtures/iq/p25p1_c4fm_vc.iq.json"
    if not os.path.exists(fx):
        pytest.skip("reference fixtures unavailable")
    from dsdneo_tpu.engine.voicebatch import BatchedP25VoicePipeline
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(fx)
    fs = float(meta.sample_rate_hz)
    iq = np.stack([samples.real, samples.imag],
                  axis=-1).astype(np.float32)[None]
    ref = BatchedP25VoicePipeline(1, fs=fs, pcm_fmt="f16").decode_block(iq)
    adp = BatchedP25VoicePipeline(1, fs=fs, pcm_fmt="adpcm").decode_block(iq)
    assert adp.shape == ref.shape
    # the f16 path returns unscaled synthesis; the wire formats carry
    # the 0.02-scaled clip (see vocoder.device / engine tails)
    ref = np.clip(ref * 0.02, -1.0, 1.0)
    err = adp - ref
    denom = float(np.sum(ref ** 2))
    assert denom > 0
    snr = 10 * np.log10(denom / max(float(np.sum(err ** 2)), 1e-12))
    # measured 15.2 dB on the off-air fixture (IMA 4-bit on harmonic
    # synthesis content; re-measured after the windowed O&M timing fix
    # shifted the recovered tau to the live windows' value and slightly
    # changed the synthesized waveform — frame count and golden field
    # parity unchanged); the bar guards regressions, not telephony spec
    assert snr > 14.0, snr
