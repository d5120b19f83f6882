"""Live playback parity: 8k→48k polyphase upsample + 2-slot stereo mix
(reference src/core/audio/dsd_audio.c:798 upsample path + dsd_audio2.c
playSynthesizedVoiceSS stereo variants)."""

import numpy as np

from dsdneo_tpu.io.audio_out import (StreamingUpsampler, UpmixSink,
                                     make_sink)


class _CaptureSink:
    def __init__(self):
        self.frames = []
        self.closed = False

    def write_frames(self, frames):
        self.frames.append(np.asarray(frames, np.float32))

    def close(self):
        self.closed = True

    @property
    def all(self):
        return (np.concatenate(self.frames) if self.frames
                else np.zeros((0, 2), np.float32))


def test_streaming_upsampler_matches_one_shot():
    """Chunked streaming output must equal the one-shot dsp.resampler
    path exactly (shared polyphase bank, carried history)."""
    from dsdneo_tpu.dsp.resampler import resample
    rng = np.random.default_rng(3)
    x = rng.normal(size=1600).astype(np.float32)
    one = np.asarray(resample(x, 8000, 48000))
    up = StreamingUpsampler()
    chunks = [up(x[a:b]) for a, b in ((0, 160), (160, 480), (480, 481),
                                      (481, 1600))]
    np.testing.assert_allclose(np.concatenate(chunks), one, atol=1e-6)


def test_upsampler_tone_spectrum():
    """A 1 kHz tone at 8 kHz upsamples to a clean 1 kHz tone at 48 kHz
    (image rejection of the polyphase lowpass)."""
    t = np.arange(8000)
    x = np.sin(2 * np.pi * 1000.0 * t / 8000.0).astype(np.float32)
    y = StreamingUpsampler()(x)
    assert y.size == 6 * x.size
    spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
    f = np.fft.rfftfreq(y.size, 1 / 48000.0)
    peak = f[np.argmax(spec)]
    assert abs(peak - 1000.0) < 5.0
    # strongest image (5 kHz / 7 kHz region) at least 40 dB down
    img = spec[(f > 4000)].max()
    assert img < spec.max() * 0.01


def test_upmix_pairs_slots_left_right():
    cap = _CaptureSink()
    mix = UpmixSink(cap, skew=960)
    a = np.ones(160, np.float32) * 0.25
    b = np.ones(160, np.float32) * -0.25
    mix.write(0, a)
    mix.write(1, b)
    mix.close()
    out = cap.all
    assert cap.closed
    assert out.shape == (960, 2)   # 160 @8k → 960 @48k, slots paired
    # paired region: slot 0 rides left, slot 1 right
    n = 960
    assert np.abs(out[:n, 0]).max() > 0.1
    assert np.abs(out[:n, 1]).max() > 0.1
    # energy signs follow the slots
    assert out[100:n, 0].mean() > 0
    assert out[100:n, 1].mean() < 0


def test_upmix_skew_flushes_lone_slot():
    """A slot running ahead flushes against silence after the skew
    window — bounded latency on single-slot (non-TDMA) audio."""
    cap = _CaptureSink()
    mix = UpmixSink(cap, skew=960)
    mix.write(0, np.ones(480, np.float32))     # 2880 out > 960 skew
    out = cap.all
    assert out.shape[0] == 2880 - 960          # excess flushed
    assert np.abs(out[:, 1]).max() == 0.0      # right stays silent
    mix.close()
    assert cap.all.shape[0] == 2880            # close flushes the rest


def test_make_sink_live_specs_upmix(monkeypatch):
    """play → UpmixSink(PlayerSink@48k stereo); play8 keeps 8k mono."""
    import dsdneo_tpu.io.audio_out as ao
    made = {}

    class _FakePlayer:
        def __init__(self, cmd="", rate=8000, channels=1):
            made["args"] = (rate, channels)

        def write_frames(self, f):
            pass

        def write(self, slot, pcm):
            pass

        def close(self):
            pass

    monkeypatch.setattr(ao, "PlayerSink", _FakePlayer)
    s = ao.make_sink("play")
    assert isinstance(s, UpmixSink)
    assert made["args"] == (48000, 2)
    s8 = ao.make_sink("play8")
    assert isinstance(s8, _FakePlayer)
