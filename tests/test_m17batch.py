"""Batched M17 stream-voice pipeline (engine.m17batch) vs the serial
decoder on the real m17 fixture."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)

FX = "/root/reference/tests/fixtures/iq/m17.iq.json"


def _fixture():
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(FX)
    iq = np.stack([samples.real, samples.imag],
                  axis=-1).astype(np.float32)
    return float(meta.sample_rate_hz), samples, iq


def test_m17_batched_voice_payloads_match_serial():
    """Every Codec2 voice payload the serial decoder extracts (FN +
    128 bits) is recovered bit-identically by the device pipeline."""
    from dsdneo_tpu.engine.decoder import decode_samples
    from dsdneo_tpu.engine.m17batch import BatchedM17VoicePipeline
    from dsdneo_tpu.protocol.m17.decoder import M17Decoder
    fs, samples, iq = _fixture()

    host_voice = []
    orig = M17Decoder._voice

    def spy(self, v128, fn, ctx):
        host_voice.append((fn, np.packbits(v128.astype(np.uint8)).tobytes()))
        return ""

    M17Decoder._voice = spy
    try:
        decode_samples(samples, "m17", fs=fs)
    finally:
        M17Decoder._voice = orig
    assert len(host_voice) >= 70

    pipe = BatchedM17VoicePipeline(1, fs=fs)
    ac, at, blob = pipe.decode_block_records(iq[None])
    batch = {(int(b[0]) << 8 | int(b[1])) & 0x7FFF: b[2:18].tobytes()
             for b in blob if b[24] <= 3}
    match = sum(1 for fn, v in host_voice if batch.get(fn) == v)
    assert match == len(host_voice), (
        f"batched matched {match}/{len(host_voice)} voice payloads")
    # the batch pipeline must not LOSE frames vs the serial path
    assert len(batch) >= len(host_voice)


def test_m17_batched_events_and_lsf_assembly():
    """Stream events carry monotonic FNs, and the LICH chunk assembly
    recovers the fixture's link data (CRC-valid LSF: N0CALL →
    BROADCAST, Voice 3200)."""
    from dsdneo_tpu.engine.m17batch import BatchedM17VoicePipeline
    fs, _samples, iq = _fixture()
    pipe = BatchedM17VoicePipeline(1, fs=fs)
    n = pipe.decode_block_events(iq[None])
    assert n >= 70
    ev = pipe.events(0)
    fns = [e.fields["fn"] for e in ev if "fn" in e.fields]
    assert fns == sorted(fns) and len(set(fns)) == len(fns)
    details = [e.line for e in ev if "DST:" in e.line]
    assert details and all(
        "DST: BROADCAST" in d and "SRC: N0CALL" in d
        and "Voice (3200bps)" in d for d in details)


def test_m17_batched_synthesis_and_monitor_gate():
    """Monitored channels synthesize Codec2 PCM (20 ms per half-frame);
    unmonitored channels decode events but skip synthesis."""
    c2 = pytest.importorskip("dsdneo_tpu.vocoder.codec2")
    if not c2.available():
        pytest.skip("libcodec2 not present")
    from dsdneo_tpu.engine.m17batch import BatchedM17VoicePipeline
    fs, _samples, iq = _fixture()
    two = np.concatenate([iq[None], iq[None]], axis=0)
    pipe = BatchedM17VoicePipeline(2, fs=fs, monitor={1})
    n = pipe.decode_block_events(two)
    assert n >= 140
    assert pipe.pcm(0).size == 0
    pcm = pipe.pcm(1)
    ev1 = [e for e in pipe.events(1) if "fn" in e.fields]
    assert pcm.size == 320 * len(ev1)       # 2× 160 samples per frame
    assert np.isfinite(pcm).all() and 0.001 < np.abs(pcm).max() <= 1.0


def test_m17_fleet_voice_group():
    """M17 registers as a FleetMonitor voice mode: per-block PCM comes
    back [C, n] and per-channel events are reachable through the fleet."""
    from dsdneo_tpu.engine.fleet import FleetMonitor
    fs, _samples, iq = _fixture()
    fm = FleetMonitor(fs=fs)
    fm.assign("m17", 2, kind="voice")
    fm.decode_block(np.stack([iq, iq]))
    assert len(fm.events(0)) >= 70 and len(fm.events(1)) >= 70
    pcm = fm.groups[0].pcm
    assert pcm.shape[0] == 2 and pcm.shape[1] > 0
    assert all(r["state"] == "voice" for r in fm.channel_dicts())


def test_m17_batched_rejects_noise_channels():
    """A noise-only channel produces zero accepted frames (the LICH
    Golay gate kills junk sync hits the 8-dibit correlation passes)."""
    from dsdneo_tpu.engine.m17batch import BatchedM17VoicePipeline
    fs, _samples, iq = _fixture()
    rng = np.random.default_rng(7)
    noise = rng.normal(0, 0.3, iq.shape).astype(np.float32)
    two = np.stack([iq, noise])
    pipe = BatchedM17VoicePipeline(2, fs=fs)
    pipe.decode_block_events(two)
    assert len([e for e in pipe.events(0) if "fn" in e.fields]) >= 70
    assert len(pipe.events(1)) == 0
