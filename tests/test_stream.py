"""Streaming decode: chunked push must reproduce the one-shot decode."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)

FIXDIR = "/root/reference/tests/fixtures/iq"


@pytest.mark.parametrize("fixture,mode,chunk_s", [
    ("p25p1_c4fm_cc", "p25p1", 0.25),
    ("dmr_voice", "dmr", 0.2),
    ("m17", "m17", 0.33),
])
def test_stream_matches_oneshot(fixture, mode, chunk_s):
    path = os.path.join(FIXDIR, f"{fixture}.iq.json")
    if not os.path.exists(path):
        pytest.skip("reference fixtures unavailable")
    from dsdneo_tpu.engine import decode_capture
    from dsdneo_tpu.engine.stream import StreamDecoder
    from dsdneo_tpu.io import read_iq_capture

    meta, samples = read_iq_capture(path)
    ref = decode_capture(path, mode)
    ref_lines = [e.line for e in ref.events]

    sd = StreamDecoder(mode, fs=float(meta.sample_rate_hz))
    chunk = int(meta.sample_rate_hz * chunk_s)
    for i in range(0, len(samples), chunk):
        sd.push(samples[i:i + chunk])
    sd.flush()
    got_lines = [e.line for e in sd.ctx.events]

    # the streamed decode must recover at least 90% of the one-shot
    # event lines (block-boundary timing estimates may differ slightly)
    ref_set = {}
    for ln in ref_lines:
        ref_set[ln] = ref_set.get(ln, 0) + 1
    matched = 0
    for ln in got_lines:
        if ref_set.get(ln, 0) > 0:
            ref_set[ln] -= 1
            matched += 1
    assert len(ref_lines) > 0
    assert matched >= 0.9 * len(ref_lines), (
        f"streamed {len(got_lines)} lines matched {matched} of "
        f"{len(ref_lines)} one-shot lines")


def test_live_engine_ring_decode_and_retune(tmp_path):
    """Producer → C++ ring → LiveEngine streaming decode, with a UDP
    retune mid-stream journalled into the capture writer."""
    import socket
    import threading
    import time

    import numpy as np

    from dsdneo_tpu.engine.live import LiveEngine
    from dsdneo_tpu.io import read_iq_capture
    from dsdneo_tpu.io.iq import IqCaptureWriter, IqMetadata

    path = os.path.join(FIXDIR, "m17.iq.json")
    if not os.path.exists(path):
        pytest.skip("reference fixtures unavailable")
    meta, samples = read_iq_capture(path)

    cap = IqCaptureWriter(str(tmp_path / "live.iq"),
                          IqMetadata(sample_format="cf32"))
    events = []
    eng = LiveEngine("m17", fs=float(meta.sample_rate_hz), block_s=0.25,
                     capture_writer=cap, control_port=45321,
                     on_event=events.append)
    eng.start()

    # producer: feed the fixture as CU8
    cu8 = np.empty(2 * len(samples), dtype=np.uint8)
    cu8[0::2] = np.clip(samples.real * 127.5 + 127.5, 0, 255)
    cu8[1::2] = np.clip(samples.imag * 127.5 + 127.5, 0, 255)
    half = len(cu8) // 2
    eng.feed_cu8(cu8[:half].tobytes())
    time.sleep(1.5)
    # mid-stream retune via the UDP control plane
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.settimeout(2)
    sock.sendto(b"TUNE 433475000", ("127.0.0.1", 45321))
    resp, _ = sock.recvfrom(16)
    assert resp.strip() == b"OK"
    eng.feed_cu8(cu8[half:].tobytes())
    time.sleep(1.5)
    eng.stop()
    cap.close()

    assert eng.retunes == 1
    text = "\n".join(e.line for e in events)
    assert "M17" in text
    # the capture journal recorded the retune
    meta2, _ = read_iq_capture(str(tmp_path / "live.iq"))
    assert meta2.contains_retunes
    assert meta2.extra["events"][0]["center_frequency_hz"] == 433475000


@pytest.mark.parametrize("fixture,mode", [
    ("p25p1_c4fm_cc", "p25p1"),
    ("p25p2_cc", "p25p2"),
    ("dmr_voice", "dmr"),
    ("nxdn48", "nxdn48"),
    ("nxdn96", "nxdn96"),
    ("ysf", "ysf"),
    ("dpmr", "dpmr"),
    ("m17", "m17"),
    ("dstar", "dstar"),
    ("edacs", "edacs"),
])
def test_stream_boundary_sweep(fixture, mode):
    """Adversarial block boundaries: splitting the capture at ANY
    offsets/chunk sizes must produce EXACTLY the same event sequence
    (the stream processes canonical absolute segments, so decode
    decisions are split-invariant).  The streamed result must also
    match ≥90% of the one-shot global-window decode (windowed timing
    estimates may flip marginal bits — a quality guard, not a boundary
    property)."""
    path = os.path.join(FIXDIR, f"{fixture}.iq.json")
    if not os.path.exists(path):
        pytest.skip("reference fixtures unavailable")
    from dsdneo_tpu.engine import decode_capture
    from dsdneo_tpu.engine.stream import StreamDecoder
    from dsdneo_tpu.io import read_iq_capture

    meta, samples = read_iq_capture(path)
    fs = float(meta.sample_rate_hz)

    def run(first, chunk):
        sd = StreamDecoder(mode, fs=fs)
        sd.push(samples[:first])
        for i in range(first, len(samples), chunk):
            sd.push(samples[i:i + chunk])
        sd.flush()
        return [e.line for e in sd.ctx.events]

    base = run(len(samples), len(samples))       # one giant push
    assert base, "stream decoded nothing"
    chunk = int(fs * 0.2)
    for frac, ch in [(0.13, chunk), (0.31, chunk), (0.5, int(fs * 0.41)),
                     (0.77, int(fs * 0.033)), (0.93, chunk)]:
        got = run(int(chunk * frac) or chunk, ch)
        assert got == base, (
            f"split at frac={frac} chunk={ch} changed the decode: "
            f"{len(got)} vs {len(base)} lines")

    # quality guard vs the one-shot full-capture decode
    ref_lines = [e.line for e in decode_capture(path, mode).events]
    counts = {}
    for ln in ref_lines:
        counts[ln] = counts.get(ln, 0) + 1
    matched = 0
    for ln in base:
        if counts.get(ln, 0) > 0:
            counts[ln] -= 1
            matched += 1
    assert len(ref_lines) - matched <= max(1, 0.12 * len(ref_lines)), (
        f"stream matched {matched}/{len(ref_lines)} one-shot lines")
