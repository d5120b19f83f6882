"""IO tests: iq captures, symbol captures (incl. reference interop),
network PCM loopback, rigctl/udp control protocol."""

import os
import socket
import threading
import time

import numpy as np
import pytest


def test_iq_capture_roundtrip(tmp_path):
    from dsdneo_tpu.io import IqMetadata, read_iq_capture, write_iq_capture
    rng = np.random.default_rng(0)
    x = (rng.normal(size=1000) + 1j * rng.normal(size=1000)).astype(np.complex64) * 0.2
    x = np.clip(x.real, -0.99, 0.99) + 1j * np.clip(x.imag, -0.99, 0.99)
    x = x.astype(np.complex64)
    p = tmp_path / "test.iq"
    write_iq_capture(str(p), x, IqMetadata(sample_format="cf32", sample_rate_hz=48000))
    meta, back = read_iq_capture(str(p) + ".json")
    assert meta.sample_rate_hz == 48000
    np.testing.assert_allclose(back, x, atol=1e-6)
    # cu8 quantized roundtrip
    p2 = tmp_path / "t2.iq"
    write_iq_capture(str(p2), x, IqMetadata(sample_format="cu8"))
    _, back2 = read_iq_capture(str(p2))
    assert np.abs(back2 - x).max() < 0.01


def test_symbol_capture_roundtrip(tmp_path):
    from dsdneo_tpu.io.symbol_capture import (SymbolCapture,
                                              read_symbol_capture,
                                              write_symbol_capture)
    rng = np.random.default_rng(1)
    dibits = rng.integers(0, 4, 500).astype(np.uint8)
    rel = rng.integers(0, 256, 500).astype(np.uint8)
    p = tmp_path / "syms.bin"
    write_symbol_capture(str(p), SymbolCapture(dibits, rel), soft=True)
    cap = read_symbol_capture(str(p))
    np.testing.assert_array_equal(cap.dibits, dibits)
    np.testing.assert_array_equal(cap.reliability, rel)
    # legacy
    p2 = tmp_path / "syms2.bin"
    write_symbol_capture(str(p2), SymbolCapture(dibits), soft=False)
    cap2 = read_symbol_capture(str(p2))
    np.testing.assert_array_equal(cap2.dibits, dibits)


def test_symbol_capture_reads_reference_format():
    """Interop: parse a checked-in symbol capture written by the
    reference decoder itself (oracle build, `-c` on the dmr_voice
    fixture: tools/refbuild/build_oracle.sh then
    `dsd-neo -fs --iq-replay dmr_voice.iq.json -c <file>`)."""
    from dsdneo_tpu.io.symbol_capture import read_symbol_capture
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "oracle_dmr_syms.bin")
    cap = read_symbol_capture(path)
    assert cap.dibits.size > 9000
    assert set(np.unique(cap.dibits)) <= {0, 1, 2, 3}
    assert cap.reliability is not None
    assert cap.reliability.size == cap.dibits.size


def test_udp_pcm_loopback():
    from dsdneo_tpu.io.net import UdpAudioOutput, UdpPcmInput
    inp = UdpPcmInput(port=0)
    port = inp.sock.getsockname()[1]
    out = UdpAudioOutput(port=port, chunk=160)
    pcm = (np.sin(np.arange(480) * 0.1) * 10000).astype(np.int16)
    out.write(pcm)
    got = inp.read(480, timeout=2.0)
    assert got is not None
    np.testing.assert_array_equal(got, pcm)
    inp.close()
    out.close()


def test_udp_control_tune():
    from dsdneo_tpu.io.net import UdpControlServer
    tuned = []
    srv = UdpControlServer(on_tune=tuned.append, port=0)
    port = srv.sock.getsockname()[1]
    c = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    c.settimeout(2.0)
    c.sendto(b"TUNE 851012500", ("127.0.0.1", port))
    resp, _ = c.recvfrom(16)
    assert resp.strip() == b"OK"
    assert tuned == [851012500.0]
    srv.close()
    c.close()


def test_rigctl_protocol():
    from dsdneo_tpu.io.net import RigctlClient
    # fake rigctld
    lsock = socket.socket()
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]
    state = {"freq": 0}

    def server():
        conn, _ = lsock.accept()
        f = conn.makefile("rwb")
        for line in f:
            parts = line.decode().split()
            if not parts:
                continue
            if parts[0] == "F":
                state["freq"] = int(parts[1])
                f.write(b"RPRT 0\n")
            elif parts[0] == "f":
                f.write(str(state["freq"]).encode() + b"\n")
            f.flush()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    cli = RigctlClient(port=port)
    assert cli.set_freq(852_000_000)
    assert state["freq"] == 852_000_000
    assert cli.get_freq() == 852_000_000
    cli.close()
    lsock.close()


def test_iq_capture_writer_events(tmp_path):
    """Streaming capture writer with retune journal → replay segments."""
    import numpy as np
    from dsdneo_tpu.io.iq import (IqCaptureWriter, IqMetadata, read_iq_capture,
                                  read_iq_events, replay_segments)
    rng = np.random.default_rng(0)
    a = (rng.normal(size=1000) + 1j * rng.normal(size=1000)).astype(np.complex64) * 0.1
    b = (rng.normal(size=500) + 1j * rng.normal(size=500)).astype(np.complex64) * 0.1
    path = str(tmp_path / "cap.iq")
    with IqCaptureWriter(path, IqMetadata(sample_format="cf32",
                                          center_frequency_hz=851_000_000)) as w:
        w.submit(a)
        w.record_event("retune", center_frequency_hz=852_500_000,
                       reason="trunk grant")
        w.submit(b)
        w.record_event("mute", duration_bytes=64)
    meta, samples = read_iq_capture(path)
    assert meta.contains_retunes
    assert meta.extra["capture_retune_count"] == 1
    assert len(samples) == 1500
    evs = read_iq_events(meta)
    assert [e.kind for e in evs] == ["retune", "mute"]
    segs = list(replay_segments(meta, samples))
    assert len(segs) == 2
    assert segs[0][0] == 851_000_000 and len(segs[0][1]) == 1000
    assert segs[1][0] == 852_500_000 and len(segs[1][1]) == 500
    np.testing.assert_allclose(segs[1][1], b, atol=1e-6)


def test_iq_capture_writer_max_bytes(tmp_path):
    import numpy as np
    from dsdneo_tpu.io.iq import IqCaptureWriter, IqMetadata
    x = np.ones(100, dtype=np.complex64) * 0.5
    path = str(tmp_path / "cap2.iq")
    with IqCaptureWriter(path, IqMetadata(sample_format="cf32"),
                         max_bytes=400) as w:
        assert w.submit(x[:50]) == 400
        assert w.submit(x[50:]) == 0      # over cap → dropped
        assert w.drops == 50


def test_cli_group_policy_mutes_blocked_tg(tmp_path):
    """-G group.csv: a blocked talkgroup's voice is muted (reference
    talkgroup_policy + group list import)."""
    import subprocess
    import sys

    fx = "/root/reference/tests/fixtures/iq/p25p1_c4fm_vc.iq.json"
    # the fixture's voice call is Group 1
    allow_csv = tmp_path / "allow.csv"
    allow_csv.write_text("TG,Mode,Label\n1,A,Allowed\n")
    block_csv = tmp_path / "block.csv"
    block_csv.write_text("TG,Mode,Label\n1,B,Blocked\n")

    from dsdneo_tpu import cli
    wav_a = tmp_path / "a.wav"
    rc = cli.main(["--frontend", "none", "-f1", "--iq-replay", fx,
                   "-o", f"wav:{wav_a}", "-G", str(allow_csv)])
    assert rc == 0 and wav_a.exists()

    wav_b = tmp_path / "b.wav"
    rc = cli.main(["--frontend", "none", "-f1", "--iq-replay", fx,
                   "-o", f"wav:{wav_b}", "-G", str(block_csv)])
    assert rc == 0
    assert not wav_b.exists()       # all audio muted → nothing written


def test_serial_control_pty():
    """Serial control against a pty pair: raw mode set, resume-scan
    command sequence delivered (reference dsd_serial.c)."""
    import os
    import pty

    from dsdneo_tpu.io.serial_control import (RESUME_PACKET, RESUME_TEXT,
                                              SerialControl)
    master, slave = pty.openpty()
    dev = os.ttyname(slave)
    ctl = SerialControl(dev, baud=9600)
    ctl.resume_scan()
    got = os.read(master, 64)
    assert RESUME_TEXT in got and RESUME_PACKET in got
    ctl.close()
    os.close(master)
    os.close(slave)


def test_tcp_quality_watchdog():
    """Reconnect watchdog: grace period suppresses, then a starved 3 s
    window below 25% of the expected CU8 rate fires (reference
    tcp_quality_metrics.cpp thresholds)."""
    from dsdneo_tpu.io.net import TcpQualityWatchdog
    clock = [0.0]
    wd = TcpQualityWatchdog(sample_rate=48000, now_fn=lambda: clock[0])
    # healthy stream inside the grace period: never fires
    clock[0] = 3.5
    assert not wd.record_recv(10)          # starved but within grace
    # past grace: healthy window does not fire
    clock[0] = 6.0
    wd.record_recv(int(48000 * 2 * 2.5))
    clock[0] = 9.5
    assert not wd.record_recv(int(48000 * 2 * 1.0))
    # starved window fires and latches
    clock[0] = 13.0
    assert wd.record_recv(100)
    assert wd.latched


def test_rdio_uploader_multipart(tmp_path):
    """Rdio HTTP export: multipart POST with key/system/audio/meta parts
    against a local HTTP server; failed endpoints retry then count as
    failed without blocking (reference rdio_export.c contract)."""
    import http.server
    import threading

    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            received.append((self.headers.get("Content-Type", ""), body))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()

    from dsdneo_tpu.io.rdio import RdioUploader, write_rdio_meta
    wav = tmp_path / "call.wav"
    wav.write_bytes(b"RIFF" + b"\x00" * 60)
    meta = tmp_path / "call.json"
    write_rdio_meta(str(meta), start_time=100.0, stop_time=105.0,
                    talkgroup=123, source=42, freq_hz=851_000_000,
                    system="sys1", talkgroup_tag="Fire")
    up = RdioUploader(f"http://127.0.0.1:{port}/api/call-upload",
                      api_key="sekrit", system="sys1")
    assert up.submit(str(wav), str(meta))
    up.close()
    srv.shutdown()
    assert up.uploaded == 1 and up.failed == 0
    ctype, body = received[0]
    assert "multipart/form-data" in ctype
    assert b'name="key"' in body and b"sekrit" in body
    assert b'name="audio"' in body and b"RIFF" in body
    assert b'name="meta"' in body and b'"talkgroup": 123' in body

    # unreachable endpoint → failed, not hung
    up2 = RdioUploader("http://127.0.0.1:1/api", api_key="k", system="s",
                       retries=0, timeout_s=0.5)
    up2.submit(str(wav), str(meta))
    up2.close()
    assert up2.failed == 1


def test_audio_sinks(tmp_path):
    import numpy as np
    from dsdneo_tpu.io.audio_files import read_wav
    from dsdneo_tpu.io.audio_out import make_sink

    tone0 = (0.5 * np.sin(2 * np.pi * 400 * np.arange(800) / 8000)
             ).astype(np.float32)
    tone1 = (0.5 * np.sin(2 * np.pi * 900 * np.arange(640) / 8000)
             ).astype(np.float32)

    # stereo: slot 0 left, slot 1 right (2-slot TDMA mix)
    p = tmp_path / "st.wav"
    s = make_sink(f"wav2:{p}")
    s.write(0, tone0)
    s.write(1, tone1)
    s.close()
    import wave
    with wave.open(str(p)) as w:
        assert w.getnchannels() == 2
        raw = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    st = raw.reshape(-1, 2).astype(np.float32) / 32767
    assert len(st) == 800
    np.testing.assert_allclose(st[:800, 0], tone0, atol=2e-4)
    np.testing.assert_allclose(st[:640, 1], tone1, atol=2e-4)
    assert not st[640:, 1].any()

    # pcm raw sink
    p2 = tmp_path / "a.pcm"
    s = make_sink(f"pcm:{p2}")
    s.write(0, tone0)
    s.close()
    assert p2.stat().st_size == 1600

    # null counts, unknown rejected
    n = make_sink("null")
    n.write(0, tone0)
    assert n.samples == 800
    assert make_sink("bogus:x") is None


def test_player_sink_pipes_pcm(tmp_path):
    """PlayerSink (the device-playback backend stand-in) pipes s16le
    into any stdin-reading command."""
    import numpy as np
    from dsdneo_tpu.io.audio_out import PlayerSink, make_sink
    out = tmp_path / "pcm.raw"
    s = PlayerSink(cmd=f"dd of={out} status=none")
    pcm = np.sin(np.linspace(0, 50, 1600)).astype(np.float32) * 0.5
    s.write(0, pcm)
    s.close()
    data = np.frombuffer(out.read_bytes(), dtype="<i2")
    assert len(data) == 1600
    assert np.abs(data).max() > 8000
    # unknown player -> clear error
    import pytest as _pytest
    import shutil
    if not any(shutil.which(c) for c in ("paplay", "aplay", "ffplay")):
        with _pytest.raises(RuntimeError):
            make_sink("play")


def test_native_audio_backends_protocol():
    """Pulse/ALSA native sinks (ctypes): correct library call protocol
    against stub libraries, graceful RuntimeError when the system
    library is absent (this image has no sound server)."""
    import ctypes
    import numpy as np
    import pytest
    from dsdneo_tpu.io.audio_out import AlsaSink, PulseSimpleSink, make_sink

    class PulseStub:
        def __init__(self):
            self.calls = []
            self.pa_simple_new = lambda *a: self.calls.append("new") or 0xBEEF
            self.pa_simple_new.restype = None

        def pa_simple_write(self, s, buf, n, err):
            self.calls.append(("write", n))

        def pa_simple_drain(self, s, err):
            self.calls.append("drain")

        def pa_simple_free(self, s):
            self.calls.append("free")

    class _PaNew:
        restype = None

    stub = PulseStub()
    sink = PulseSimpleSink(_lib=stub)
    sink.write(0, np.zeros(160, np.float32))
    sink.close()
    assert ("write", 320) in stub.calls
    assert "drain" in stub.calls and "free" in stub.calls

    class AlsaStub:
        def __init__(self):
            self.calls = []

        def snd_pcm_open(self, pcm, dev, stream, mode):
            self.calls.append(("open", dev))
            return 0

        def snd_pcm_set_params(self, pcm, fmt, access, ch, rate, resample,
                               latency):
            self.calls.append(("params", fmt, rate))
            return 0

        def snd_pcm_writei(self, pcm, buf, n):
            self.calls.append(("writei", n))
            return n

        def snd_pcm_drain(self, pcm):
            self.calls.append("drain")

        def snd_pcm_close(self, pcm):
            self.calls.append("close")

    astub = AlsaStub()
    sink = AlsaSink(_lib=astub)
    sink.write(0, np.zeros(160, np.float32))
    sink.close()
    assert ("open", b"default") in astub.calls
    assert ("params", 2, 8000) in astub.calls
    assert ("writei", 160) in astub.calls

    # graceful unavailability on this image
    if ctypes.util.find_library("pulse-simple") is None:
        with pytest.raises(RuntimeError):
            make_sink("pulse")
    if ctypes.util.find_library("asound") is None:
        with pytest.raises(RuntimeError):
            make_sink("alsa")
