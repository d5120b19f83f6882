"""rtl_tcp device layer + auto-PPM: protocol, live decode, retune,
drift-correction convergence."""

import os
import time

import numpy as np
import pytest

FIXDIR = "/root/reference/tests/fixtures/iq"


def test_rtl_tcp_protocol_and_live_decode():
    """Client speaks the rtl_tcp protocol against a fake server that
    streams a real fixture; LiveEngine decodes it from the ring and a
    mid-stream retune reaches the server as a SET_FREQ command."""
    path = os.path.join(FIXDIR, "p25p1_c4fm_cc.iq")
    if not os.path.exists(path):
        pytest.skip("reference fixtures unavailable")
    from dsdneo_tpu.engine.live import LiveEngine
    from dsdneo_tpu.io.rtl_tcp import (CMD_SET_FREQ, CMD_SET_FREQ_CORRECTION,
                                       CMD_SET_SAMPLE_RATE, FakeRtlTcpServer,
                                       RtlTcpClient)

    payload = open(path, "rb").read()
    srv = FakeRtlTcpServer(payload)
    events = []
    eng = LiveEngine("p25p1", fs=48000.0, block_s=0.25,
                     on_event=lambda e: events.append(e))
    cli = RtlTcpClient("127.0.0.1", srv.port, eng.ring,
                       sample_rate=48000, freq_hz=851_000_000, ppm=3)
    assert cli.tuner_type == 5
    cli.start()
    eng.start()
    deadline = time.time() + 30
    while time.time() < deadline:
        if any("NAC/CC: 140" in e.line for e in events):
            break
        time.sleep(0.2)
    # retune through the device layer
    cli.set_freq(852_000_000)
    eng.tune(852_000_000)
    time.sleep(0.3)
    eng.stop()
    cli.close()
    srv.close()

    assert any("NAC/CC: 140" in e.line for e in events), \
        f"{len(events)} events, none matched"
    cmds = dict()
    for c, v in srv.commands:
        cmds.setdefault(c, []).append(v)
    assert 48000 in cmds.get(CMD_SET_SAMPLE_RATE, [])
    assert 851_000_000 in cmds.get(CMD_SET_FREQ, [])
    assert 852_000_000 in cmds.get(CMD_SET_FREQ, [])
    assert 3 in cmds.get(CMD_SET_FREQ_CORRECTION, [])


def test_auto_ppm_converges_and_locks():
    """Simulated drift: a +2.5 ppm oscillator error at 851 MHz is
    corrected to within the deadband and the loop zero-locks."""
    from dsdneo_tpu.io.auto_ppm import AutoPpm, estimate_cfo_hz

    fs = 48000.0
    center = 851e6
    true_err_ppm = 2.5
    applied = {"ppm": 0}

    def set_ppm(p):
        applied["ppm"] = p

    ap = AutoPpm(set_ppm, center, train_blocks=4, lock_blocks=6)
    rng = np.random.default_rng(0)
    t = np.arange(int(fs * 0.1)) / fs
    for _ in range(80):
        # librtlsdr plant: LO = f·(1+e)/(1+p), so the observed carrier
        # offset is (p − e)·f·1e-6 (crystal fast + no correction ⇒ the
        # carrier appears BELOW center)
        residual_hz = (applied["ppm"] - true_err_ppm) * center / 1e6
        iq = np.exp(2j * np.pi * residual_hz * t).astype(np.complex64)
        iq += 0.05 * (rng.normal(size=t.size)
                      + 1j * rng.normal(size=t.size))
        cfo = estimate_cfo_hz(iq, fs)
        ap.update(cfo, snr_db=20.0)
        if ap.locked:
            break
    assert ap.locked
    assert abs(true_err_ppm - applied["ppm"]) <= 0.6
    assert ap.corrections >= 1

    # low SNR blocks are gated (no corrections issued)
    ap2 = AutoPpm(set_ppm, center)
    assert not ap2.update(5000.0, snr_db=3.0)
    assert ap2.corrections == 0


def test_estimate_cfo_accuracy():
    from dsdneo_tpu.io.auto_ppm import estimate_cfo_hz
    fs = 48000.0
    t = np.arange(4800) / fs
    for f in (-1700.0, 0.0, 933.0):
        iq = np.exp(2j * np.pi * f * t).astype(np.complex64)
        assert abs(estimate_cfo_hz(iq, fs) - f) < 2.0


def test_cli_rtltcp_fs4_capture_shift(capsys, monkeypatch):
    """Full CLI rtltcp path with the default +fs/4 capture shift
    (reference rtl_sdr_fm.cpp capture downconvert): the fake server
    streams the fixture as an offset-tuned tuner would observe it
    (channel at −fs/4, i.e. multiplied by (−j)^n) and the ring's fused
    widen+rotate recovers baseband; the tuner command carries the
    +fs/4 offset."""
    path = os.path.join(FIXDIR, "p25p1_c4fm_cc.iq")
    if not os.path.exists(path):
        pytest.skip("reference fixtures unavailable")
    from dsdneo_tpu import cli
    from dsdneo_tpu.io.rtl_tcp import CMD_SET_FREQ, FakeRtlTcpServer

    raw = np.frombuffer(open(path, "rb").read(), dtype=np.uint8)
    i, q = raw[0::2], raw[1::2]
    # exact integer (−j)^n rotation on the CU8 encoding: negation of a
    # widened sample maps its code v to 255−v
    obs = np.empty_like(raw).reshape(-1, 2)
    k = np.arange(i.size) & 3
    obs[k == 0] = np.stack([i[k == 0], q[k == 0]], axis=1)
    obs[k == 1] = np.stack([q[k == 1], 255 - i[k == 1]], axis=1)
    obs[k == 2] = np.stack([255 - i[k == 2], 255 - q[k == 2]], axis=1)
    obs[k == 3] = np.stack([255 - q[k == 3], i[k == 3]], axis=1)

    srv = FakeRtlTcpServer(obs.tobytes())
    monkeypatch.setenv("DSDNEO_RTLTCP_RATE", "48000")
    rc = cli.main(["-f1", "-i", f"rtltcp:127.0.0.1:{srv.port}:851000000",
                   "--duration", "6"])
    srv.close()
    assert rc == 0
    out = capsys.readouterr().out
    assert "NAC/CC: 140" in out
    tuned = [v for c, v in srv.commands if c == CMD_SET_FREQ]
    assert 851_012_000 in tuned       # channel + fs/4 tune offset
