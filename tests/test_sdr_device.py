"""SDR device layer: librtlsdr ctypes binding driven against a
compiled stub library, SoapySDR against a fake module, and the
graceful-gating contract (reference rtl_device.cpp device triad)."""

import ctypes
import os
import subprocess
import time

import numpy as np
import pytest

STUB_C = r"""
#include <stdint.h>
#include <string.h>

/* librtlsdr ABI stub: records control calls, serves a deterministic
   ramp from rtlsdr_read_sync.  State is queryable via stub_* hooks. */
static uint32_t g_freq, g_rate;
static int g_ppm, g_gain, g_gain_mode, g_open = 0;
static uint8_t g_next = 0;
static int g_reads_left = 4;

uint32_t rtlsdr_get_device_count(void) { return 1; }
int rtlsdr_open(void **dev, uint32_t index) { (void)index; *dev = (void*)&g_open; g_open = 1; return 0; }
int rtlsdr_close(void *dev) { (void)dev; g_open = 0; return 0; }
int rtlsdr_set_sample_rate(void *d, uint32_t r) { (void)d; g_rate = r; return 0; }
int rtlsdr_set_center_freq(void *d, uint32_t f) { (void)d; g_freq = f; return 0; }
int rtlsdr_set_freq_correction(void *d, int p) { (void)d; g_ppm = p; return 0; }
int rtlsdr_set_tuner_gain_mode(void *d, int m) { (void)d; g_gain_mode = m; return 0; }
int rtlsdr_set_tuner_gain(void *d, int g) { (void)d; g_gain = g; return 0; }
int rtlsdr_set_direct_sampling(void *d, int m) { (void)d; (void)m; return 0; }
int rtlsdr_reset_buffer(void *d) { (void)d; return 0; }
int rtlsdr_read_sync(void *d, void *buf, int len, int *n_read) {
    (void)d;
    if (g_reads_left-- <= 0) { *n_read = 0; return -1; }
    uint8_t *p = (uint8_t *)buf;
    for (int i = 0; i < len; i++) p[i] = g_next++;
    *n_read = len;
    return 0;
}
uint32_t stub_freq(void) { return g_freq; }
uint32_t stub_rate(void) { return g_rate; }
int stub_ppm(void) { return g_ppm; }
int stub_gain(void) { return g_gain; }
int stub_gain_mode(void) { return g_gain_mode; }
int stub_is_open(void) { return g_open; }
"""


@pytest.fixture(scope="module")
def stub_lib(tmp_path_factory):
    d = tmp_path_factory.mktemp("rtlstub")
    src = d / "stub.c"
    so = d / "librtlsdr_stub.so"
    src.write_text(STUB_C)
    subprocess.run(["gcc", "-shared", "-fPIC", "-o", str(so), str(src)],
                   check=True)
    return str(so)


class _ListRing:
    def __init__(self):
        self.chunks = []

    def write(self, data: bytes) -> int:
        self.chunks.append(data)
        return len(data)


def test_rtl_usb_binding_against_stub(stub_lib, monkeypatch):
    from dsdneo_tpu.io.sdr_device import RtlUsbDevice
    monkeypatch.setenv("DSDNEO_RTLSDR_LIB", stub_lib)
    ring = _ListRing()
    dev = RtlUsbDevice(ring, sample_rate=2_400_000, freq_hz=851_000_000,
                       gain_tenth_db=496, ppm=3)
    probe = ctypes.CDLL(stub_lib)
    assert probe.stub_rate() == 2_400_000
    assert probe.stub_freq() == 851_000_000
    assert probe.stub_ppm() == 3
    assert probe.stub_gain() == 496 and probe.stub_gain_mode() == 1
    dev.set_freq(456_000_000)
    assert probe.stub_freq() == 456_000_000
    dev.start()
    for _ in range(100):
        if len(ring.chunks) >= 4:
            break
        time.sleep(0.02)
    dev.close()
    assert len(ring.chunks) >= 4
    data = np.frombuffer(b"".join(ring.chunks), dtype=np.uint8)
    # deterministic ramp across read_sync blocks: no gaps, no reorders
    assert np.array_equal(data[:512],
                          (np.arange(512) % 256).astype(np.uint8))
    assert probe.stub_is_open() == 0       # closed cleanly


def test_rtl_usb_gates_when_lib_missing(monkeypatch):
    from dsdneo_tpu.io.sdr_device import RtlUsbDevice, SdrUnavailable
    monkeypatch.setenv("DSDNEO_RTLSDR_LIB", "/nonexistent/librtlsdr.so")
    with pytest.raises(SdrUnavailable):
        RtlUsbDevice(_ListRing())


class _FakeSoapyStreamResult:
    def __init__(self, ret):
        self.ret = ret


class _FakeSoapyDeviceImpl:
    def __init__(self, args):
        self.args = args
        self.calls = []
        self.reads = 3

    def setSampleRate(self, rx, ch, rate):
        self.calls.append(("rate", rate))

    def setFrequency(self, rx, ch, f):
        self.calls.append(("freq", f))

    def setGain(self, rx, ch, g):
        self.calls.append(("gain", g))

    def setupStream(self, rx, fmt):
        return "stream"

    def activateStream(self, s):
        self.calls.append(("activate", s))

    def readStream(self, s, bufs, n):
        if self.reads <= 0:
            return _FakeSoapyStreamResult(0)
        self.reads -= 1
        bufs[0][:2 * n] = 7
        return _FakeSoapyStreamResult(n)

    def deactivateStream(self, s):
        self.calls.append(("deactivate", s))

    def closeStream(self, s):
        self.calls.append(("close", s))


class _FakeSoapyModule:
    SOAPY_SDR_RX = 1
    SOAPY_SDR_CU8 = "CU8"
    Device = _FakeSoapyDeviceImpl


def test_soapy_device_against_fake_module():
    from dsdneo_tpu.io.sdr_device import SoapyDevice
    ring = _ListRing()
    dev = SoapyDevice(ring, driver_args="driver=rtlsdr",
                      sample_rate=1_000_000, freq_hz=450e6, gain_db=30.0,
                      _module=_FakeSoapyModule)
    assert ("rate", 1_000_000.0) in dev.dev.calls
    assert ("freq", 450e6) in dev.dev.calls
    dev.start()
    for _ in range(100):
        if len(ring.chunks) >= 3:
            break
        time.sleep(0.02)
    dev.close()
    assert len(ring.chunks) == 3
    assert ring.chunks[0] == bytes([7]) * (16384 * 2)
    assert ("close", "stream") in dev.dev.calls


def test_live_engine_decodes_through_usb_stub(stub_lib, monkeypatch,
                                              tmp_path):
    """Full glue: a stub librtlsdr serving a real fixture's CU8 bytes
    feeds the ingest ring → LiveEngine decodes the control channel."""
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(
        "/root/reference/tests/fixtures/iq/p25p1_c4fm_cc.iq.json")
    cu8 = np.empty(samples.size * 2, np.uint8)
    cu8[0::2] = np.clip(np.round(samples.real * 64 + 127.5),
                        0, 255).astype(np.uint8)
    cu8[1::2] = np.clip(np.round(samples.imag * 64 + 127.5),
                        0, 255).astype(np.uint8)
    # stub variant that serves the fixture instead of the ramp
    src = tmp_path / "stub2.c"
    so = tmp_path / "librtlsdr_fix.so"
    src.write_text(STUB_C.replace(
        "for (int i = 0; i < len; i++) p[i] = g_next++;",
        "extern const uint8_t g_payload[]; extern const int g_payload_len;\n"
        "    static int off = 0;\n"
        "    for (int i = 0; i < len; i++) p[i] = g_payload[(off + i) % g_payload_len];\n"
        "    off += len;").replace(
        "static int g_reads_left = 4;", "static int g_reads_left = 40;"))
    payload = tmp_path / "payload.c"
    arr = ",".join(str(int(b)) for b in cu8[:400000])
    payload.write_text(
        f"#include <stdint.h>\nconst uint8_t g_payload[] = {{{arr}}};\n"
        f"const int g_payload_len = {min(cu8.size, 400000)};\n")
    subprocess.run(["gcc", "-shared", "-fPIC", "-o", str(so), str(src),
                    str(payload)], check=True)

    from dsdneo_tpu.engine.live import LiveEngine
    from dsdneo_tpu.io.sdr_device import RtlUsbDevice
    monkeypatch.setenv("DSDNEO_RTLSDR_LIB", str(so))
    events = []
    eng = LiveEngine("p25p1", fs=48000.0, block_s=0.25,
                     on_event=events.append)
    dev = RtlUsbDevice(eng.ring, sample_rate=48000, freq_hz=851_000_000)
    dev.start()
    t0 = time.time()
    eng.start()
    while time.time() - t0 < 20:
        if any("NAC/CC: 140" in e.line for e in events):
            break
        time.sleep(0.2)
    eng.stop()
    dev.close()
    assert any("NAC/CC: 140" in e.line for e in events)
