"""Env-knob batch 7: librtlsdr driver options (DSD_NEO_RTL_*) and
tuner autogain (DSD_NEO_TUNER_AUTOGAIN*) — reference
docs/cli.md:573-592, rtl_sdr_fm.cpp stream_open_apply_* /
demod_autogain_*."""

import ctypes
import subprocess

import numpy as np
import pytest

from dsdneo_tpu.runtime import config as C

STUB_C = r"""
#include <stdint.h>

/* extended librtlsdr ABI stub: driver-option + read-back symbols */
static uint32_t g_freq, g_rate, g_rtl_xtal, g_tuner_xtal;
static int g_open = 0, g_direct = 0, g_offset = 0, g_test = 0;
static int g_if_stage[16], g_if_gain[16], g_if_n = 0;
static int g_gain = 0, g_gain_mode = 0;
static int g_flaky_rate_sets = 0;  /* first N rate sets don't stick */

uint32_t rtlsdr_get_device_count(void) { return 1; }
int rtlsdr_open(void **dev, uint32_t index) { (void)index; *dev = (void*)&g_open; g_open = 1; return 0; }
int rtlsdr_close(void *dev) { (void)dev; g_open = 0; return 0; }
int rtlsdr_set_sample_rate(void *d, uint32_t r) {
    (void)d;
    if (g_flaky_rate_sets > 0) { g_flaky_rate_sets--; g_rate = r / 2; return 0; }
    g_rate = r; return 0;
}
int rtlsdr_set_center_freq(void *d, uint32_t f) { (void)d; g_freq = f; return 0; }
uint32_t rtlsdr_get_center_freq(void *d) { (void)d; return g_freq; }
uint32_t rtlsdr_get_sample_rate(void *d) { (void)d; return g_rate; }
int rtlsdr_set_freq_correction(void *d, int p) { (void)d; (void)p; return 0; }
int rtlsdr_set_tuner_gain_mode(void *d, int m) { (void)d; g_gain_mode = m; return 0; }
int rtlsdr_set_tuner_gain(void *d, int g) { (void)d; g_gain = g; return 0; }
int rtlsdr_set_direct_sampling(void *d, int m) { (void)d; g_direct = m; return 0; }
int rtlsdr_set_offset_tuning(void *d, int m) { (void)d; g_offset = m; return 0; }
int rtlsdr_set_xtal_freq(void *d, uint32_t r, uint32_t t) { (void)d; g_rtl_xtal = r; g_tuner_xtal = t; return 0; }
int rtlsdr_set_tuner_if_gain(void *d, int s, int g) {
    (void)d; if (g_if_n < 16) { g_if_stage[g_if_n] = s; g_if_gain[g_if_n] = g; g_if_n++; } return 0;
}
int rtlsdr_set_testmode(void *d, int m) { (void)d; g_test = m; return 0; }
int rtlsdr_reset_buffer(void *d) { (void)d; return 0; }
int rtlsdr_read_sync(void *d, void *buf, int len, int *n) { (void)d; (void)buf; *n = 0; return -1; }
int stub_direct(void) { return g_direct; }
int stub_offset(void) { return g_offset; }
int stub_test(void) { return g_test; }
uint32_t stub_rtl_xtal(void) { return g_rtl_xtal; }
uint32_t stub_tuner_xtal(void) { return g_tuner_xtal; }
int stub_if_n(void) { return g_if_n; }
int stub_if_stage(int i) { return g_if_stage[i]; }
int stub_if_gain(int i) { return g_if_gain[i]; }
uint32_t stub_rate(void) { return g_rate; }
void stub_set_flaky(int n) { g_flaky_rate_sets = n; }
int stub_gain(void) { return g_gain; }
"""


@pytest.fixture(scope="module")
def stub_lib(tmp_path_factory):
    d = tmp_path_factory.mktemp("rtlstub7")
    src = d / "stub.c"
    so = d / "librtlsdr_stub7.so"
    src.write_text(STUB_C)
    subprocess.run(["gcc", "-shared", "-fPIC", "-o", str(so), str(src)],
                   check=True)
    return str(so)


class _ListRing:
    def write(self, data: bytes) -> int:
        return len(data)


def _cfg(**env):
    return C.load_env(environ={f"DSD_NEO_{k}": v for k, v in env.items()})


def test_reference_names_resolve():
    cfg = _cfg(RTL_DIRECT="Q", RTL_OFFSET_TUNING="0", RTL_XTAL_HZ="28800100",
               TUNER_XTAL_HZ="28800200", RTL_IF_GAINS="1:6,2:-3.5",
               RTL_TESTMODE="1", RTL_VERIFY="1", RTL_VERIFY_ATTEMPTS="25",
               TUNER_AUTOGAIN="1", TUNER_AUTOGAIN_PROBE_MS="2000",
               TUNER_AUTOGAIN_SEED_DB="24", TUNER_AUTOGAIN_SPEC_SNR_DB="9",
               TUNER_AUTOGAIN_INBAND_RATIO="0.7",
               TUNER_AUTOGAIN_UP_STEP_DB="2.5",
               TUNER_AUTOGAIN_UP_PERSIST="4")
    assert cfg.rtl_direct == 2          # Q-ADC
    assert _cfg(RTL_DIRECT="I").rtl_direct == 1
    assert _cfg(RTL_DIRECT="1").rtl_direct == 1
    assert cfg.rtl_offset_tuning is False
    assert cfg.rtl_xtal_hz == 28800100 and cfg.tuner_xtal_hz == 28800200
    assert cfg.rtl_if_gains == "1:6,2:-3.5"
    assert cfg.rtl_testmode and cfg.rtl_verify
    assert cfg.rtl_verify_attempts == 10       # clamped 1-10
    assert cfg.tuner_autogain
    assert cfg.tuner_autogain_probe_ms == 2000
    assert cfg.tuner_autogain_seed_db == 24.0
    assert cfg.tuner_autogain_spec_snr_db == 9.0
    assert cfg.tuner_autogain_inband_ratio == 0.7
    assert cfg.tuner_autogain_up_step_db == 2.5
    assert cfg.tuner_autogain_up_persist == 4


def test_parse_if_gains_heuristics():
    """The reference's dB vs tenth-dB parse: decimal → dB, integer
    ≤90 → dB, integer >90 → already tenth-dB, 'dB' suffix stripped."""
    from dsdneo_tpu.io.sdr_device import parse_if_gains
    assert parse_if_gains("1:6,2:-3.5") == [(1, 60), (2, -35)]
    assert parse_if_gains("3:120") == [(3, 120)]        # tenth-dB
    assert parse_if_gains("1:6dB; 2:9db") == [(1, 60), (2, 90)]
    assert parse_if_gains("junk,:-,x:1,-1:5") == []
    assert parse_if_gains("") == []


def test_driver_knobs_reach_librtlsdr(stub_lib, monkeypatch):
    from dsdneo_tpu.io.sdr_device import RtlUsbDevice
    monkeypatch.setenv("DSDNEO_RTLSDR_LIB", stub_lib)
    old = C._config
    try:
        C._config = C.RuntimeConfig(
            rtl_direct=0, rtl_offset_tuning=True, rtl_xtal_hz=28_800_100,
            tuner_xtal_hz=28_800_200, rtl_if_gains="1:6,2:-3.5",
            rtl_testmode=True)
        dev = RtlUsbDevice(_ListRing(), sample_rate=2_400_000,
                           freq_hz=851_000_000)
        probe = ctypes.CDLL(stub_lib)
        assert probe.stub_offset() == 1
        assert probe.stub_test() == 1
        probe.stub_rtl_xtal.restype = ctypes.c_uint32
        probe.stub_tuner_xtal.restype = ctypes.c_uint32
        assert probe.stub_rtl_xtal() == 28_800_100
        assert probe.stub_tuner_xtal() == 28_800_200
        assert probe.stub_if_n() == 2
        assert probe.stub_if_stage(0) == 1 and probe.stub_if_gain(0) == 60
        assert probe.stub_if_stage(1) == 2 and probe.stub_if_gain(1) == -35
        dev.close()
    finally:
        C._config = old


def test_direct_sampling_disables_offset_tuning(stub_lib, monkeypatch):
    from dsdneo_tpu.io.sdr_device import RtlUsbDevice
    monkeypatch.setenv("DSDNEO_RTLSDR_LIB", stub_lib)
    probe = ctypes.CDLL(stub_lib)
    old = C._config
    try:
        C._config = C.RuntimeConfig(rtl_direct=2, rtl_offset_tuning=True)
        dev = RtlUsbDevice(_ListRing(), sample_rate=2_400_000)
        assert probe.stub_direct() == 2
        dev.close()
    finally:
        C._config = old


def test_rtl_verify_retries_until_applied(stub_lib, monkeypatch):
    """DSD_NEO_RTL_VERIFY: a sample rate that doesn't stick on the
    first applies is re-applied until the read-back matches."""
    from dsdneo_tpu.io.sdr_device import RtlUsbDevice
    monkeypatch.setenv("DSDNEO_RTLSDR_LIB", stub_lib)
    probe = ctypes.CDLL(stub_lib)
    probe.stub_set_flaky(2)        # first 2 rate sets land at half rate
    old = C._config
    try:
        C._config = C.RuntimeConfig(rtl_verify=True, rtl_verify_attempts=5)
        dev = RtlUsbDevice(_ListRing(), sample_rate=2_400_000)
        probe.stub_rate.restype = ctypes.c_uint32
        assert probe.stub_rate() == 2_400_000
        dev.close()
    finally:
        C._config = old


# --------------------------------------------------------------- autogain

def _ag(**kw):
    from dsdneo_tpu.io.auto_gain import TunerAutogain
    applied = []
    now = [0.0]
    kw.setdefault("window_blocks", 4)
    ag = TunerAutogain(lambda g: applied.append(g), now_fn=lambda: now[0],
                       **kw)
    return ag, applied, now


def test_autogain_seeds_then_backs_off_on_clipping():
    ag, applied, now = _ag(seed_db=30.0)
    now[0] = 2.0                   # past the initial hold
    clip = np.full(256, 0.95 + 0j, dtype=np.complex64)
    for _ in range(4):
        ag.update(clip)
    assert applied[0] == 300       # seed applied on first block
    now[0] = 4.0                   # past the post-seed throttle
    for _ in range(4):
        ag.update(clip)
    assert applied[-1] == 250      # −5 dB back-off
    assert ag.adjustments == 2


def test_autogain_steps_up_on_quiet_clean_signal():
    ag, applied, now = _ag(seed_db=20.0, up_step_db=3.0, up_persist=2,
                           spec_snr_db=6.0, inband_ratio=0.3)
    # quiet but real carrier: a clean in-band tone at low level
    t = np.arange(256)
    sig = (0.03 * np.exp(2j * np.pi * 0.05 * t)).astype(np.complex64)
    now[0] = 2.0
    for w in range(6):             # several windows for persist
        now[0] += 2.0              # step past the throttle each window
        for _ in range(4):
            ag.update(sig)
    assert applied[0] == 200
    # +3 dB per step, each gated behind a fresh 2-window persist
    assert applied[1] == 230
    assert all(b - a == 30 for a, b in zip(applied, applied[1:]))


def test_autogain_gate_blocks_empty_channel():
    """A quiet window with a flat (noise-only) spectrum must NOT step
    the gain up — the spectral gate rejects it."""
    rng = np.random.default_rng(5)
    ag, applied, now = _ag(seed_db=20.0, spec_snr_db=12.0)
    noise = (0.01 * (rng.normal(size=256) + 1j * rng.normal(size=256))
             ).astype(np.complex64)
    now[0] = 2.0
    for w in range(6):
        now[0] += 2.0
        for _ in range(4):
            ag.update(noise)
    assert applied == [200]        # only the seed, no step-up
    assert ag.adjustments == 1


def test_autogain_retune_hold():
    ag, applied, now = _ag(seed_db=20.0)
    now[0] = 2.0
    clip = np.full(256, 0.95 + 0j, dtype=np.complex64)
    ag.update(clip)                # seeds
    now[0] = 4.0
    ag.on_retune()                 # hold window opens
    for _ in range(4):
        ag.update(clip)
    assert applied == [200]        # held: no back-off inside 1.2 s
    now[0] = 6.0
    for _ in range(4):
        ag.update(clip)
    assert applied[-1] == 150
