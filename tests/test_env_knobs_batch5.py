"""Env-knob batch 5: reference-name parity (docs/cli.md:537-658) with
real consumers — DSP helpers (deemphasis / audio LPF / channel LPF /
resampler), CQPSK loop-dynamics equivalents, capture-shift + rotation
transforms, retune drain/output-clear, DC tracker, rigctl/TCP-input
socket knobs, DMR Tier III heuristic LCN fill."""

import os

import numpy as np
import pytest

from dsdneo_tpu.runtime import config as C

FIXDIR = "/root/reference/tests/fixtures/iq"


def _cfg(**env):
    return C.load_env(environ={f"DSD_NEO_{k}": v for k, v in env.items()})


# ---------------------------------------------------------------- config map

def test_reference_names_resolve():
    cfg = _cfg(DEEMPH="75", AUDIO_LPF="3400", CHANNEL_LPF="0",
               RESAMP="off", COSTAS_BW="0.02", COSTAS_DAMPING="0.7",
               TED_GAIN="1.5", CQPSK="1", CQPSK_SYNC_INV="1",
               CQPSK_SYNC_NEG="1", DEBUG_SYNC="1", DEBUG_CQPSK="1",
               DISABLE_FS4_SHIFT="1", COMBINE_ROT="0", IQ_DC_SHIFT="6",
               RETUNE_DRAIN_MS="80", OUTPUT_CLEAR_ON_RETUNE="1",
               RIGCTL_RCVTIMEO="750", TCPIN_BACKOFF_MS="40",
               DMR_T3_HEUR="1")
    assert cfg.deemph == "75"
    assert cfg.audio_lpf_hz == 3400
    assert cfg.channel_lpf is False
    assert cfg.resamp_hz == 0
    assert cfg.costas_bw == 0.02
    assert cfg.costas_damping == 0.7
    assert cfg.ted_gain == 1.5
    assert cfg.cqpsk and cfg.cqpsk_sync_inv and cfg.cqpsk_sync_neg
    assert cfg.debug_sync and cfg.debug_cqpsk
    assert cfg.disable_fs4_shift is True
    assert cfg.combine_rot is False
    assert cfg.iq_dc_shift == 6
    assert cfg.retune_drain_ms == 80.0
    assert cfg.output_clear_on_retune is True
    assert cfg.rigctl_rcvtimeo_ms == 750
    assert cfg.tcpin_backoff_ms == 40
    assert cfg.dmr_t3_heur is True


def test_defaults_keep_legacy_behavior():
    cfg = _cfg()
    assert cfg.deemph == "off" and cfg.audio_lpf_hz == 0
    assert cfg.channel_lpf is True and cfg.resamp_hz == 48000
    assert cfg.combine_rot is True and cfg.disable_fs4_shift is False
    assert cfg.dmr_t3_heur is False


# -------------------------------------------------------- audio conditioning

def test_condition_audio_deemph_and_lpf():
    """DSD_NEO_DEEMPH + DSD_NEO_AUDIO_LPF attenuate a 3.8 kHz tone far
    more than a 300 Hz tone on the monitor output."""
    from dsdneo_tpu.cli import _condition_audio
    t = np.arange(8000) / 8000.0
    lo = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 3800 * t).astype(np.float32)
    cfg = C.RuntimeConfig(deemph="75", audio_lpf_hz=2000)
    lo_g = np.abs(_condition_audio(lo, cfg)[2000:]).max()
    hi_g = np.abs(_condition_audio(hi, cfg)[2000:]).max()
    # the two discrete one-poles combine to ≈0.45 at 3.8 kHz vs ≈0.98
    # passthrough at 300 Hz
    assert hi_g < 0.55 * lo_g
    # off config is a strict pass-through
    same = _condition_audio(hi, C.RuntimeConfig())
    np.testing.assert_array_equal(same, hi)


def test_channel_lpf_bypass_changes_front_end():
    """DSD_NEO_CHANNEL_LPF=0 bypasses the channel low-pass: wideband
    noise survives into the discriminator."""
    from dsdneo_tpu.engine.demod import demod_fm
    rng = np.random.default_rng(7)
    x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)) \
        .astype(np.complex64)
    old = C._config
    try:
        C._config = C.RuntimeConfig(channel_lpf=True)
        d_f, _ = demod_fm(x, "p25p1", fs=48000.0)
        C._config = C.RuntimeConfig(channel_lpf=False)
        d_n, _ = demod_fm(x, "p25p1", fs=48000.0)
    finally:
        C._config = old
    assert not np.array_equal(d_f, d_n)


# --------------------------------------------------------------- CQPSK knobs

def test_cfo_pull_in_masks_out_of_range_line():
    """COSTAS_BW → pull-in limit.  The default window is ±Rs/8 (the
    widest range that still excludes the x⁴ mirror line at 4·CFO −
    Rs/2): a strong far spur is rejected by DEFAULT, and an explicit
    wider pull-in re-admits it (the knob is consumed)."""
    import jax.numpy as jnp

    from dsdneo_tpu.dsp.cqpsk import estimate_cfo_qpsk
    fs, rs = 48000.0, 4800.0
    n = 4096
    t = np.arange(n) / fs
    # x⁴ lines: CFO=+400 Hz ⇒ line at Rs/2+1600 (inside the default
    # ±Rs/8 window); spur CFO=+3000 ⇒ line at Rs/2+12000 (stronger,
    # outside)
    true_line = np.exp(2j * np.pi * (rs / 2 + 4 * 400.0) / 4 * t)
    spur_line = np.exp(2j * np.pi * (rs / 2 + 4 * 3000.0) / 4 * t)
    x = jnp.asarray((0.4 * true_line + 1.0 * spur_line)[None, :])
    default = float(estimate_cfo_qpsk(x, fs, rs)[0])
    widened = float(estimate_cfo_qpsk(x, fs, rs, pull_in_hz=3200.0)[0])
    narrow = float(estimate_cfo_qpsk(x, fs, rs, pull_in_hz=500.0)[0])
    assert abs(default - 400.0) < 30.0     # default rejects the spur
    # wide pull-in re-admits the out-of-band energy (the strongest
    # x⁴ line of a two-tone sum is the 4ab³ intermod, CFO ≈ 2350)
    assert abs(widened - 400.0) > 1000.0
    assert abs(narrow - 400.0) < 30.0      # narrow window keeps truth


def test_cfo_prior_blend():
    """COSTAS_DAMPING: the block CFO estimate is blended with the
    cross-block carrier state."""
    import jax.numpy as jnp

    from dsdneo_tpu.dsp.cqpsk import demod_cqpsk
    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.normal(size=(1, 4096))
                     + 1j * rng.normal(size=(1, 4096))).astype(np.complex64))
    _, cfo_free = demod_cqpsk(x, 48000.0, 4800.0)
    _, cfo_damp = demod_cqpsk(x, 48000.0, 4800.0,
                              cfo_prior=0.0, cfo_alpha=0.25)
    np.testing.assert_allclose(np.asarray(cfo_damp),
                               0.25 * np.asarray(cfo_free), rtol=1e-5)


@pytest.mark.skipif(
    not os.path.exists(f"{FIXDIR}/p25p1_cqpsk_cc.iq.json"),
    reason="reference fixtures unavailable")
def test_cqpsk_knobs_end_to_end():
    """The tuned CQPSK chain (TED gain, pull-in bound, damping, debug)
    still decodes the LSM control-channel fixture."""
    from dsdneo_tpu.engine import decode_capture
    old = C._config
    try:
        C._config = C.RuntimeConfig(ted_gain=1.5, costas_bw=0.05,
                                    costas_damping=0.5, debug_cqpsk=True)
        ctx = decode_capture(f"{FIXDIR}/p25p1_cqpsk_cc.iq.json",
                             "p25p1", cqpsk=True)
    finally:
        C._config = old
    assert any("NAC" in e.line for e in ctx.events)


# ----------------------------------------------------------------- resampler

@pytest.mark.skipif(
    not os.path.exists(f"{FIXDIR}/p25p1_c4fm_cc.iq.json"),
    reason="reference fixtures unavailable")
def test_resamp_knob_decodes_at_target_rate():
    """DSD_NEO_RESAMP=50000: the 48 kHz capture is polyphase-resampled
    to 50 kHz and decoded at that DSP rate."""
    from dsdneo_tpu.engine import decode_capture
    old = C._config
    try:
        C._config = C.RuntimeConfig(resamp_hz=50000)
        ctx = decode_capture(f"{FIXDIR}/p25p1_c4fm_cc.iq.json", "p25p1")
    finally:
        C._config = old
    assert any("NAC/CC: 140" in e.line for e in ctx.events)


# ------------------------------------------------- capture shift + rotation

def test_fs4_rotation_fused_equals_two_pass():
    """COMBINE_ROT: the native fused widen+rotate equals widen followed
    by the host j^n rotation."""
    from dsdneo_tpu.runtime.native import IngestRing
    raw = np.random.default_rng(11).integers(0, 256, 1024, dtype=np.uint8)
    r1 = IngestRing(1 << 16)
    r1.write(raw.tobytes())
    fused = r1.read_block_cu8(512, rotate=1, timeout_ms=200)
    r1.close()
    r2 = IngestRing(1 << 16)
    r2.write(raw.tobytes())
    plain = r2.read_block_cu8(512, rotate=0, timeout_ms=200)
    r2.close()
    z = (plain[:, 0] + 1j * plain[:, 1]).astype(np.complex64)
    z = z * np.power(1j, np.arange(512) & 3).astype(np.complex64)
    np.testing.assert_allclose(fused[:, 0] + 1j * fused[:, 1], z, atol=1e-6)


def test_fs4_offset_property():
    from dsdneo_tpu.engine.live import LiveEngine
    eng = LiveEngine("p25p1", fs=48000.0)
    assert eng.fs4_offset_hz == 0.0
    eng.fs4_shift = True
    assert eng.fs4_offset_hz == 12000.0
    eng.ring.close()


# ------------------------------------------------------ retune drain / clear

def test_retune_drain_defers_purge():
    """RETUNE_DRAIN_MS: tune() keeps the buffered pre-retune signal
    alive until the drain budget is consumed."""
    from dsdneo_tpu.engine.live import LiveEngine
    eng = LiveEngine("p25p1", fs=48000.0, block_s=0.01)
    eng.retune_drain_s = 0.02
    eng.ring.write(np.zeros(4 * eng.block, dtype=np.uint8).tobytes())
    fill_before = eng.ring.fill
    eng.tune(851e6)
    assert eng._drain_budget == int(48000 * 0.02)
    assert eng.ring.fill == fill_before      # no purge yet
    eng._apply_retune()
    assert eng._drain_budget is None
    assert eng._mute_samples > 0
    eng.ring.close()


def test_output_clear_on_retune():
    from dsdneo_tpu.engine.live import LiveEngine
    eng = LiveEngine("p25p1", fs=48000.0)
    eng.output_clear_on_retune = True
    eng.decoder.ctx.audio[0] = [np.zeros(160, dtype=np.float32)]
    eng.tune(851e6)
    assert eng.decoder.ctx.audio == {}
    eng.ring.close()


def test_dc_tracker_one_pole():
    """IQ_DC_SHIFT=k: dc += (mean − dc)/2^k across blocks."""
    from dsdneo_tpu.engine.live import LiveEngine
    eng = LiveEngine("p25p1", fs=48000.0, block_s=0.01)
    eng.dc_block, eng.dc_shift = True, 2
    eng.squelch_db = 200.0        # gate decode: this tests the tracker only
    bias = 0.5 + 0.25j
    raw = np.empty(2 * eng.block, dtype=np.uint8)
    raw[0::2] = np.uint8(round(bias.real * 127.5 + 127.5))
    raw[1::2] = np.uint8(round(bias.imag * 127.5 + 127.5))
    for _ in range(3):
        eng.ring.write(raw.tobytes())
    eng.run(max_blocks=3)
    # after 3 one-pole steps: dc = bias·(1 − (3/4)³)
    expect = bias * (1 - 0.75 ** 3)
    assert abs(eng._dc - expect) < 0.05
    eng.ring.close()


# ------------------------------------------------------------- socket knobs

def test_tcp_input_backoff_paces_timeouts():
    import socket
    import time

    from dsdneo_tpu.io.net import TcpPcmInput
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    src = TcpPcmInput("127.0.0.1", srv.getsockname()[1],
                      timeout=0.05, backoff_ms=60.0)
    t0 = time.monotonic()
    assert src.read(100) is None
    assert time.monotonic() - t0 >= 0.1     # timeout + backoff
    src.close()
    srv.close()


def test_rigctl_timeout_param():
    import socket
    import threading

    from dsdneo_tpu.io.net import RigctlClient
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    def _accept():
        try:
            srv.accept()
        except OSError:
            pass
    threading.Thread(target=_accept, daemon=True).start()
    cli = RigctlClient("127.0.0.1", srv.getsockname()[1], timeout=0.123)
    assert abs(cli.sock.gettimeout() - 0.123) < 1e-9
    cli.sock.close()
    srv.close()


# ------------------------------------------------------ DMR T3 LCN heuristic

def test_t3_heuristic_fill_linear_model():
    from dsdneo_tpu.engine.trunk import ChannelMap
    cm = ChannelMap()
    cm.entries = {1: 460_000_000.0, 4: 460_037_500.0, 9: 460_100_000.0}
    assert cm.heuristic_fill() == 6          # LCNs 2,3,5,6,7,8
    assert cm.freq(2) == 460_012_500.0
    assert cm.freq(7) == 460_075_000.0


def test_t3_heuristic_rejects_bad_model():
    from dsdneo_tpu.engine.trunk import ChannelMap
    cm = ChannelMap()
    cm.entries = {1: 460_000_000.0, 4: 460_031_111.0}   # fractional step
    assert cm.heuristic_fill() == 0
    cm.entries = {1: 460_000_000.0}                     # single anchor
    assert cm.heuristic_fill() == 0


def test_t3_heuristic_resolves_grant_lcn():
    """DSD_NEO_DMR_T3_HEUR: a granted LCN outside the learned anchors'
    explicit entries resolves through the heuristic fill."""
    from dsdneo_tpu.engine.trunk import (ChannelMap, TrunkFollower,
                                         TrunkSM)

    class _Ctx:
        class state:
            pass
    cm = ChannelMap()
    cm.entries = {1: 460_000_000.0, 5: 460_050_000.0}
    sm = TrunkSM(tune=lambda f, kind: True, now_fn=lambda: 0.0)
    fo = TrunkFollower(sm, _Ctx(), chan_map=cm)
    old = C._config
    try:
        C._config = C.RuntimeConfig(dmr_t3_heur=False)
        assert fo.resolve_freq({"lpcn": 3}) == 0.0
        C._config = C.RuntimeConfig(dmr_t3_heur=True)
        assert fo.resolve_freq({"lpcn": 3}) == 460_025_000.0
    finally:
        C._config = old
