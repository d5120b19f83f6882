"""Env-knob batch 4: reference-name parity (docs/cli.md:493-658) with
real consumers — trunk SM timers, auto-PPM gates, soft thresholds,
preemption policy, runtime toggles."""

import numpy as np
import pytest

from dsdneo_tpu.runtime import config as C


def _cfg(**env):
    return C.load_env(environ={f"DSD_NEO_{k}": v for k, v in env.items()})


# ---------------------------------------------------------------- config map

def test_reference_names_resolve():
    cfg = _cfg(P25_GRANT_TIMEOUT="2.5", P25_MIN_FOLLOW_DWELL="1.25",
               P25_FORCE_RELEASE_EXTRA="4", P25_FORCE_RELEASE_MARGIN="0.5",
               P25P1_ERR_HOLD_PCT="12", P25P1_ERR_HOLD_S="3",
               DMR_GRANT_TIMEOUT="1.5", TG_PREEMPT_MIN_DWELL_MS="500",
               TG_PREEMPT_COOLDOWN_MS="2000", P25_AFC_STATUS_GATE="1",
               P25_SOFT_ERASURE_THRESHOLD="32",
               P25P1_SOFT_ERASURE_THRESHOLD="48",
               P25P2_SOFT_ERASURE_THRESHOLD="96",
               P25_SOFT_HARD_OVERRIDE="0",
               AUTO_PPM_PWR_DB="-60", AUTO_PPM_ZEROLOCK_PPM="0.8",
               AUTO_PPM_ZEROLOCK_HZ="45", INPUT_WARN_DB="-35",
               CACHE_DIR="/tmp/cache", CC_CACHE="0", CONFIG="/tmp/x.ini",
               NO_BOOTSTRAP="1", NO_SIGNAL_HANDLERS="1", MT="1",
               FTZ_DAZ="1", WINDOW_FREEZE="1",
               P25_MAC_HOLD="2", P25_RING_HOLD="1", P25_VOICE_HOLD="3",
               P25_GRANT_VOICE_TO="4")
    assert cfg.p25_grant_timeout_s == 2.5
    assert cfg.p25_min_follow_dwell_s == 1.25
    assert cfg.p25_force_release_extra_s == 4.0
    assert cfg.p25_force_release_margin_s == 0.5
    assert cfg.p25p1_err_hold_pct == 12.0
    assert cfg.p25p1_err_hold_s == 3.0
    assert cfg.dmr_grant_timeout_s == 1.5
    assert cfg.tg_preempt_min_dwell_ms == 500
    assert cfg.tg_preempt_cooldown_ms == 2000
    assert cfg.p25_afc_status_gate is True
    assert cfg.soft_erasure_threshold == 32
    assert cfg.p25p1_soft_erasure_threshold == 48
    assert cfg.p25p2_soft_erasure_threshold == 96
    assert cfg.p25_soft_hard_override is False
    assert cfg.auto_ppm_pwr_db == -60.0
    assert cfg.auto_ppm_zerolock_ppm == 0.8
    assert cfg.auto_ppm_zerolock_hz == 45.0
    assert cfg.input_level_warn_db == -35.0
    assert cfg.cache_dir == "/tmp/cache"
    assert cfg.cc_cache_enable is False
    assert cfg.config_path == "/tmp/x.ini"
    assert cfg.no_bootstrap and cfg.no_signal_handlers
    assert cfg.mt and cfg.ftz_daz and cfg.window_freeze
    assert cfg.p25_mac_hold_s == 2.0 and cfg.p25_ring_hold_s == 1.0
    assert cfg.p25_voice_hold_s == 3.0
    assert cfg.p25_grant_voice_to_s == 4.0


# ---------------------------------------------------------------- trunk SM

def _sm(now, **kw):
    from dsdneo_tpu.engine.trunk import TrunkSM
    tunes = []
    sm = TrunkSM(lambda f, kind: tunes.append((f, kind)) or True,
                 hangtime_s=1.0, vc_grace_s=0.1, now_fn=lambda: now[0], **kw)
    sm.on_cc_activity(851e6)
    return sm, tunes


def test_grant_timeout_returns_to_cc():
    from dsdneo_tpu.engine.trunk import GrantEvent, TrunkPhase
    now = [0.0]
    sm, tunes = _sm(now, grant_timeout_s=2.0)
    sm.on_grant(GrantEvent(852e6, tg=100, src=1))
    now[0] = 1.0
    sm.tick()
    assert sm.phase == TrunkPhase.TUNED     # inside timeout
    now[0] = 2.5
    sm.tick()                               # voice never arrived
    assert sm.phase == TrunkPhase.ON_CC
    assert "grant timeout" in " ".join(sm.events)


def test_min_follow_dwell_suppresses_hangtime():
    from dsdneo_tpu.engine.trunk import GrantEvent, TrunkPhase
    now = [0.0]
    sm, _ = _sm(now, min_follow_dwell_s=5.0)
    sm.on_grant(GrantEvent(852e6, tg=100, src=1))
    now[0] = 0.5
    sm.on_voice_activity()
    now[0] = 3.0                            # hangtime (1 s) long expired
    sm.tick()
    assert sm.phase == TrunkPhase.TUNED     # dwell holds it
    now[0] = 6.0
    sm.tick()
    assert sm.phase == TrunkPhase.ON_CC


def test_force_release_overrides_err_hold():
    from dsdneo_tpu.engine.trunk import GrantEvent, TrunkPhase
    now = [0.0]
    sm, _ = _sm(now, force_release_extra_s=1.0, force_release_margin_s=0.5,
                err_hold_pct=10.0, err_hold_s=60.0)
    sm.on_grant(GrantEvent(852e6, tg=100, src=1))
    sm.on_voice_activity()
    sm.on_voice_errs(50.0)                  # would extend hang by 60 s
    now[0] = 2.0                            # hang 1 + extra 1 + margin .5
    sm.tick()
    assert sm.phase == TrunkPhase.TUNED
    now[0] = 2.6
    sm.tick()
    assert sm.phase == TrunkPhase.ON_CC
    assert "force release" in " ".join(sm.events)


def test_err_hold_extends_hangtime():
    from dsdneo_tpu.engine.trunk import GrantEvent, TrunkPhase
    now = [0.0]
    sm, _ = _sm(now, err_hold_pct=10.0, err_hold_s=5.0)
    sm.on_grant(GrantEvent(852e6, tg=100, src=1))
    sm.on_voice_activity()
    sm.on_voice_errs(25.0)                  # ≥ 10% → hold until t=5
    now[0] = 2.0                            # past plain hangtime (1 s)
    sm.tick()
    assert sm.phase == TrunkPhase.TUNED
    now[0] = 5.5
    sm.tick()
    assert sm.phase == TrunkPhase.ON_CC


def test_audio_hold_windows():
    now = [0.0]
    sm, _ = _sm(now, voice_hold_s=1.0, mac_hold_s=3.0, ring_hold_s=2.0)
    from dsdneo_tpu.engine.trunk import GrantEvent
    sm.on_grant(GrantEvent(852e6, tg=100, src=1))
    sm.on_voice_activity()
    assert sm.audio_eligible()
    now[0] = 1.5                            # voice window expired
    assert not sm.audio_eligible()
    sm.on_mac_activity()                    # MAC keeps it open 3 s
    now[0] = 3.0
    assert sm.audio_eligible()
    now[0] = 5.0
    assert not sm.audio_eligible()
    sm.on_audio_out()                       # ring hold 2 s
    now[0] = 6.5
    assert sm.audio_eligible()


def test_cc_cache_enable_gates_load(tmp_path):
    import json

    from dsdneo_tpu.engine.trunk import TrunkSM
    p = tmp_path / "cc.json"
    p.write_text(json.dumps({"cc_candidates": [851e6, 852e6]}))
    sm = TrunkSM(lambda f, k: True, cc_cache_path=str(p))
    assert sm.cc_candidates == [851e6, 852e6]
    sm2 = TrunkSM(lambda f, k: True, cc_cache_path=str(p),
                  cc_cache_enable=False)
    assert sm2.cc_candidates == []


def test_kwargs_from_config_mode_select(tmp_path):
    from dsdneo_tpu.engine.trunk import TrunkSM
    cfg = _cfg(P25_GRANT_TIMEOUT="2", DMR_GRANT_TIMEOUT="7",
               CACHE_DIR=str(tmp_path))
    assert TrunkSM.kwargs_from_config(cfg, "p25p1")["grant_timeout_s"] == 2
    assert TrunkSM.kwargs_from_config(cfg, "dmr")["grant_timeout_s"] == 7
    # CACHE_DIR locates the historical cache file
    assert TrunkSM.kwargs_from_config(cfg, "p25p1")["cc_cache_path"] \
        .startswith(str(tmp_path))


# ---------------------------------------------------------------- preemption

def _follower(now):
    from types import SimpleNamespace

    from dsdneo_tpu.core.talkgroup import TalkgroupPolicy
    from dsdneo_tpu.engine.trunk import TrunkFollower, TrunkSM
    pol = TalkgroupPolicy()
    sm = TrunkSM(lambda f, k: True, hangtime_s=10.0, now_fn=lambda: now[0])
    sm.on_cc_activity(851e6)
    ctx = SimpleNamespace(state=SimpleNamespace(tg_policy=pol,
                                                iden_table=None))
    fol = TrunkFollower(sm, ctx, current_freq=lambda: 851e6)
    fol.preempt_min_dwell_s = 0.75
    fol.preempt_cooldown_s = 1.0
    return fol, pol, sm


def _grant_ev(tg, lpcn=0):
    from dsdneo_tpu.protocol.base import DecodeEvent
    return DecodeEvent(f"grant TG {tg}", "p25p1", 0,
                       {"grant": True, "tg": tg, "channel": 0x1001})


def test_priority_preemption_displaces_call():
    from dsdneo_tpu.core.talkgroup import GroupEntry
    from dsdneo_tpu.engine.trunk import IdenTable, TrunkPhase
    now = [0.0]
    fol, pol, sm = _follower(now)
    pol.groups[100] = GroupEntry(100, priority=10)
    pol.groups[200] = GroupEntry(200, priority=80, preempt=True)
    it = IdenTable()
    it.add(1, 851e6, 12500.0)
    fol.ctx.state.iden_table = it
    fol.on_event(_grant_ev(100))
    assert sm.phase == TrunkPhase.TUNED and sm.current_tg == 100
    now[0] = 0.5                            # dwell not yet satisfied
    fol.on_event(_grant_ev(200))
    assert sm.current_tg == 100
    now[0] = 1.0
    fol.on_event(_grant_ev(200))            # dwell ok → displaced
    assert sm.current_tg == 200
    assert fol.preemptions == 1
    # cooldown: an immediate second displacement attempt is refused
    pol.groups[300] = GroupEntry(300, priority=90, preempt=True)
    now[0] = 1.5
    fol.on_event(_grant_ev(300))
    assert sm.current_tg == 200


def test_preempt_requires_flag_and_higher_priority():
    from dsdneo_tpu.core.talkgroup import GroupEntry
    from dsdneo_tpu.engine.trunk import IdenTable, TrunkPhase
    now = [0.0]
    fol, pol, sm = _follower(now)
    pol.groups[100] = GroupEntry(100, priority=50)
    pol.groups[200] = GroupEntry(200, priority=80, preempt=False)
    pol.groups[300] = GroupEntry(300, priority=40, preempt=True)
    it = IdenTable()
    it.add(1, 851e6, 12500.0)
    fol.ctx.state.iden_table = it
    fol.on_event(_grant_ev(100))
    now[0] = 2.0
    fol.on_event(_grant_ev(200))            # higher prio, no preempt flag
    assert sm.current_tg == 100
    fol.on_event(_grant_ev(300))            # preempt flag, lower prio
    assert sm.current_tg == 100


def test_group_csv_extended_policy(tmp_path):
    from dsdneo_tpu.core.talkgroup import TalkgroupPolicy
    p = tmp_path / "groups.csv"
    p.write_text("id,mode,name,priority,preempt,audio,record,stream,tags\n"
                 "1201,A,Dispatch 1,80,true,on,on,on,primary\n"
                 "1202,A,Dispatch 2,40,false,on,off,on,secondary\n"
                 "1300-1310,A,Ops Range,10,false,on,on,on,wide\n"
                 "1400,B,Blocked,90,true,on,on,on,x\n")
    pol = TalkgroupPolicy()
    n = pol.import_group_csv(str(p))
    assert n == 4 + 10                      # range expands
    assert pol.priority(1201) == 80 and pol.preempts(1201)
    assert pol.priority(1202) == 40 and not pol.preempts(1202)
    assert not pol.groups[1202].record and pol.groups[1202].stream
    assert pol.priority(1305) == 10
    # B mode forces media off even with audio=on in the row
    assert not pol.groups[1400].audio and not pol.groups[1400].record


def test_group_csv_basic_header_ignores_policy_cols(tmp_path):
    from dsdneo_tpu.core.talkgroup import TalkgroupPolicy
    p = tmp_path / "groups.csv"
    p.write_text("DEC,Mode,Name,Tag\n1449,A,Fire Dispatch,Fire\n")
    pol = TalkgroupPolicy()
    assert pol.import_group_csv(str(p)) == 1
    assert pol.priority(1449) == 0 and not pol.preempts(1449)


# ---------------------------------------------------------------- auto-PPM

def test_auto_ppm_pwr_gate_blocks_training():
    from dsdneo_tpu.io.auto_ppm import AutoPpm
    calls = []
    ap = AutoPpm(calls.append, 851e6, snr_gate_db=0.0, train_blocks=2,
                 pwr_gate_db=-60.0)
    for _ in range(10):
        ap.update(5000.0, snr_db=20.0, pwr_db=-70.0)    # below pwr gate
    assert not calls
    for _ in range(10):
        ap.update(5000.0, snr_db=20.0, pwr_db=-50.0)
    assert calls                                         # now trains


def test_auto_ppm_zerolock_hz():
    from dsdneo_tpu.io.auto_ppm import AutoPpm
    calls = []
    ap = AutoPpm(calls.append, 851e6, snr_gate_db=0.0, train_blocks=2,
                 deadband_ppm=0.01, zerolock_hz=100.0, lock_blocks=3)
    # 60 Hz offset ≈ 0.07 ppm: outside the ppm deadband (0.01) but
    # inside the Hz lock guard → locks without ever stepping
    for _ in range(10):
        ap.update(60.0, snr_db=20.0)
    assert not calls and ap.locked


# ---------------------------------------------------------------- soft knobs

def test_soft_threshold_bounds_list_depth(monkeypatch):
    import dsdneo_tpu.fec.trellis as trellis
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    seen = {}
    orig = trellis.p25_12_decode_list

    def spy(bits, llr, max_candidates=trellis.MAX_CANDIDATES):
        seen["depth"] = max_candidates
        return orig(bits, llr, max_candidates)
    monkeypatch.setattr(trellis, "p25_12_decode_list", spy)
    bits = np.zeros(196, dtype=np.uint8)
    llr = np.full(196, 64, dtype=np.int64)

    C._config = C.RuntimeConfig(soft_erasure_threshold=16)
    try:
        P25P1Decoder._trellis_crc_select(bits, llr)
        assert seen["depth"] == 2
        # phase-specific override wins
        C._config = C.RuntimeConfig(soft_erasure_threshold=16,
                                    p25p1_soft_erasure_threshold=64)
        P25P1Decoder._trellis_crc_select(bits, llr)
        assert seen["depth"] == 8
    finally:
        C._config = None


def test_soft_hard_override_disabled_keeps_hard(monkeypatch):
    """With SOFT_HARD_OVERRIDE=0 a CRC-clean hard decode short-circuits
    the ranked list."""
    import dsdneo_tpu.fec.trellis as trellis
    from dsdneo_tpu.fec import crc as crcmod
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder, _bits_to_int

    # build a valid 96-bit payload (CRC16 appended) and encode it
    rng = np.random.default_rng(7)
    data80 = rng.integers(0, 2, 80).astype(np.uint8)
    c = crcmod.crc16_bits(data80, init=0, xorout=0xFFFF)
    data96 = np.concatenate([data80,
                             [(c >> (15 - i)) & 1 for i in range(16)]])
    bits196 = trellis.p25_12_encode(data96.astype(np.uint8))
    llr = (1 - 2 * bits196.astype(np.int64)) * 64
    called = []
    orig = trellis.p25_12_decode_list
    monkeypatch.setattr(trellis, "p25_12_decode_list",
                        lambda *a, **k: called.append(1) or orig(*a, **k))
    C._config = C.RuntimeConfig(p25_soft_hard_override=False)
    try:
        out = P25P1Decoder._trellis_crc_select(bits196, llr)
        assert np.array_equal(out, data96)
        assert not called            # list decoder never consulted
    finally:
        C._config = None


def test_p25p2_erasure_retry_recovers_parity_burst():
    """P25P2_SOFT_ERASURE_THRESHOLD erasure sweep recovers an ESS RS
    codeword whose damage is confined to the parity span."""
    from dsdneo_tpu.fec import rs as rsmod
    code = rsmod.rs_63_35()
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 64, 35).astype(np.int64)
    word = code.encode(msg)
    bad = word.copy()
    bad[35:50] = (bad[35:50] + 1) % 64        # 15 parity errors: > t=14
    dec, nerr = code.decode(bad, erasures=[])
    assert nerr < 0                            # plain decode fails
    ok = False
    for r in range(12):
        eras = list(range(35 + 2 * r, min(35 + 2 * r + 8, 63)))
        dec2, nerr2 = code.decode(bad, erasures=eras)
        if nerr2 >= 0 and np.array_equal(dec2[:35], msg):
            ok = True
            break
    assert ok


# ---------------------------------------------------------------- status gate

def test_status_dibit_classification():
    from types import SimpleNamespace

    from dsdneo_tpu.protocol.base import DecoderContext, DibitReader
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    ctx = DecoderContext()
    r = DibitReader(np.zeros(8, np.uint8), np.zeros(8, np.float32), 0)
    r.status_dibits = [1, 3, 3, 0, 2]
    P25P1Decoder._classify_status(r, ctx)
    assert ctx.state.p25_ss_classification == "infrastructure"
    r.status_dibits = [0, 0, 3]
    P25P1Decoder._classify_status(r, ctx)
    assert ctx.state.p25_ss_classification == "subscriber"
    r.status_dibits = [2, 2]
    P25P1Decoder._classify_status(r, ctx)
    assert ctx.state.p25_ss_classification == "unknown"


# ---------------------------------------------------------------- native/misc

def test_ftz_daz_native():
    from dsdneo_tpu.runtime.native import set_ftz_daz
    applied = set_ftz_daz(True)
    assert isinstance(applied, bool)
    if applied:                     # x86: denormals now flush to zero
        set_ftz_daz(False)


def test_fleet_mt_pool():
    from dsdneo_tpu.engine.fleet import FleetMonitor
    fm = FleetMonitor(workers=2)
    assert fm._pool is not None
    fm0 = FleetMonitor(workers=0)
    assert fm0._pool is None
