"""Host runtime tests: config precedence, trunking SM, events,
talkgroup policy, crypto keystreams."""

import time

import numpy as np
import pytest


def test_config_precedence(tmp_path):
    from dsdneo_tpu.runtime import config as C
    ini = tmp_path / "u.ini"
    ini.write_text("[dsdneo]\nlog_level = debug\ntrunk_hangtime_s = 2.5\n")
    cfg = C.load_ini(str(ini))
    assert cfg.log_level == "debug" and cfg.trunk_hangtime_s == 2.5
    cfg = C.load_env(cfg, environ={"DSD_NEO_LOG_LEVEL": "warning"})
    assert cfg.log_level == "warning"
    cfg = cfg.with_overrides(log_level="error")
    assert cfg.log_level == "error"
    # INI include chain
    base = tmp_path / "base.ini"
    base.write_text("[dsdneo]\nchannels = 8\n")
    child = tmp_path / "child.ini"
    child.write_text(f"[dsdneo]\ninclude = base.ini\nlog_level = notice\n")
    cfg2 = C.load_ini(str(child))
    assert cfg2.channels == 8 and cfg2.log_level == "notice"


def test_config_ini_roundtrip(tmp_path):
    from dsdneo_tpu.runtime import config as C
    cfg = C.RuntimeConfig(channels=16, trunk_enable=True)
    p = tmp_path / "save.ini"
    C.save_ini(cfg, str(p))
    cfg2 = C.load_ini(str(p))
    assert cfg2.channels == 16 and cfg2.trunk_enable is True


def test_trunk_sm_grant_hangtime_and_hunt():
    from dsdneo_tpu.engine.trunk import GrantEvent, TrunkPhase, TrunkSM
    clock = [0.0]
    tunes = []
    sm = TrunkSM(tune=lambda f, why: tunes.append((f, why)) or True,
                 hangtime_s=1.0, vc_grace_s=0.5, cc_timeout_s=2.0,
                 now_fn=lambda: clock[0])
    sm.on_cc_activity(851e6)
    assert sm.phase == TrunkPhase.ON_CC
    assert sm.on_grant(GrantEvent(freq_hz=852e6, tg=100, src=1))
    assert sm.phase == TrunkPhase.TUNED
    # voice active → stays tuned
    clock[0] = 1.0
    sm.on_voice_activity()
    sm.tick()
    assert sm.phase == TrunkPhase.TUNED
    # hangtime expires → back to CC
    clock[0] = 3.0
    sm.tick()
    assert sm.phase == TrunkPhase.ON_CC
    assert tunes[-1] == (851e6, "cc")
    # CC silence → hunting rotates candidates
    clock[0] = 10.0
    sm.tick()
    assert sm.phase == TrunkPhase.HUNTING
    sm.tick()
    assert tunes[-1][1] == "cc"


def test_trunk_sm_policy_block():
    from dsdneo_tpu.engine.trunk import GrantEvent, TrunkSM
    sm = TrunkSM(tune=lambda f, why: True, policy=lambda tg: tg != 666)
    sm.on_cc_activity(851e6)
    assert not sm.on_grant(GrantEvent(freq_hz=852e6, tg=666, src=1))
    assert sm.on_grant(GrantEvent(freq_hz=852e6, tg=1, src=1))


def test_iden_table_channel_math():
    from dsdneo_tpu.engine.trunk import IdenTable
    t = IdenTable()
    t.add(1, 851_000_000, 12_500, tdma_slots=2)
    assert t.channel_to_freq((1 << 12) | 10) == 851_000_000 + 5 * 12_500
    assert t.channel_to_slot((1 << 12) | 11) == 1
    assert t.channel_to_freq((2 << 12) | 1) is None


def test_talkgroup_policy(tmp_path):
    from dsdneo_tpu.core.talkgroup import TalkgroupPolicy
    csv_path = tmp_path / "group.csv"
    csv_path.write_text("TG,Mode,Label\n100,A,Fire\n200,B,Blocked\n300,DE,PD\n")
    pol = TalkgroupPolicy()
    assert pol.import_group_csv(str(csv_path)) == 3
    assert pol.allows(100)
    assert not pol.allows(200)
    assert pol.allows(300, encrypted=False)
    assert not pol.allows(300, encrypted=True)
    pol.hold(0, 100)
    assert not pol.allows(300, slot=0)
    pol.release_hold(0)
    assert pol.label(100) == "Fire"


def test_event_history(tmp_path):
    from dsdneo_tpu.core.events import CallEvent, CallKind, EventHistory
    log = tmp_path / "events.log"
    h = EventHistory(capacity=4, log_path=str(log))
    ev = CallEvent(when=time.time(), protocol="p25p1",
                   kind=CallKind.GROUP_VOICE, tg=100, src=42)
    h.begin_call(ev)
    h.end_call(0)
    h.note(0, "CC seen")
    snap = h.snapshot(0)
    assert len(snap) == 2
    h.close()
    text = log.read_text()
    assert "TG=100" in text and "START" in text and "END" in text


def test_crypto_keystreams():
    from dsdneo_tpu.crypto import keystream as K
    # RC4 vector (key "Key" → keystream EB9F7781B734CA72A719)
    ks = K.rc4_keystream(b"Key", 10)
    assert bytes(ks).hex().upper() == "EB9F7781B734CA72A719"
    # DES known vector: key 0x133457799BBCDFF1, plaintext 0x0123456789ABCDEF
    ct = K.des_encrypt_block(0x0123456789ABCDEF, 0x133457799BBCDFF1)
    assert ct == 0x85E813540F0AB405
    # AES-128 FIPS-197 vector
    ct = K.aes_encrypt_block(bytes.fromhex("00112233445566778899aabbccddeeff"),
                             bytes.fromhex("000102030405060708090a0b0c0d0e0f"))
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    # AES-256 FIPS-197 vector
    ct = K.aes_encrypt_block(
        bytes.fromhex("00112233445566778899aabbccddeeff"),
        bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                      "101112131415161718191a1b1c1d1e1f"))
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    # DMR BP keystream: 48-bit pattern ((k&0xFF0F)<<32)|(k<<16)|k from the
    # published key table, bit 48 untouched (crypt-etc.c frame49 apply)
    ks = K.dmr_basic_keystream(1)
    k = K.DMR_BP_KEYS[1]
    assert k == 0x1F00
    patt = ((k & 0xFF0F) << 32) | (k << 16) | k
    expect = [(patt >> (47 - j)) & 1 for j in range(48)] + [0]
    assert list(ks) == expect
    # the masked nibble differs from a naive 16-bit repeat for keys with
    # bits 4-7 set in the first repeat
    k129 = K.DMR_BP_KEYS[129]
    ks129 = K.dmr_basic_keystream(129)
    naive_first16 = [(k129 >> (15 - j)) & 1 for j in range(16)]
    assert list(ks129[:16]) != naive_first16
    # out-of-range IDs are all-zero passthrough
    assert not K.dmr_basic_keystream(0).any()
    assert not K.dmr_basic_keystream(256).any()


def test_perf_probe(tmp_path):
    from dsdneo_tpu.runtime.log import PerfProbe
    p = tmp_path / "perf.csv"
    probe = PerfProbe(str(p), interval_s=0.0)
    probe.add(device_ms=1.5, channels=8, symbols=100)
    probe.add(device_ms=2.0, channels=8, symbols=100)
    probe.close()
    text = p.read_text()
    assert "device_ms" in text and len(text.splitlines()) >= 2


def test_ui_visualizers_render():
    import numpy as np
    from dsdneo_tpu.ui.terminal import (_constellation_rows, _eye_rows,
                                        _histogram_rows, _spectrum_rows)
    rng = np.random.default_rng(0)
    soft = np.concatenate([rng.normal(lv, 0.2, 400) for lv in (-3, -1, 1, 3)])
    h = _histogram_rows(soft, 64)
    assert len(h) == 7 and any("#" in r for r in h)
    # 4-level histogram: bottom row has 4 separate clusters
    assert len([g for g in "".join(
        "1" if c == "#" else "0" for c in h[-1]).split("0") if g]) >= 4
    z = (np.exp(1j * (np.pi / 4 + np.pi / 2 * rng.integers(0, 4, 2048)))
         + 0.05 * (rng.normal(size=2048) + 1j * rng.normal(size=2048)))
    c = _constellation_rows(z.astype(np.complex64), 40)
    assert len(c) == 7 and any("#" in r or "*" in r for r in c)
    t = np.arange(4096)
    sig = np.exp(2j * np.pi * 0.11 * t).astype(np.complex64)
    s = _spectrum_rows(sig, 64)
    assert len(s) == 7 and "|" in s[0]


def test_cc_cache_roundtrip(tmp_path):
    """DSD_NEO_P25_CC_CACHE equivalent: candidates persist across SM
    instances (reference p25_cc_candidates.c disk cache)."""
    from dsdneo_tpu.engine.trunk import TrunkSM
    cache = str(tmp_path / "cc.json")
    sm = TrunkSM(tune=lambda f, why: True, cc_cache_path=cache)
    sm.on_cc_activity(851_000_000.0)
    sm.on_cc_activity(852_500_000.0)
    sm2 = TrunkSM(tune=lambda f, why: True, cc_cache_path=cache)
    assert 851_000_000.0 in sm2.cc_candidates
    assert 852_500_000.0 in sm2.cc_candidates


def test_frame_log_and_pdu_json(tmp_path, monkeypatch):
    """--frame-log writes per-frame lines; DSD_NEO_PDU_JSON upgrades
    them to JSON objects with decoded fields."""
    import json
    from dsdneo_tpu import cli

    fx = "/root/reference/tests/fixtures/iq/p25p1_c4fm_cc.iq.json"
    log = tmp_path / "frames.log"
    rc = cli.main(["--frontend", "none", "-f1", "--iq-replay", fx,
                   "-o", "null", "--frame-log", str(log)])
    assert rc == 0
    text = log.read_text().splitlines()
    assert any("NAC/CC: 140" in ln for ln in text)
    assert all(ln.split("\t")[1] == "p25p1" for ln in text if "\t" in ln)

    logj = tmp_path / "frames.jsonl"
    monkeypatch.setenv("DSD_NEO_PDU_JSON", "1")
    rc = cli.main(["--frontend", "none", "-f1", "--iq-replay", fx,
                   "-o", "null", "--frame-log", str(logj)])
    assert rc == 0
    rows = [json.loads(ln) for ln in logj.read_text().splitlines()]
    assert rows and all(r["protocol"] == "p25p1" for r in rows)
    assert any(r.get("fields", {}).get("nac") == 0x140 for r in rows)


def test_perf_csv_knob(tmp_path):
    """--perf-csv / DSD_NEO_RTL_PERF_CSV writes per-step timing rows."""
    from dsdneo_tpu import cli
    fx = "/root/reference/tests/fixtures/iq/p25p1_c4fm_cc.iq.json"
    p = tmp_path / "perf.csv"
    rc = cli.main(["--frontend", "none", "-f1", "--iq-replay", fx,
                   "-o", "null", "--stream", "0.25", "--perf-csv", str(p)])
    assert rc == 0
    lines = p.read_text().splitlines()
    assert lines[0].startswith("ts,")
    assert len(lines) >= 2


def test_sync_calibration_warmstart(tmp_path):
    """DSD_NEO_SYNC_WARMSTART: learned sync medians persist and derive a
    warm-start threshold (reference sync_calibration.c)."""
    from dsdneo_tpu.runtime.calibration import SyncCalibration
    path = str(tmp_path / "cal.json")
    cal = SyncCalibration(path)
    assert cal.threshold_for("p25p1", 0.62) == 0.62   # no data yet
    cal.record("p25p1", [0.80, 0.85, 0.90])
    cal.save()
    cal2 = SyncCalibration(path)
    warm = cal2.threshold_for("p25p1", 0.62)
    assert 0.62 <= warm <= 0.85 * 0.86
    # blending across runs
    cal2.record("p25p1", [0.7])
    assert cal2.data["p25p1"]["runs"] == 2


def test_cli_sync_warmstart_and_config_autosave(tmp_path, monkeypatch):
    from dsdneo_tpu import cli
    from dsdneo_tpu.runtime import config as C
    fx = "/root/reference/tests/fixtures/iq/p25p1_c4fm_cc.iq.json"
    cal = tmp_path / "cal.json"
    ini = tmp_path / "user.ini"
    ini.write_text("[dsdneo]\nlog_level = debug\n")
    monkeypatch.setenv("DSD_NEO_SYNC_WARMSTART", "1")
    monkeypatch.setenv("DSD_NEO_SYNC_CAL_PATH", str(cal))
    monkeypatch.setenv("DSD_NEO_CONFIG_AUTOSAVE", "1")
    rc = cli.main(["--frontend", "none", "-f1", "--iq-replay", fx,
                   "-o", "null", "--config", str(ini)])
    assert rc == 0
    assert cal.exists()                      # calibration persisted
    cfg = C.load_ini(str(ini))               # autosaved INI still loads
    assert cfg.log_level == "debug"


def test_bootstrap_wizard_flow(monkeypatch, tmp_path):
    from dsdneo_tpu.runtime.wizard import run_wizard
    answers = iter(["4", "", "wav:/tmp/x.wav", "0.5"])
    w = run_wizard(lambda p, d: next(answers))
    assert w.mode == "dmr" and w.audio_out == "wav:/tmp/x.wav"
    assert w.stream_s == 0.5
    # defaults survive junk
    answers = iter(["zzz", "cap.iq", "", "junk"])
    w = run_wizard(lambda p, d: next(answers))
    assert w.mode == "auto" and w.iq_replay == "cap.iq"
    assert w.audio_out == "null" and w.stream_s == 0.0

    # end-to-end through the CLI with stdin answers
    import io
    import sys as _sys
    from dsdneo_tpu import cli
    fx = "/root/reference/tests/fixtures/iq/p25p1_c4fm_cc.iq.json"
    monkeypatch.setattr("builtins.input",
                        lambda prompt="": {0: "2"}.get(0) if False else next(ans))
    ans = iter(["2", fx, "null", "0"])
    rc = cli.main(["--frontend", "none", "--wizard", "-o", "null"])
    assert rc == 0


def test_ini_profiles_and_validation(tmp_path):
    """[profile:<name>] sections layer over [dsdneo]; validation
    reports unknown keys, bad values, and missing profiles (reference
    docs/config-system.md profile/include/validation)."""
    from dsdneo_tpu.runtime import config as rtcfg
    ini = tmp_path / "user.ini"
    ini.write_text("""
[dsdneo]
sync_threshold = 0.5
pdu_json = 0

[profile:hot]
sync_threshold = 0.9
pdu_json = 1
""")
    base = rtcfg.load_ini(str(ini))
    assert abs(base.sync_threshold - 0.5) < 1e-9 and not base.pdu_json
    hot = rtcfg.load_ini(str(ini), profile="hot")
    assert abs(hot.sync_threshold - 0.9) < 1e-9 and hot.pdu_json

    bad = tmp_path / "bad.ini"
    bad.write_text("""
[dsdneo]
sync_threshold = not-a-float
no_such_knob = 1
""")
    errs = rtcfg.validate_ini(str(bad))
    assert any("bad value" in e for e in errs)
    assert any("unknown key" in e for e in errs)
    assert rtcfg.validate_ini(str(ini), profile="nope")
    assert not rtcfg.validate_ini(str(ini), profile="hot")


def test_rt_sched_policy_graceful():
    """DSD_NEO_RT_SCHED / DSD_NEO_CPU_AFFINITY (reference rt_sched.cpp):
    parsing, application attempt, graceful degradation without
    privileges."""
    from dsdneo_tpu.runtime.rt_sched import apply_rt_policy, parse_cpu_list
    assert parse_cpu_list("0,2-3,7") == {0, 2, 3, 7}
    assert parse_cpu_list("") == set()
    assert parse_cpu_list("bad,1") == {1}
    rep = apply_rt_policy({"DSD_NEO_RT_SCHED": "1",
                           "DSD_NEO_RT_PRIO": "5",
                           "DSD_NEO_CPU_AFFINITY": "0"})
    assert rep["rt_requested"]
    # applied OR gracefully reported (no exception either way)
    assert rep["rt_applied"] or rep["errors"]
    assert rep["affinity_requested"] == {0}
    rep2 = apply_rt_policy({})
    assert not rep2["rt_requested"] and not rep2["errors"]


def test_live_metrics_visualizer_buffers():
    """The live loop publishes decimated spectrum + eye buffers for the
    terminal visualizers (reference rtl_metrics snapshots)."""
    import numpy as np
    from dsdneo_tpu.engine.live import LiveEngine
    eng = LiveEngine("p25p1", fs=48000.0, block_s=0.1)
    rng = np.random.default_rng(0)
    data = (rng.integers(0, 256, 2 * 48000)).astype(np.uint8).tobytes()
    eng.feed_cu8(data)
    eng.run(max_blocks=3)
    snap = eng.metrics.snapshot()
    assert snap.spectrum_db.size > 0
    assert hasattr(eng, "rt_report")
