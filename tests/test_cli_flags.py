"""Round-3 CLI breadth: tune policy, enc lockout, probe, replay
shaping, relax-CRC, print-config (reference docs/cli.md flags)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)

FX = "/root/reference/tests/fixtures/iq/p25p1_c4fm_cc.iq.json"


def test_parser_accepts_new_flags():
    from dsdneo_tpu.cli import build_parser
    p = build_parser()
    a = p.parse_args(["-f1", "--iq-replay", "x", "-E", "-p", "-e",
                      "--enc-lockout", "-I", "123", "-W", "-F",
                      "-U", "4532", "--trunk-scan", "t.csv",
                      "--iq-loop", "3", "--iq-replay-rate", "2.0",
                      "--auto-ppm", "--input-volume", "0.5",
                      "--show-keys", "-t", "2.5",
                      "--p25-vc-grace", "2.0", "--p25-cc-grace", "7.0"])
    assert a.no_group_calls and a.no_private_calls and a.data_calls
    assert a.enc_lockout and a.tg_hold == 123 and a.whitelist
    assert a.relax_crc and a.rigctl_port == 4532
    assert a.iq_loop == 3 and a.iq_replay_rate == 2.0
    assert a.auto_ppm and a.input_volume == 0.5 and a.show_keys
    assert a.hangtime == 2.5
    assert a.p25_vc_grace == 2.0 and a.p25_cc_grace == 7.0


def test_probe_prints_mode_and_snr(capsys):
    from dsdneo_tpu import cli
    rc = cli.main(["--frontend", "none", "--probe", "--iq-replay", FX])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mode=p25p1" in out and "snr=" in out and "events=" in out


def test_print_config(capsys):
    from dsdneo_tpu import cli
    rc = cli.main(["--print-config", "--iq-replay", FX, "-f1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "perf_csv" in out or "frame_log" in out


def test_follower_tune_policy_gates():
    from dsdneo_tpu.engine.trunk import TrunkFollower, TrunkSM
    from dsdneo_tpu.protocol.base import DecodeEvent, DecoderContext

    from dsdneo_tpu.engine.trunk import ChannelMap
    tunes = []
    ctx = DecoderContext()
    sm = TrunkSM(tune=lambda f, why: tunes.append(f) or True)
    cm = ChannelMap()
    cm.entries[1] = 852e6
    fol = TrunkFollower(sm, ctx, chan_map=cm,
                        current_freq=lambda: 851e6)

    def grant(**fields):
        fields.setdefault("grant", True)
        fields.setdefault("channel", 1)
        return DecodeEvent("g", "p25p1", 0, fields)

    fol.tune_group = False
    fol.on_event(grant(tg=100))
    assert not tunes                      # group grants gated off
    fol.tune_group = True
    fol.on_event(grant(tg=100))
    assert len(tunes) == 1
    fol.tune_private = False
    fol.on_event(grant(tg=0, private=True))
    assert len(tunes) == 1                # private gated off
    fol.tune_data = False
    fol.on_event(grant(tg=7, data=True))
    assert len(tunes) == 1                # data gated off (default)


def test_follower_enc_lockout():
    from dsdneo_tpu.engine.trunk import TrunkFollower, TrunkSM
    from dsdneo_tpu.protocol.base import DecodeEvent, DecoderContext
    from dsdneo_tpu.engine.trunk import ChannelMap
    tunes = []
    ctx = DecoderContext()
    sm = TrunkSM(tune=lambda f, why: tunes.append(f) or True,
                 hangtime_s=0.0)
    cm = ChannelMap()
    cm.entries[1] = 852e6
    fol = TrunkFollower(sm, ctx, chan_map=cm,
                        current_freq=lambda: 851e6)
    fol.enc_lockout = True

    def grant(**fields):
        fields.setdefault("grant", True)
        fields.setdefault("channel", 1)
        return DecodeEvent("g", "p25p1", 0, fields)

    # encrypted grant (svc bit 0x40): locked out, not tuned
    fol.on_event(grant(tg=500, svc=0x40))
    assert not tunes and 500 in fol.enc_locked
    # subsequent clear-looking grants for the same TG stay locked
    fol.on_event(grant(tg=500, svc=0x00))
    assert not tunes and fol.enc_skips == 2
    # other TGs unaffected
    fol.on_event(grant(tg=501, svc=0x00))
    assert len(tunes) == 1
    fol.clear_enc_lockouts()
    assert not fol.enc_locked


def test_iq_loop_and_volume_stream(tmp_path):
    """--iq-loop replays the capture N times through the stream path;
    --input-volume scales the samples without losing decode."""
    from dsdneo_tpu import cli
    import contextlib, io as _io
    err = _io.StringIO()
    with contextlib.redirect_stderr(err):
        rc = cli.main(["--frontend", "none", "-f1", "--iq-replay", FX,
                       "-o", "null", "--stream", "0.25",
                       "--iq-loop", "2", "--input-volume", "0.7"])
    assert rc == 0
    text = err.getvalue()
    # two replay passes decode roughly twice the events of one
    assert text.count("NAC/CC: 140") >= 2


def test_relax_crc_state_attr():
    from dsdneo_tpu.cli import _state_attrs, build_parser
    a = build_parser().parse_args(["-f1", "--iq-replay", "x", "-F",
                                   "--show-keys"])
    attrs = _state_attrs(a, None, None)
    assert attrs.get("relax_crc") is True
    assert attrs.get("show_keys") is True


def test_tg_hold_builds_policy(tmp_path):
    """-I without -G creates a hold-only policy."""
    from dsdneo_tpu import cli
    import contextlib, io as _io
    err = _io.StringIO()
    with contextlib.redirect_stderr(err):
        rc = cli.main(["--frontend", "none", "-f1", "--iq-replay", FX,
                       "-o", "null", "-I", "999"])
    assert rc == 0


def test_env_knobs_for_round3_surface(monkeypatch):
    """DSD_NEO_* env knobs mirror the new flags (reference env parity;
    each knob shares its flag's consumer)."""
    from dsdneo_tpu.runtime import config as rtcfg
    env = {"DSD_NEO_ENC_LOCKOUT": "1", "DSD_NEO_AUTO_PPM": "1",
           "DSD_NEO_AUTO_PPM_SNR": "12.5", "DSD_NEO_INPUT_VOLUME": "0.5",
           "DSD_NEO_TRUNK_SCAN_DWELL_MS": "4500",
           "DSD_NEO_RDIO_API_URL": "http://x/api",
           "DSD_NEO_P25_VC_GRACE": "2.25", "DSD_NEO_SHOW_KEYS": "1",
           "DSD_NEO_RETUNE_MUTE_MS": "120",
           "DSD_NEO_SQUELCH_HOP_S": "0.8"}
    cfg = rtcfg.load_env(rtcfg.RuntimeConfig(), environ=env)
    assert cfg.enc_lockout and cfg.auto_ppm
    assert cfg.auto_ppm_snr == 12.5 and cfg.input_volume == 0.5
    assert cfg.trunk_scan_dwell_ms == 4500
    assert cfg.rdio_api_url == "http://x/api"
    assert cfg.p25_vc_grace_s == 2.25 and cfg.show_keys
    assert cfg.retune_mute_ms == 120 and cfg.squelch_hop_s == 0.8


def test_round3b_env_knobs(monkeypatch):
    """Second knob batch: SNR squelch, per-protocol hangtime, auto-PPM
    freeze, DC block, RTL AGC/bandwidth — each mapped with a consumer."""
    from dsdneo_tpu.runtime import config as rtcfg
    env = {"DSD_NEO_SNR_SQL_DB": "6.5", "DSD_NEO_P25_HANGTIME": "2.0",
           "DSD_NEO_DMR_HANGTIME": "3.0", "DSD_NEO_AUTO_PPM_FREEZE": "1",
           "DSD_NEO_AUTO_PPM_SNR_DB": "11", "DSD_NEO_IQ_DC_BLOCK": "1",
           "DSD_NEO_RTL_AGC": "1", "DSD_NEO_TUNER_BW_HZ": "12500"}
    cfg = rtcfg.load_env(rtcfg.RuntimeConfig(), environ=env)
    assert cfg.snr_sql_db == 6.5
    assert cfg.p25_hangtime_s == 2.0 and cfg.dmr_hangtime_s == 3.0
    assert cfg.auto_ppm_freeze and cfg.auto_ppm_snr == 11
    assert cfg.iq_dc_block and cfg.rtl_agc and cfg.tuner_bw_hz == 12500


def test_auto_ppm_freeze_blocks_corrections():
    from dsdneo_tpu.io.auto_ppm import AutoPpm
    calls = []
    p = AutoPpm(lambda v: calls.append(v), 851e6, snr_gate_db=0.0,
                train_blocks=1, freeze=True)
    for _ in range(20):
        assert not p.update(5000.0, 30.0)
    assert not calls


def test_live_snr_squelch_and_dc_block():
    import numpy as np
    from dsdneo_tpu.engine.live import LiveEngine
    eng = LiveEngine("p25p1", fs=48000.0, block_s=0.05,
                     retune_mute_s=0.0)
    eng.snr_squelch_db = 100.0          # impossible bar: always squelch
    eng.dc_block = True
    blank = bytes([200] * (2 * 9600))   # strong DC offset
    for _ in range(4):
        eng.feed_cu8(blank)
    n = eng.run(max_blocks=4)
    assert n >= 2
    # squelched blocks decode nothing (no events, no crash)
    assert not eng.decoder.ctx.events


def test_cli_fleet_mode(capsys):
    """--fleet runs mixed groups over the replay and reports per-group
    stats (the many-channel serving path from the CLI)."""
    from dsdneo_tpu import cli
    import contextlib, io as _io
    err = _io.StringIO()
    with contextlib.redirect_stderr(err):
        rc = cli.main(["--frontend", "none", "-f1", "--iq-replay", FX,
                       "--fleet", "p25p1:cc:2,p25p1:voice:2"])
    assert rc == 0
    text = err.getvalue()
    assert "group p25p1/cc x2:" in text
    assert "group p25p1/voice x2:" in text
    assert "TSDU" in text


def test_edacs_afs_split_and_scope():
    """AFS decomposition + call-scope predicates (reference
    edacs_afs.c, edacs-fme.c:141-152)."""
    from dsdneo_tpu.protocol.edacs.afs import AfsSplit
    sp = AfsSplit.parse("443")
    # default split: AA-FFS formatting
    assert sp.format(0b0010_0011_010) == "02-032"
    assert sp.is_agency_call(0b0101_0000_000)
    assert not sp.is_agency_call(0b0101_0001_000)
    assert sp.is_fleet_call(0b0101_0001_000)
    assert not sp.is_fleet_call(0b0101_0001_001)
    # custom 3:4:4 split: colon-separated, sum must stay 11
    sp2 = AfsSplit.parse("344")
    assert (sp2.a_bits, sp2.f_bits, sp2.s_bits) == (3, 4, 4)
    assert ":" in sp2.format(0b010_1100_0011)
    # invalid splits fall back to default (args.c:2158-2164)
    sp3 = AfsSplit.parse("999")
    assert (sp3.a_bits, sp3.f_bits, sp3.s_bits) == (4, 4, 3)


def test_edacs_mode_flag_family():
    """-fh/-fH/-fe/-fE semantics + fused AFS suffixes (args.c
    2125-2266)."""
    from dsdneo_tpu.cli import build_parser, _prescan_argv
    p = build_parser()
    a = p.parse_args(_prescan_argv(["-fH434", "--iq-replay", "x"]))
    assert a.edacs_variant == "std_esk" and a.edacs_afs == "434"
    a = p.parse_args(["-fe"])
    assert a.edacs_variant == "ea"
    a = p.parse_args(["-fE"])
    assert a.edacs_variant == "ea_esk"
    a = p.parse_args(_prescan_argv(["-fh344"]))
    assert a.mode == "edacs" and a.edacs_afs == "344"


def test_mode_flag_family_fr_ft_fA_fU():
    from dsdneo_tpu.cli import build_parser
    p = build_parser()
    a = p.parse_args(["-fr"])
    assert a.dmr_mono_mode
    a = p.parse_args(["-ft"])
    assert a.trunk_helper
    a = p.parse_args(["-fA"])
    assert a.analog_monitor
    a = p.parse_args(["-fU"])
    assert a.m17_udp_mode
