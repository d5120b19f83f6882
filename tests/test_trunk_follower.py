"""TrunkFollower: decode events → TrunkSM (grant resolve/tune,
release, hangtime, CC activity) — the live-engine trunk glue
(reference engine.c p25_sm_event wiring)."""

from types import SimpleNamespace

import numpy as np

from dsdneo_tpu.protocol.base import DecodeEvent, DecoderContext
from dsdneo_tpu.engine.trunk import (ChannelMap, TrunkFollower, TrunkPhase,
                                     TrunkSM)


def _ev(protocol="p25p1", **fields):
    return DecodeEvent("x", protocol, 0, fields)


def _follower(clock, chan_map=None, iden=False, policy=None):
    tunes = []
    sm = TrunkSM(lambda f, kind: tunes.append((f, kind)) or True,
                 hangtime_s=1.0, vc_grace_s=0.5, now_fn=lambda: clock[0],
                 policy=policy)
    ctx = DecoderContext()
    if iden:
        from dsdneo_tpu.engine.trunk import IdenTable
        t = IdenTable()
        t.add(1, 851_000_000.0, 12500.0, 0.0, 1)
        ctx.state.iden_table = t
    fo = TrunkFollower(sm, ctx, chan_map=chan_map,
                       current_freq=lambda: 852_000_000.0)
    return fo, tunes


def test_grant_via_iden_table_tunes():
    clock = [0.0]
    fo, tunes = _follower(clock, iden=True)
    fo.on_event(_ev())                       # CC frame → ON_CC
    assert fo.sm.phase == TrunkPhase.ON_CC
    fo.on_event(_ev(grant=True, channel=0x100A, tg=100, src=7))
    assert fo.sm.phase == TrunkPhase.TUNED
    assert tunes[-1] == (851_000_000.0 + 10 * 12500.0, "voice")
    assert fo.sm.current_tg == 100 and fo.grants == 1


def test_grant_via_channel_map_lpcn():
    clock = [0.0]
    m = ChannelMap()
    m.entries[17] = 456_000_000.0
    fo, tunes = _follower(clock, chan_map=m)
    fo.on_event(_ev("dmr"))
    fo.on_event(_ev("dmr", grant=True, lpcn=17, tg=300, src=1))
    assert fo.sm.phase == TrunkPhase.TUNED
    assert tunes[-1] == (456_000_000.0, "voice")


def test_release_returns_to_cc():
    clock = [0.0]
    fo, tunes = _follower(clock, iden=True)
    fo.on_event(_ev())
    fo.on_event(_ev(grant=True, channel=0x1001, tg=5))
    fo.on_event(_ev(release=True))
    assert fo.sm.phase == TrunkPhase.ON_CC
    assert tunes[-1] == (852_000_000.0, "cc")
    assert fo.releases == 1


def test_hangtime_returns_to_cc():
    clock = [0.0]
    fo, tunes = _follower(clock, iden=True)
    fo.on_event(_ev())
    fo.on_event(_ev(grant=True, channel=0x1001, tg=5))
    clock[0] = 0.4
    fo.on_event(_ev())                        # voice activity while TUNED
    clock[0] = 0.9
    fo.tick()
    assert fo.sm.phase == TrunkPhase.TUNED    # still in grace/hangtime
    clock[0] = 2.5
    fo.tick()
    assert fo.sm.phase == TrunkPhase.ON_CC


def test_policy_blocks_grant():
    clock = [0.0]
    fo, tunes = _follower(clock, iden=True, policy=lambda tg: tg != 666)
    fo.on_event(_ev())
    fo.on_event(_ev(grant=True, channel=0x1001, tg=666))
    assert fo.sm.phase == TrunkPhase.ON_CC and fo.grants == 0
    fo.on_event(_ev(grant=True, channel=0x1001, tg=5))
    assert fo.sm.phase == TrunkPhase.TUNED


def test_unresolvable_grant_ignored():
    clock = [0.0]
    fo, tunes = _follower(clock)              # no iden table, no map
    fo.on_event(_ev(grant=True, channel=0x1001, tg=5))
    # the grant anchors the CC (we must be camped on one to decode it)
    # but resolves no frequency, so no tune is dispatched
    assert fo.sm.phase == TrunkPhase.ON_CC and not tunes
    assert fo.sm.cc_freq == 852_000_000.0


def test_live_engine_integration():
    """LiveEngine drives the follower per event and ticks the SM."""
    from dsdneo_tpu.engine.live import LiveEngine
    clock = [0.0]
    eng = LiveEngine("p25p1", block_s=0.25)
    fo, tunes = _follower(clock, iden=True)
    fo.current_freq = lambda: eng.freq_hz
    eng.freq_hz = 853_000_000.0
    eng.trunk = fo
    # inject events through the decoder's ctx as if decoded, then run
    # one silent block to exercise the dispatch path
    rng = np.random.default_rng(0)
    eng.feed_cu8((rng.integers(100, 156, 24000)
                  .astype(np.uint8)).tobytes())
    eng.run(max_blocks=1)
    # no sync in noise → no events; follower untouched but tick ran
    assert fo.sm.phase == TrunkPhase.IDLE


def test_sm_decision_log(tmp_path):
    """TrunkSM appends phase transitions to the decision log file
    (reference --p25-sm-log)."""
    clock = [0.0]
    fo, tunes = _follower(clock, iden=True)
    fo.sm.log_path = str(tmp_path / "sm.log")
    fo.on_event(_ev())
    fo.on_event(_ev(grant=True, channel=0x1001, tg=5))
    fo.on_event(_ev(release=True))
    text = (tmp_path / "sm.log").read_text()
    assert "ON_CC" in text and "TUNED TG 5" in text and "CC (release" in text
