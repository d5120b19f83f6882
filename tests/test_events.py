"""Event-history depth: alert policy + event mask, the VOICE_END alert
held across a reacquisition window and drained by the watchdog sync,
epoch-keyed enrichment, revisioned incremental snapshots, reset.

Reference contracts: src/core/util/dsd_events.c +
include/dsd-neo/runtime/call_alert.h."""

import time

from dsdneo_tpu.core.events import (AlertEvent, AlertPolicy, CallEvent,
                                    CallKind, Category, EventHistory,
                                    Severity, normalize_alert_events)


def _voice(t, tg=100, slot=0, src=7):
    return CallEvent(when=t, protocol="p25p1", kind=CallKind.GROUP_VOICE,
                     slot=slot, tg=tg, src=src)


def _collect():
    fired = []
    return fired, lambda kind, ev: fired.append((kind, ev.tg))


def test_alert_mask_normalization():
    """call_alert.h: zero mask is the historical "all events" form."""
    assert normalize_alert_events(0) == int(AlertEvent.ALL)
    assert normalize_alert_events(int(AlertEvent.DATA)) == int(AlertEvent.DATA)
    assert normalize_alert_events(0xF8 | int(AlertEvent.VOICE_END)) \
        == int(AlertEvent.VOICE_END)          # unknown bits masked off
    p = AlertPolicy(enabled=False, events=int(AlertEvent.ALL))
    assert not p.wants(AlertEvent.VOICE_START)   # disabled wins
    p = AlertPolicy(enabled=True, events=0)
    assert p.wants(AlertEvent.DATA)              # zero mask = all


def test_voice_start_alert_fires_per_policy():
    fired, cb = _collect()
    h = EventHistory(alert_policy=AlertPolicy(
        enabled=True, events=int(AlertEvent.VOICE_START)), on_alert=cb)
    h.begin_call(_voice(time.time()))
    assert fired == [("voice_start", 100)]
    # same call keying again: no duplicate start alert
    h.begin_call(_voice(time.time()))
    assert len(fired) == 1


def test_end_alert_held_through_reacquisition():
    """A quickly reacquired transmission retracts its pending VOICE_END
    alert and merges into the previous row (dsd_events.c:381-392)."""
    fired, cb = _collect()
    h = EventHistory(alert_policy=AlertPolicy(enabled=True),
                     on_alert=cb, reacquire_window_s=1.0)
    t = 1000.0
    ev = h.begin_call(_voice(t))
    h.end_call(0, when=t + 2.0)
    assert fired == [("voice_start", 100)]       # end still held
    # reacquisition inside the window: same row continues, alert gone
    row = h.begin_call(_voice(t + 2.5))
    assert row is ev and row.ended is None
    h.sync(now=t + 10.0)
    assert [k for k, _ in fired] == ["voice_start"]
    # final end: watchdog sync drains it once the window elapses
    h.end_call(0, when=t + 5.0)
    h.sync(now=t + 5.5)                          # window not yet over
    assert [k for k, _ in fired] == ["voice_start"]
    h.sync(now=t + 6.1)
    assert [k for k, _ in fired] == ["voice_start", "voice_end"]
    # only one history row for the whole reacquired transmission
    assert len(h.snapshot(0)) == 1


def test_flush_pending_alerts_on_close():
    """An end armed just before exit must still be heard
    (dsd_event_flush_pending_alerts)."""
    fired, cb = _collect()
    h = EventHistory(alert_policy=AlertPolicy(
        enabled=True, events=int(AlertEvent.VOICE_END)), on_alert=cb)
    h.begin_call(_voice(time.time()))
    h.close()                                    # end + flush
    assert fired == [("voice_end", 100)]


def test_data_notice_category_contract():
    """Only DATA and CONTROL are accepted; invalid categories are
    rejected without changing history."""
    fired, cb = _collect()
    h = EventHistory(alert_policy=AlertPolicy(
        enabled=True, events=int(AlertEvent.DATA)), on_alert=cb)
    assert h.data_notice(0, "pdu", category=Category.DATA)
    assert h.data_notice(0, "tsbk", category=Category.CONTROL)
    assert not h.data_notice(0, "bad", category=Category.STATUS)
    assert not h.data_notice(0, "bad", category=Category.VOICE)
    assert len(h.snapshot(0)) == 2
    assert [k for k, _ in fired] == ["data", "data"]
    h.system_notice(0, "tuner restarted")
    assert h.snapshot(0)[-1].category == Category.SYSTEM


def test_enrichment_keyed_by_epoch():
    """Alias/GPS decode after the grant; they attach to the row whose
    epoch keyed them, not whatever is active now."""
    h = EventHistory()
    a = h.begin_call(_voice(1000.0, tg=1))
    h.end_call(0, when=1001.0)
    b = h.begin_call(_voice(1002.0, tg=2))
    assert a.epoch != b.epoch
    assert h.enrich_alias(0, a.epoch, "ENGINE 5")
    assert h.enrich_gps(0, b.epoch, "47.6 -122.3")
    assert h.enrich_text(0, b.epoch, "emergency")
    assert not h.enrich_alias(0, 9999, "nope")
    snap = h.snapshot(0)
    assert snap[0].alias == "ENGINE 5" and snap[0].gps == ""
    assert snap[1].gps == "47.6 -122.3" and "emergency" in snap[1].text


def test_incremental_snapshot_revision_gating():
    """Telemetry copies only slots whose revision moved
    (dsd_event_state_copy_snapshot_incremental)."""
    h = EventHistory(slots=2)
    h.begin_call(_voice(1000.0, slot=0))
    out, revs = h.snapshot_incremental()
    assert 0 in out and 1 in out                 # first copy: all slots
    out2, revs2 = h.snapshot_incremental(known=revs)
    assert out2 == {}                            # nothing changed
    h.begin_call(_voice(1001.0, tg=5, slot=1))
    out3, revs3 = h.snapshot_incremental(known=revs2)
    assert list(out3) == [1]                     # only slot 1 moved
    out4, _ = h.snapshot_incremental(known=revs3, force=True)
    assert set(out4) == {0, 1}                   # force copies all
    # snapshots are copies: mutating them does not touch history
    out4[1][0].tg = 777
    assert h.snapshot(1)[0].tg == 5


def test_reset_clears_rows_and_pending_alerts():
    fired, cb = _collect()
    h = EventHistory(alert_policy=AlertPolicy(enabled=True), on_alert=cb)
    h.begin_call(_voice(1000.0))
    h.end_call(0, when=1001.0)                   # end alert pending
    _, revs = h.snapshot_incremental()
    h.reset()
    h.sync(now=2000.0)
    assert [k for k, _ in fired] == ["voice_start"]   # pending died
    assert h.snapshot(0) == []
    out, _ = h.snapshot_incremental(known=revs)
    assert 0 in out                              # reset bumped revisions


def test_nonfinalizing_end_skips_alert():
    """final=False commits the row without arming the end alert
    (dsd_event_emit_call_notice_nonfinalizing)."""
    fired, cb = _collect()
    h = EventHistory(alert_policy=AlertPolicy(
        enabled=True, events=int(AlertEvent.VOICE_END)), on_alert=cb)
    h.begin_call(_voice(1000.0))
    h.end_call(0, when=1001.0, final=False)
    h.sync(now=2000.0)
    h.flush_pending_alerts()
    assert fired == []


def test_log_writer_carries_category_and_enrichment(tmp_path):
    log = tmp_path / "ev.log"
    h = EventHistory(log_path=str(log))
    ev = h.begin_call(_voice(time.time(), tg=42))
    h.enrich_alias(0, ev.epoch, "LADDER 9")
    h.end_call(0)
    h.data_notice(0, "lrrp", gps="10 20")
    h.close()
    text = log.read_text()
    assert "cat=VOICE" in text and "TG=42" in text
    assert "ALIAS=LADDER 9" in text              # END line after enrich
    assert "cat=DATA" in text and "GPS=10 20" in text


def test_alert_events_from_str():
    from dsdneo_tpu.core.events import alert_events_from_str
    assert alert_events_from_str("") == int(AlertEvent.ALL)
    assert alert_events_from_str("all") == int(AlertEvent.ALL)
    assert alert_events_from_str("start") == int(AlertEvent.VOICE_START)
    assert alert_events_from_str("start,end") == int(
        AlertEvent.VOICE_START | AlertEvent.VOICE_END)
    assert alert_events_from_str("data, end") == int(
        AlertEvent.DATA | AlertEvent.VOICE_END)
    assert alert_events_from_str("bogus") == int(AlertEvent.ALL)


def test_cli_alert_mask_consumed():
    """-a beep honors DSD_NEO_CALL_ALERT_EVENTS via _call_alert_wants."""
    from dsdneo_tpu.cli import _call_alert_wants
    from dsdneo_tpu.runtime import config as C

    class _Ev:
        def __init__(self, line, **fields):
            self.line = line
            self.fields = fields

    grant = _Ev("Group Voice Grant", grant=True, tg=100)
    end = _Ev("Call End", release=True)
    data = _Ev("Data PDU header")
    old = C._config
    try:
        C._config = C.RuntimeConfig(call_alert_events="start")
        assert _call_alert_wants(grant)
        assert not _call_alert_wants(end)
        assert not _call_alert_wants(data)
        C._config = C.RuntimeConfig(call_alert_events="end,data")
        assert not _call_alert_wants(grant)
        assert _call_alert_wants(end)
        assert _call_alert_wants(data)
        C._config = C.RuntimeConfig()           # default: all
        assert _call_alert_wants(grant) and _call_alert_wants(end)
    finally:
        C._config = old


def test_history_adapter_enriches_alias_and_gps():
    """ui.panes.history_from_events attaches alias/GPS lines to the
    active call row and the pane renders them."""
    from dsdneo_tpu.ui import panes

    class _Ev:
        def __init__(self, line, pos=0, protocol="dmr", **fields):
            self.line = line
            self.pos = pos
            self.protocol = protocol
            self.fields = fields

    evs = [
        _Ev("Group Voice Grant", pos=0, grant=True, tg=9, src=3, slot=1),
        _Ev(" Slot 2 - Talker Alias LC Header; Format 0; "
            "Talker Alias: LADDER 9", pos=10, slot=1),
        _Ev(" Harris GPS: 47.600000, -122.300000;", pos=20, slot=1),
        _Ev("Call End", pos=30, release=True, slot=1),
    ]
    h = panes.history_from_events(evs, fs_sym=1.0, t0=0.0)
    snap = h.snapshot(1)
    assert len(snap) == 1
    assert snap[0].alias == "LADDER 9"
    assert snap[0].gps.startswith("47.6")
    rows = panes.call_history_rows(h, width=120, slot=1, now=40.0)
    assert any("LADDER 9" in r and "@47.6" in r for r in rows)
