"""Terminal panes: call history, channel grid, trunking status
(reference ncurses printer panes, rendered headless)."""

import numpy as np

from dsdneo_tpu.core.events import CallEvent, CallKind, EventHistory
from dsdneo_tpu.ui import panes


def test_call_history_rows():
    h = EventHistory(slots=2)
    ev = h.begin_call(CallEvent(1000.0, "p25p1", CallKind.GROUP_VOICE,
                                slot=0, tg=1234, src=567890,
                                text="ALG 84"))
    h.end_call(0, when=1004.2)
    h.begin_call(CallEvent(1010.0, "p25p1", CallKind.ENCRYPTED,
                           slot=1, tg=99, src=42))
    rows = panes.call_history_rows(h, width=78, now=1012.0)
    assert rows[0].lstrip().startswith("TIME")
    body = "\n".join(rows[1:])
    assert "1234" in body and "567890" in body and "ALG 84" in body
    assert "Group" in body and "Enc" in body
    assert " 4.2s" in body          # ended call duration
    assert all(len(r) <= 78 for r in rows)


def test_channel_grid_rows():
    chans = [{"id": i, "freq_hz": 851e6 + i * 12500,
              "state": ("voice" if i % 7 == 3 else
                        "cc" if i == 0 else "idle"),
              "tg": 4000 + i if i % 7 == 3 else 0}
             for i in range(24)]
    rows = panes.channel_grid_rows(chans, width=80)
    text = "\n".join(rows)
    assert "V" in text and "C" in text and "." in text
    assert "851.0375" in text         # channel 3 frequency
    assert "4003" in text             # its talkgroup
    assert all(len(r) <= 80 for r in rows)


def test_channels_from_contexts_and_grid():
    """Adapter over the batched CC pipeline's per-channel contexts."""
    from dsdneo_tpu.protocol.base import DecoderContext
    ctxs = [DecoderContext() for _ in range(3)]
    ctxs[0].emit(" TSBK something", "p25p1", 10)
    ctxs[1].emit(" LDU1 VOICE (9 IMBE frames)", "p25p1", 10)
    ctxs[1].state.last_tg = 777
    chans = panes.channels_from_contexts(ctxs, freqs=[851e6, 852e6, 853e6])
    assert chans[0]["state"] == "cc"
    assert chans[1]["state"] == "voice" and chans[1]["tg"] == 777
    assert chans[2]["state"] == "idle"
    rows = panes.channel_grid_rows(chans, width=70)
    assert "777" in "\n".join(rows)


def test_trunk_status_rows():
    from types import SimpleNamespace
    from dsdneo_tpu.core.affiliation import AffiliationTable
    from dsdneo_tpu.engine.trunk import IdenTable
    it = IdenTable()
    it.add(2, 851_000_000.0, 12_500.0, tdma_slots=2)
    aff = AffiliationTable()
    aff.register(1001)
    aff.affiliate(1001, 123)
    aff.patch_update(900, is_patch=True, active=True)
    aff.patch_add_wgid(900, 123)
    st = SimpleNamespace(p2_wacn=0xBEE00, p2_sysid=0x14C, nac=0x140,
                         iden_table=it, affiliations=aff)
    rows = panes.trunk_status_rows(st, width=70)
    text = "\n".join(rows)
    assert "BEE00" in text and "14C" in text and "140" in text
    assert "IDEN 2" in text and "851.0000" in text and "slots 2" in text
    assert "1 units" in text and "SG 900" in text and "123" in text


def test_history_from_events_fixture():
    """The decode-event adapter builds a browsable call history from a
    real fixture's events."""
    import jax
    from dsdneo_tpu.engine.decoder import decode_samples
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(
        "/root/reference/tests/fixtures/iq/p25p1_c4fm_vc.iq.json")
    ctx = decode_samples(samples, "p25p1", fs=float(meta.sample_rate_hz))
    h = panes.history_from_events(ctx.events)
    rows = panes.call_history_rows(h, width=100)
    assert len(rows) >= 2            # header + at least one call
    assert "Group" in "\n".join(rows)


def test_terminal_view_rows_dispatch():
    from dsdneo_tpu.ui.terminal import UiModel, _view_rows
    h = EventHistory(slots=2)
    h.begin_call(CallEvent(0.0, "dmr", CallKind.GROUP_VOICE, tg=5))
    m = UiModel(history=h,
                channels=[{"id": 0, "freq_hz": 851e6, "state": "cc"}])
    assert any("5" in r for r in _view_rows(m, "calls", 80))
    assert any("C" in r for r in _view_rows(m, "grid", 80))
    assert _view_rows(m, "trunk", 80) == [" (no trunk state)"]


def test_protocol_status_rows():
    from dsdneo_tpu.ui.panes import protocol_status_rows

    class S:
        last_tg = 4501
        last_src = 1234567
        nac = 0x140
        payload_algid = 0xAA
        payload_kid = 7
        payload_mi = 0x1122334455667788
        dmr_color_code = 1
        talker_alias = "UNIT 7"

    rows = protocol_status_rows(S(), "p25p1", 100)
    text = "\n".join(rows)
    assert "TG 4501" in text and "SRC 1234567" in text
    assert "NAC 140" in text
    assert "ALG AA" in text and "KID 0007" in text
    assert "Color Code 1" in text and "ALIAS UNIT 7" in text


def test_live_status_rows():
    from dsdneo_tpu.app_control.snapshot import DecodeHealth, FrontendMetrics
    from dsdneo_tpu.ui.panes import live_status_rows
    snap = FrontendMetrics(freq_hz=851.0125e6, snr_db=17.2, cfo_hz=-120.0,
                           blocks=99, retunes=3, ring_fill=12,
                           ring_drops=1, retune_muted=True,
                           health=DecodeHealth(p25p1_fec_ok=50,
                                               p25p1_fec_err=2))
    rows = live_status_rows(snap, 100)
    text = "\n".join(rows)
    assert "851.01250" in text and "17.2" in text
    assert "RETUNES 3" in text and "[MUTED]" in text
    assert "ok 50" in text and "err 2" in text


def test_db_bar_rows():
    import numpy as np
    from dsdneo_tpu.ui.terminal import _db_bar_rows
    db = np.concatenate([np.full(32, -40.0), np.full(32, 0.0)])
    rows = _db_bar_rows(db, 64)
    assert len(rows) == 7
    # strong half renders full-height bars, weak half mostly empty
    assert rows[0].count("|") > 0
    assert rows[0][:16].strip() == ""


def test_terminal_status_view_dispatch():
    from dsdneo_tpu.ui.terminal import UiModel, _view_rows

    class S:
        last_tg = 7
        last_src = 8

    rows = _view_rows(UiModel(mode="dmr", state=S()), "status", 80)
    assert any("TG 7" in r for r in rows)


def test_run_live_headless():
    """run_live exits on its own against a stopped engine when stdin is
    not a tty (the headless/CI shape of the live frontend)."""
    import threading

    from dsdneo_tpu.engine.live import LiveEngine
    from dsdneo_tpu.ui.terminal import run_live
    eng = LiveEngine("p25p1", fs=48000.0, block_s=0.1)
    eng.metrics.publish(freq_hz=851e6, snr_db=10.0, blocks=1)
    done = threading.Event()

    def ui():
        try:
            run_live(eng, duration=0.0, events=["line one"],
                     max_idle_polls=3)
        finally:
            done.set()
    t = threading.Thread(target=ui, daemon=True)
    t.start()
    assert done.wait(timeout=15), "run_live did not exit headless"


def test_protocol_detail_rows_families():
    """Per-protocol deep-detail pane (reference dsd_ncurses_printer.c
    protocol regions): P25 identity+iden+neighbors, DMR site/slots,
    EDACS AFS calls, M17 LSF."""
    from types import SimpleNamespace

    from dsdneo_tpu.ui.panes import protocol_detail_rows

    class _Ev:
        def __init__(self, line, **fields):
            self.line = line
            self.fields = fields

    st = SimpleNamespace(nac=0x293, p2_wacn=0xBEE00, p2_sysid=0x123,
                         p2_rfssid=5, p2_siteid=9, iden_table=None)
    evs = [_Ev("Adjacent Site", neighbors=[0x1018, 0x2020])]
    rows = protocol_detail_rows(st, evs, "p25p1", 100)
    assert any("NAC 293" in r and "WACN BEE00" in r for r in rows)
    assert any("NEIGHBORS 1018 2020" in r for r in rows)

    st = SimpleNamespace(dmr_color_code=1, dmr_branding="Tier III",
                         dmr_site_parms="TIII Small:2-9;0ABC; ",
                         dmr_rest_channel=7)
    evs = [_Ev("v", slot=0, tg=101, src=42), _Ev("v", slot=1, tg=9, src=3)]
    rows = protocol_detail_rows(st, evs, "dmr", 100)
    assert any("CC 1" in r and "Tier III" in r for r in rows)
    assert any("REST CHANNEL 7" in r for r in rows)
    assert any("SLOT 1" in r and "TG 101" in r for r in rows)
    assert any("SLOT 2" in r and "TG 9" in r for r in rows)

    evs = [_Ev("grant", afs="03-051", lcn=4), _Ev("grant", afs="07-102", lcn=2)]
    rows = protocol_detail_rows(SimpleNamespace(), evs, "edacs", 100)
    assert any("03-051" in r and "LCN 4" in r for r in rows)

    st = SimpleNamespace(m17_sig_status="ECDSA OK", m17_gps="47.6 -122.3")
    evs = [_Ev("lsf", dst="ALL", src="N0CALL")]
    rows = protocol_detail_rows(st, evs, "m17", 100)
    assert any("ECDSA OK" in r for r in rows)
    assert any("DST ALL" in r and "SRC N0CALL" in r for r in rows)

    rows = protocol_detail_rows(SimpleNamespace(), [], "ysf", 100)
    assert rows == [" (no ysf detail yet)"]
