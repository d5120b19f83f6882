"""Fleet orchestration (engine.fleet): mixed-protocol serving over one
[C_total, B] block."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)

FIXDIR = "/root/reference/tests/fixtures/iq"


def _iq(name, n=None):
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(f"{FIXDIR}/{name}.iq.json")
    if n is not None:
        samples = samples[:n]
    return float(meta.sample_rate_hz), np.stack(
        [samples.real, samples.imag], axis=-1).astype(np.float32)


def test_fleet_mixed_voice_and_cc():
    """3 P25 voice channels + 2 P25 CC channels in one fleet block:
    voice PCM and trunking events land per group; the channel grid
    renders all 5 channels."""
    from dsdneo_tpu.engine.fleet import FleetMonitor
    from dsdneo_tpu.ui.panes import channel_grid_rows
    fs, vc = _iq("p25p1_c4fm_vc")
    _, cc = _iq("p25p1_c4fm_cc", n=vc.shape[0])
    fleet = FleetMonitor(fs=fs)
    gv = fleet.assign("p25p1", 3, kind="voice",
                      freqs=[851e6, 852e6, 853e6])
    gc = fleet.assign("p25p1", 2, kind="cc", freqs=[854e6, 855e6])
    assert fleet.total_channels == 5

    block = np.concatenate([
        np.broadcast_to(vc[None], (3,) + vc.shape),
        np.broadcast_to(np.pad(cc, ((0, vc.shape[0] - cc.shape[0]),
                                    (0, 0)))[None], (2,) + vc.shape),
    ])
    fleet.decode_block(block)

    assert gv.pcm is not None and gv.pcm.shape[0] == 3
    assert np.abs(gv.pcm).max() > 1e-4
    ev = fleet.events(3)                 # first CC channel
    assert any("TSDU" in e.line for e in ev)
    assert fleet.events(0) == []         # voice group: PCM, not events

    chans = fleet.channel_dicts()
    assert len(chans) == 5
    assert chans[0]["state"] == "voice"
    assert chans[3]["state"] == "cc"
    rows = channel_grid_rows(chans, width=100)
    assert any("851" in r for r in rows)


def test_fleet_multi_protocol_groups():
    """P25 + DMR CC groups coexist; per-group pipelines stay isolated."""
    from dsdneo_tpu.engine.fleet import FleetMonitor
    fs, p25 = _iq("p25p1_c4fm_cc")
    _, dmr = _iq("dmr_t3_cc")
    n = min(p25.shape[0], dmr.shape[0])
    fleet = FleetMonitor(fs=fs)
    fleet.assign("p25p1", 1, kind="cc")
    fleet.assign("dmr", 1, kind="cc")
    block = np.stack([p25[:n], dmr[:n]])
    fleet.decode_block(block)
    assert any("TSDU" in e.line for e in fleet.events(0))
    assert any("CSBK" in e.line for e in fleet.events(1))


def test_fleet_nxdn96_cc_group_uses_9600_frontend():
    """assign('nxdn96', kind='cc') must build the 9600-baud front end,
    not the nxdn48 default (regression: the mode kwarg injection was
    gated to voice groups only)."""
    from dsdneo_tpu.engine.fleet import FleetMonitor
    fleet = FleetMonitor(fs=48000.0)
    g = fleet.assign("nxdn96", 1, kind="cc")
    assert g.pipeline._fe.mode.symbol_rate == 4800  # nxdn96: 4800 sym/s
    assert g.pipeline.ctxs[0].mode_name == "nxdn96"
    g48 = fleet.assign("nxdn48", 1, kind="cc")
    assert g48.pipeline._fe.mode.symbol_rate == 2400
