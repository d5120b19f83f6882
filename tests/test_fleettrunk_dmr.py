"""DMR Tier III closed-loop fleet trunking: a TV_GRANT CSBK on the
TSCC rewrites a voice row's NCO offset between device steps and the
granted row decodes AMBE voice PCM.  The LPCN resolves through the
channel map (reference dmr_csbk.c handle_grants + trunk CSV import /
C_BCAST learning), mirroring test_fleettrunk.py's P25 loop."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)

FS = 768000.0
CENTER = 460_000_000.0
CC_OFF = -144_000
VC_OFF = 192_000
TG, SRC, LPCN = 101, 5555, 24


def _mix(parts, n):
    wide = np.zeros(n, dtype=np.complex128)
    t = np.arange(n, dtype=np.float64) / FS
    for x, off in parts:
        m = min(len(x), n)
        wide[:m] += x[:m] * np.exp(2j * np.pi * off * t[:m])
    return wide.astype(np.complex64)


def _build_wideband(seconds: float = 4.0, voice_until: float = 3.0):
    from dsdneo_tpu.engine.dmrbatch import synth_voice_stream
    from dsdneo_tpu.protocol.dmr import encode as DE
    from dsdneo_tpu.protocol.p25.encode import c4fm_iq

    sps = int(FS / 4800)
    grant = DE.tv_grant_csbk(lpcn=LPCN, ts=0, tg=TG, src=SRC)
    idle = DE.csbk_bits(25, 0, bytes(8))        # C_ALOHA filler
    # grants announce during call setup (~1 s), then idle CC traffic:
    # release is driven by voice going quiet, as on a real system
    n_bursts = int(seconds * 4800 / 144) + 2
    csbks = [grant if i * 144 < 4800 else idle for i in range(n_bursts)]
    cc = c4fm_iq(DE.cc_stream_dibits(csbks, cc=1), sps=sps, fs=FS, seed=1)

    vc48, _dib, _bits = synth_voice_stream(
        n_superframes=int(voice_until / 0.36) + 1, seed=7)
    # upsample the 48 kHz voice synthesis to the band rate by zero-order
    # symbol re-synthesis: re-run the c4fm at band sps from its dibits
    vc = c4fm_iq(_dib, sps=sps, fs=FS, seed=2)
    vc = vc[:int(voice_until * FS)]
    n = int(seconds * FS)
    return _mix([(cc, CC_OFF), (vc, VC_OFF)], n)


@pytest.fixture(scope="module")
def wide():
    return _build_wideband()


def test_dmr_grant_retargets_row_and_decodes_voice(wide):
    from dsdneo_tpu.engine.fleettrunk import TrunkedFleet
    from dsdneo_tpu.engine.trunk import ChannelMap

    cm = ChannelMap()
    cm.entries[LPCN] = CENTER + VC_OFF
    fleet = TrunkedFleet(FS, [CC_OFF], n_voice_rows=2, center_hz=CENTER,
                         mode="dmr", hangtime_s=0.6, grant_grace_s=0.5,
                         chan_map=cm)
    B = int(FS)
    blocks = [wide[i * B:(i + 1) * B] for i in range(4)]

    fleet.step(blocks[0])
    assert fleet.stats.grants == 1
    assert 0 in fleet.calls and fleet.calls[0].tg == TG
    assert abs(fleet.calls[0].freq_hz - (CENTER + VC_OFF)) < 1.0
    assert fleet.offs[fleet.n_cc + 0] == VC_OFF

    pcm2 = fleet.step(blocks[1])
    assert pcm2.shape[0] == 2
    e2 = np.abs(pcm2).mean(axis=1)
    assert e2[0] > 1e-3, "granted row must decode AMBE voice PCM"
    assert e2[1] < e2[0] / 10, "parked row must stay silent"

    # voice ends at 3 s: the idle block releases the call
    fleet.step(blocks[2])
    fleet.step(blocks[3])
    assert fleet.stats.releases == 1
    assert not fleet.calls
    assert fleet.offs[fleet.n_cc + 0] == CC_OFF
    assert fleet.stats.grants == 1      # repeats refreshed, not re-granted
    assert fleet.stats.grant_refreshes >= 1


def test_dmr_grant_unresolved_without_chan_map(wide):
    """No channel map and no C_BCAST: the LPCN cannot resolve, the
    grant is counted unresolved, and no row is retargeted."""
    from dsdneo_tpu.engine.fleettrunk import TrunkedFleet
    fleet = TrunkedFleet(FS, [CC_OFF], n_voice_rows=1, center_hz=CENTER,
                         mode="dmr")
    fleet.step(wide[:int(FS)])
    assert fleet.stats.grants == 0
    assert fleet.stats.unresolved >= 1
    assert not fleet.calls


def test_trunk_wideband_cli(wide, tmp_path, capsys):
    """--trunk-wideband drives the closed loop from the CLI: grant log
    + summary on stderr, granted voice PCM in the -o wav sink."""
    from dsdneo_tpu import cli
    from dsdneo_tpu.io.audio_files import read_wav
    from dsdneo_tpu.io.iq import IqMetadata, write_iq_capture

    cap = tmp_path / "band.iq"
    write_iq_capture(str(cap), wide, IqMetadata(
        sample_format="cf32", sample_rate_hz=int(FS),
        center_frequency_hz=int(CENTER)))
    csv = tmp_path / "chan.csv"
    csv.write_text(f"channel,frequency\n{LPCN},{CENTER + VC_OFF:.0f}\n")
    wav = tmp_path / "voice.wav"
    rc = cli.main(["--frontend", "none", "-fs", "--platform", "cpu",
                   "--iq-replay", str(cap) + ".json", "-C", str(csv),
                   f"--trunk-wideband=-{-CC_OFF}:2:dmr",
                   "-o", f"wav:{wav}"])
    assert rc == 0
    err = capsys.readouterr().err
    assert f"GRANT TG {TG}" in err
    assert "1 grants" in err
    x, fs = read_wav(str(wav))
    assert fs == 8000 and x.shape[0] > 8000
    assert float(np.abs(np.asarray(x, np.float32)).mean()) > 1e-3
