"""Mixed-phase P25 fleet trunking: a Phase-1 C4FM control channel
grants TDMA channels (IDEN_UP TDMA, opcode 0x33) and the fleet follows
them with the batched Phase-2 pipeline — two slots of one granted
frequency share one extraction row, exactly like the reference's
single tuner parked on a P2 VC decodes both timeslots
(src/protocol/p25/p25_trunk_sm.c P1-CC→P2-VC follow + p25p2_frame.c).
The P2 pipeline's WACN/SYS/NAC scramble parameters are learned from
the CC itself (NET_STS broadcast + NID), not configured."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)

FS = 768000.0           # 16 × 48 kHz band
CENTER = 851_000_000.0
CC_OFF = -96_000
TG_A, TG_B = 301, 302
NAC, WACN, SYSID = 0x293, 0x92065, 0x0D5
CH_SLOT0 = (2 << 12) | 40       # iden 2 (TDMA), ch 40 → slot 0
CH_SLOT1 = (2 << 12) | 41       # same RF channel, slot 1
VC_OFF = 20 * 6250              # ch//2 = 20 spacings above base=CENTER


def _build_wideband(seconds: float = 4.0, voice_until: float = 3.0):
    from dsdneo_tpu.dsp.resampler import resample
    from dsdneo_tpu.engine.p2batch import synth_p2_voice_stream
    from dsdneo_tpu.protocol.p25 import encode as E

    sps = int(FS / 4800)
    netstat = E.tsbk_bytes(0x3B, [0, 0x92, 0x06, 0x50, 0xD5, 0, 0, 0],
                           lb=True)
    iden_tdma = E.iden_up_tdma_tsbk(2, CENTER, 6250.0)
    frames_grant = [
        E.tsdu_frame(NAC, [iden_tdma,
                           E.group_grant_tsbk(CH_SLOT0, tg=TG_A, src=7001),
                           netstat]),
        E.tsdu_frame(NAC, [iden_tdma,
                           E.group_grant_tsbk(CH_SLOT1, tg=TG_B, src=7002),
                           netstat]),
    ]
    frame_idle = E.tsdu_frame(NAC, [iden_tdma, netstat])
    rng = np.random.default_rng(0)
    need = int(seconds * 4800)
    cc_dib = [rng.integers(0, 4, 60).astype(np.uint8)]
    total = 60
    k = 0
    while total < need:
        f = frames_grant[k % 2] if total < 4800 else frame_idle
        k += 1
        cc_dib.append(f)
        cc_dib.append(rng.integers(0, 4, 24).astype(np.uint8))
        total += len(f) + 24
    cc = E.c4fm_iq(np.concatenate(cc_dib)[:need], sps=sps, fs=FS, seed=1)

    # dense 2-slot P2 voice at 48 kHz (sps=8 · 6000), scrambled with
    # the SAME identity the CC broadcasts
    n_sf = int(voice_until / 0.365) + 2
    vc48, _dib, _bits = synth_p2_voice_stream(
        n_superframes=n_sf, seed=3, wacn=WACN, sysid=SYSID, nac=NAC,
        sps=8)
    vc = np.asarray(resample(vc48.astype(np.complex64), 48000, int(FS)))
    vc = vc[:int(voice_until * FS)]

    n = int(seconds * FS)
    wide = np.zeros(n, dtype=np.complex128)
    t = np.arange(n) / FS
    m = min(len(cc), n)
    wide[:m] += cc[:m] * np.exp(2j * np.pi * CC_OFF * t[:m])
    m = min(len(vc), n)
    wide[:m] += vc[:m] * np.exp(2j * np.pi * VC_OFF * t[:m])
    return wide.astype(np.complex64)


def test_p1_cc_grants_p2_voice_rows():
    from dsdneo_tpu.engine.fleettrunk import TrunkedFleet

    wide = _build_wideband()
    fleet = TrunkedFleet(FS, [CC_OFF], n_voice_rows=1, p2_rows=2,
                         center_hz=CENTER, hangtime_s=0.6,
                         grant_grace_s=0.5)
    B = int(FS)
    blocks = [wide[i * B:(i + 1) * B] for i in range(4)]

    fleet.step(blocks[0])
    # both TDMA grants observed: slots 0 and 1 SHARE p2 row 0
    assert fleet.stats.grants == 2
    assert set(fleet.calls2) == {(0, 0), (0, 1)}
    assert fleet.calls2[(0, 0)].tg == TG_A
    assert fleet.calls2[(0, 1)].tg == TG_B
    assert not fleet.calls                 # no P1 (FDMA) call
    assert fleet.offs[fleet.n_cc + fleet.n_vc + 0] == VC_OFF
    assert fleet.offs[fleet.n_cc + fleet.n_vc + 1] == CC_OFF  # parked
    # the P2 pipeline came up with the CC-learned identity
    assert fleet.vc2_pipe is not None
    assert fleet.vc2_pipe.params == (WACN, SYSID, NAC)

    fleet.step(blocks[1])
    pcm2 = fleet.p2_pcm
    assert pcm2.shape[0] == 4              # 2 rows × 2 slots
    e = np.abs(pcm2).mean(axis=1)
    assert e[0] > 1e-3, "slot 0 of the granted P2 row must decode"
    assert e[1] > 1e-3, "slot 1 of the granted P2 row must decode"
    assert e[2] < min(e[0], e[1]) / 10     # parked row stays silent
    assert e[3] < min(e[0], e[1]) / 10

    fleet.step(blocks[2])
    assert np.abs(fleet.p2_pcm[:2]).mean() > 1e-3
    # grant repeats while up refreshed instead of re-granting
    assert fleet.stats.grants == 2
    assert fleet.stats.grant_refreshes >= 2

    # voice ends at 3 s: both slot calls release, the row parks
    fleet.step(blocks[3])
    assert fleet.stats.releases == 2
    assert not fleet.calls2
    assert fleet._free2 == [1, 0]
    assert fleet.offs[fleet.n_cc + fleet.n_vc + 0] == CC_OFF


def test_p2_rows_require_p25p1_mode():
    from dsdneo_tpu.engine.fleettrunk import TrunkedFleet
    with pytest.raises(ValueError):
        TrunkedFleet(FS, [0], n_voice_rows=1, p2_rows=1, mode="dmr")


def test_trunk_wideband_cli_mixed_phase(tmp_path, capsys):
    """--trunk-wideband's :N_P2 field drives the mixed-phase loop from
    the CLI: P1 CC observed, TDMA grants logged, and BOTH P2 slots'
    voice PCM lands in the -o wav sink (per-slot files)."""
    from dsdneo_tpu import cli
    from dsdneo_tpu.io.audio_files import read_wav
    from dsdneo_tpu.io.iq import IqMetadata, write_iq_capture

    cap = tmp_path / "band.iq"
    write_iq_capture(str(cap), _build_wideband(), IqMetadata(
        sample_format="cf32", sample_rate_hz=int(FS),
        center_frequency_hz=int(CENTER)))
    wav = tmp_path / "voice.wav"
    rc = cli.main(["--frontend", "none", "-f1", "--platform", "cpu",
                   "--iq-replay", str(cap) + ".json",
                   f"--trunk-wideband=-{-CC_OFF}:1:p25p1:2",
                   "-o", f"wav:{wav}"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "P2 pipeline up: WACN 92065 SYS 0D5 NAC 293" in err
    assert f"GRANT TG {TG_A} -> p2 row 0 slot 0" in err
    assert f"GRANT TG {TG_B} -> p2 row 0 slot 1" in err
    assert "2 grants" in err
    for slot in (0, 1):
        x, fs = read_wav(str(tmp_path / f"voice.s{slot}.wav"))
        assert fs == 8000 and x.shape[0] > 8000
        assert float(np.abs(np.asarray(x, np.float32)).mean()) > 1e-3
