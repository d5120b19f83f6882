"""Closed-loop trunking over the device mesh (parallel.trunkfleet):
S trunked systems sharded across chips run row extraction + CC TSDU
decode + the full P25p1 voice chain as ONE SPMD program; each system's
host control plane resolves grants and rewrites its voice-row offsets
(sharded DATA) for the next step — zero recompiles.  The mesh-scale
form of the reference's per-tuner controller thread
(src/io/radio/rtl_sdr_fm.cpp:4665, SURVEY §2.8)."""

import numpy as np
import pytest
import jax

if len(jax.devices()) < 2:          # conftest forces the 8-device CPU mesh
    pytest.skip("needs a multi-device mesh", allow_module_level=True)

from jax.sharding import Mesh

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)

FS = 192000.0                       # 4 × 48 kHz band per system
CENTER = 851_000_000.0
CC_OFF = -48_000
VC_OFF = 48_000


def _mix(parts, n):
    wide = np.zeros(n, dtype=np.complex128)
    t = np.arange(n, dtype=np.float64) / FS
    for x, off in parts:
        m = min(len(x), n)
        wide[:m] += x[:m] * np.exp(2j * np.pi * off * t[:m])
    return wide.astype(np.complex64)


def _build_system(tg: int, seed: int, seconds: float = 3.0,
                  voice_until: float = 2.0) -> np.ndarray:
    """One trunked system's wideband: CC at CC_OFF granting ``tg`` on
    iden-1 channel 16 (3 kHz raster based at CENTER → ch 16 maps to
    VC_OFF = +48 kHz exactly), voice LDUs at VC_OFF."""
    from dsdneo_tpu.protocol.p25 import encode as E
    sps = int(FS / 4800)
    nac = 0x293
    grant_ch = (1 << 12) | 16
    iden = E.iden_up_tsbk(1, CENTER, 3000.0)
    netstat = E.tsbk_bytes(0x3B, [0, 0x92, 0x06, 0x50, 0xD5, 0, 0, 0],
                           lb=True)
    frame_grant = E.tsdu_frame(
        nac, [iden, E.group_grant_tsbk(grant_ch, tg=tg, src=1000 + tg),
              netstat])
    frame_idle = E.tsdu_frame(nac, [iden, netstat])
    rng = np.random.default_rng(seed)
    need = int(seconds * 4800)
    cc_dib = [rng.integers(0, 4, 60).astype(np.uint8)]
    total = 60
    while total < need:
        f = frame_grant if total < 4800 else frame_idle
        cc_dib.append(f)
        cc_dib.append(rng.integers(0, 4, 24).astype(np.uint8))
        total += len(f) + 24
    cc = E.c4fm_iq(np.concatenate(cc_dib)[:need], sps=sps, fs=FS,
                   seed=seed + 1)

    n_ldus = int(voice_until / 0.185)
    ldus = E.random_voice_ldus(n_ldus, seed=seed + 2)
    vc_dib = [rng.integers(0, 4, 30).astype(np.uint8)]
    for i in range(n_ldus):
        vc_dib.append(E.ldu_frame(nac, ldus[i],
                                  duid=5 if i % 2 == 0 else 10, seed=i))
    vc = E.c4fm_iq(np.concatenate(vc_dib), sps=sps, fs=FS,
                   seed=seed + 3)
    vc = vc[:int(voice_until * FS)]
    n = int(seconds * FS)
    return _mix([(cc, CC_OFF), (vc, VC_OFF)], n)


@pytest.fixture(scope="module")
def fleet_and_blocks():
    from dsdneo_tpu.parallel.trunkfleet import ShardedTrunkedFleet
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:2]), axis_names=("sys",))
    wides = np.stack([_build_system(101, seed=10),
                      _build_system(202, seed=20)])     # [2, n]
    B = int(FS)                                          # 1 s blocks
    blocks = [wides[:, i * B:(i + 1) * B] for i in range(3)]
    fleet = ShardedTrunkedFleet(mesh, n_systems=2, fs=FS, B=B,
                                cc_offsets_hz=[CC_OFF, CC_OFF],
                                n_voice_rows=2, centers_hz=CENTER,
                                hangtime_s=0.6, grant_grace_s=0.5,
                                max_tsdus=4, max_ldus=4)
    return fleet, blocks


def test_grants_retarget_rows_per_system(fleet_and_blocks):
    fleet, blocks = fleet_and_blocks
    pcm0 = fleet.step(blocks[0])
    # both systems observed their grant and rewrote a voice row
    assert fleet.stats.grants == 2
    assert fleet.offs[0, 1] == VC_OFF and fleet.offs[1, 1] == VC_OFF
    assert {c.tg for c in fleet.calls[0].values()} == {101}
    assert {c.tg for c in fleet.calls[1].values()} == {202}
    # granted rows decode PCM on the NEXT block, on every system
    pcm1 = fleet.step(blocks[1])
    assert pcm1.shape[0] == 2
    assert np.abs(pcm1[0, 0]).max() > 1e-4
    assert np.abs(pcm1[1, 0]).max() > 1e-4
    # parked row stays silent (CC FSK is not LDU voice)
    assert np.abs(pcm1[0, 1]).max() == 0.0
    # voice ends at 2 s → hangtime releases the rows back to the CC
    fleet.step(blocks[2])
    fleet.step(np.zeros_like(blocks[2]))
    assert fleet.stats.releases == 2
    assert fleet.offs[0, 1] == CC_OFF
    # the whole closed loop — grant, retarget, decode, release — ran
    # under ONE compiled SPMD program (offsets are data, not statics)
    assert fleet.step_fn._cache_size() == 1


def test_noise_only_band_stays_quiet():
    """Pure noise on every system: no grants, no phantom PCM, and the
    control plane stays consistent (fuzz-style robustness, mirroring
    the reference's squelch discipline on empty channels)."""
    from dsdneo_tpu.parallel.trunkfleet import ShardedTrunkedFleet
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:2]), axis_names=("sys",))
    B = int(FS)
    fleet = ShardedTrunkedFleet(mesh, n_systems=2, fs=FS, B=B,
                                cc_offsets_hz=[CC_OFF, CC_OFF],
                                n_voice_rows=1, centers_hz=CENTER)
    rng = np.random.default_rng(5)
    wide = (rng.normal(size=(2, B, 2)) * 0.3).astype(np.float32)
    pcm = fleet.step(wide)
    assert fleet.stats.grants == 0 and not fleet.calls[0]
    assert np.abs(pcm).max() == 0.0      # no active call → masked out
    pcm = fleet.step(np.zeros((2, B, 2), np.float32))
    assert fleet.stats.grants == 0 and np.abs(pcm).max() == 0.0


def _build_dmr_system(tg: int, lpcn: int, seed: int,
                      seconds: float = 3.0,
                      voice_until: float = 2.2) -> np.ndarray:
    """One DMR Tier III system's wideband: TSCC at CC_OFF granting
    ``tg`` on ``lpcn``, AMBE voice superframes at VC_OFF."""
    from dsdneo_tpu.engine.dmrbatch import synth_voice_stream
    from dsdneo_tpu.protocol.dmr import encode as DE
    from dsdneo_tpu.protocol.p25.encode import c4fm_iq
    sps = int(FS / 4800)
    grant = DE.tv_grant_csbk(lpcn=lpcn, ts=0, tg=tg, src=1000 + tg)
    idle = DE.csbk_bits(25, 0, bytes(8))        # C_ALOHA filler
    n_bursts = int(seconds * 4800 / 144) + 2
    csbks = [grant if i * 144 < 4800 else idle for i in range(n_bursts)]
    cc = c4fm_iq(DE.cc_stream_dibits(csbks, cc=1), sps=sps, fs=FS,
                 seed=seed)
    _iq48, dib, _bits = synth_voice_stream(
        n_superframes=int(voice_until / 0.36) + 1, seed=seed + 1)
    vc = c4fm_iq(dib, sps=sps, fs=FS, seed=seed + 2)
    vc = vc[:int(voice_until * FS)]
    n = int(seconds * FS)
    return _mix([(cc, CC_OFF), (vc, VC_OFF)], n)


def test_dmr_mesh_trunking_closed_loop():
    from dsdneo_tpu.engine.trunk import ChannelMap
    from dsdneo_tpu.parallel.trunkfleet import ShardedTrunkedFleet
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:2]), axis_names=("sys",))
    LPCN = 24
    cm = ChannelMap()
    cm.entries[LPCN] = CENTER + VC_OFF
    wides = np.stack([_build_dmr_system(101, LPCN, seed=30),
                      _build_dmr_system(202, LPCN, seed=40)])
    B = int(FS)
    fleet = ShardedTrunkedFleet(mesh, n_systems=2, fs=FS, B=B,
                                cc_offsets_hz=[CC_OFF, CC_OFF],
                                n_voice_rows=2, centers_hz=CENTER,
                                mode="dmr", hangtime_s=0.6,
                                grant_grace_s=0.5, chan_map=cm,
                                max_tsdus=8, max_ldus=8)
    fleet.step(wides[:, :B])
    assert fleet.stats.grants == 2
    assert fleet.offs[0, 1] == VC_OFF and fleet.offs[1, 1] == VC_OFF
    pcm1 = fleet.step(wides[:, B:2 * B])
    assert np.abs(pcm1[0, 0]).max() > 1e-3
    assert np.abs(pcm1[1, 0]).max() > 1e-3
    assert np.abs(pcm1[0, 1]).max() == 0.0      # parked row masked
    fleet.step(wides[:, 2 * B:3 * B])
    fleet.step(np.zeros((2, B), np.complex64))
    assert fleet.stats.releases == 2
    assert fleet.step_fn._cache_size() == 1


def test_sharded_prefetch_path_bit_identical():
    """ShardedTrunkedFleet.step(None, prefetch=...) — the sharded
    upload-overlap path — is bit-identical to the plain step(wide)
    path: the prefetch only moves the sharded h2d upload under the
    SPMD program, never the data (mirrors the single-chip
    test_fleettrunk.test_prefetch_path_bit_identical)."""
    from dsdneo_tpu.parallel.trunkfleet import ShardedTrunkedFleet
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:2]), axis_names=("sys",))
    wides = np.stack([_build_system(101, seed=50, seconds=1.5,
                                    voice_until=1.5),
                      _build_system(202, seed=60, seconds=1.5,
                                    voice_until=1.5)])
    B = int(FS) // 2                               # 0.5 s blocks
    blocks = [wides[:, i * B:(i + 1) * B] for i in range(3)]

    def mk():
        return ShardedTrunkedFleet(mesh, n_systems=2, fs=FS, B=B,
                                   cc_offsets_hz=[CC_OFF, CC_OFF],
                                   n_voice_rows=1, centers_hz=CENTER,
                                   hangtime_s=0.6, grant_grace_s=0.5,
                                   max_tsdus=4, max_ldus=2)

    plain, pre = mk(), mk()
    out_plain = [plain.step(b) for b in blocks]
    out_pre = [pre.step(blocks[0], prefetch=blocks[1]),
               pre.step(None, prefetch=blocks[2]),
               pre.step(None)]
    assert plain.stats.grants == 2                 # both systems granted
    for a, b in zip(out_plain, out_pre):
        np.testing.assert_array_equal(a, b)
    assert plain.stats == pre.stats
    assert plain.offs.tolist() == pre.offs.tolist()


# -- NXDN Type-C at mesh scale ----------------------------------------------
def _build_nxdn_system(seconds: float = 3.0) -> np.ndarray:
    """One NXDN Type-C system's wideband: spec-built VCALL_ASSGN RCCH
    at CC_OFF (CHAN 0x0A5 → VC_OFF through the channel map), the REAL
    off-air nxdn48 voice fixture at VC_OFF."""
    from tests.test_dsp import synth_c4fm
    from tests.test_fleettrunk_nxdn import _grant_cac_dibits

    from dsdneo_tpu.dsp.resampler import resample
    from dsdneo_tpu.io import read_iq_capture

    n_frames = int(seconds * 2400 / 2 / 192) + 2
    cc48 = synth_c4fm(_grant_cac_dibits(n_frames), sps=20,
                      dev_hz=1050.0, snr_db=35, seed=1)
    _meta, vc48 = read_iq_capture(
        "/root/reference/tests/fixtures/iq/nxdn48.iq.json")
    n = int(seconds * FS)
    t = np.arange(n) / FS
    wide = np.zeros(n, dtype=np.complex128)
    cc = np.asarray(resample(cc48.astype(np.complex64), 48000, int(FS)))
    vc = np.asarray(resample(vc48.astype(np.complex64), 48000, int(FS)))
    m = min(len(cc), n)
    wide[:m] += cc[:m] * np.exp(2j * np.pi * CC_OFF * t[:m])
    m = min(len(vc), n)
    wide[:m] += vc[:m] * np.exp(2j * np.pi * VC_OFF * t[:m])
    return wide.astype(np.complex64)


@pytest.mark.skipif(
    not __import__("os").path.exists(
        "/root/reference/tests/fixtures/iq/nxdn48.iq.json"),
    reason="reference fixtures unavailable")
def test_nxdn_mesh_trunking_closed_loop():
    """NXDN Type-C VCALL_ASSGN grant → retarget → AMBE voice decode →
    hangtime release, S systems as ONE SPMD program (the mesh-scale
    form of test_fleettrunk_nxdn; reference nxdn_vcall_assgn_parse →
    trunk follow, one controller thread per tuner per system)."""
    from dsdneo_tpu.engine.trunk import ChannelMap
    from dsdneo_tpu.parallel.trunkfleet import ShardedTrunkedFleet
    from tests.test_fleettrunk_nxdn import CHAN, SRC, TG

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:2]), axis_names=("sys",))
    cm = ChannelMap()
    cm.entries[CHAN] = CENTER + VC_OFF
    one = _build_nxdn_system()
    wides = np.stack([one, one])
    B = int(FS)
    fleet = ShardedTrunkedFleet(mesh, n_systems=2, fs=FS, B=B,
                                cc_offsets_hz=[CC_OFF, CC_OFF],
                                n_voice_rows=2, centers_hz=CENTER,
                                mode="nxdn48", hangtime_s=0.6,
                                grant_grace_s=0.5, chan_map=cm,
                                max_tsdus=8, max_ldus=12)
    fleet.step(wides[:, :B])
    assert fleet.stats.grants == 2
    for s in range(2):
        assert fleet.calls[s][0].tg == TG
        assert fleet.calls[s][0].src == SRC
    assert fleet.offs[0, 1] == VC_OFF and fleet.offs[1, 1] == VC_OFF
    pcm1 = fleet.step(wides[:, B:2 * B])
    assert np.abs(pcm1[0, 0]).mean() > 1e-3, \
        "granted row must decode the fixture's AMBE voice"
    assert np.abs(pcm1[1, 0]).mean() > 1e-3
    assert np.abs(pcm1[0, 1]).max() == 0.0      # parked row masked
    # voice fixture ends → hangtime releases both systems' rows
    fleet.step(wides[:, 2 * B:3 * B])
    fleet.step(np.zeros((2, B), np.complex64))
    assert fleet.stats.releases == 2
    assert fleet.offs[0, 1] == CC_OFF
    assert fleet.step_fn._cache_size() == 1


# -- EDACS analog at mesh scale ---------------------------------------------
def _build_edacs_system(seconds: float = 3.0,
                        voice_until: float = 2.0) -> np.ndarray:
    """One EDACS system's wideband: standard MT-A=0 analog voice group
    assignment on the CC (LCN 7 → VC_OFF through the channel map), a
    1 kHz NBFM tone at VC_OFF until ``voice_until``."""
    from tests.test_dsp import synth_c4fm
    from tests.test_fleettrunk_edacs import (GROUP, LCN, LID, TONE_HZ,
                                             _edacs_cc_dibits)

    from dsdneo_tpu.dsp.resampler import resample

    msg1 = ((0 << 25) | ((LID >> 7) << 18) | (LCN << 12) | (1 << 11)
            | GROUP)
    msg2 = (LID & 0x7F) << 17
    reps = int(seconds * 9600 / 2 / 288) + 2
    cc48 = synth_c4fm(_edacs_cc_dibits(msg1, msg2, reps), sps=5,
                      dev_hz=4800.0, snr_db=35, seed=1)
    nv = int(voice_until * FS)
    t = np.arange(nv) / FS
    msg = np.sin(2 * np.pi * TONE_HZ * t)
    vc = np.exp(1j * 2 * np.pi * 2500.0 * np.cumsum(msg) / FS)
    n = int(seconds * FS)
    cc = np.asarray(resample(cc48.astype(np.complex64), 48000, int(FS)))
    wide = np.zeros(n, dtype=np.complex128)
    tt = np.arange(n) / FS
    m = min(len(cc), n)
    wide[:m] += cc[:m] * np.exp(2j * np.pi * CC_OFF * tt[:m])
    wide[:nv] += vc * np.exp(2j * np.pi * VC_OFF * tt[:nv])
    return wide.astype(np.complex64)


def test_edacs_mesh_trunking_closed_loop():
    """EDACS analog grant → retarget → NBFM tone decode → dekey/
    squelch → hangtime release, S systems as ONE SPMD program (the
    mesh-scale form of test_fleettrunk_edacs; reference edacs.c grant
    handling + the analog voice path)."""
    from dsdneo_tpu.engine.trunk import ChannelMap
    from dsdneo_tpu.parallel.trunkfleet import ShardedTrunkedFleet
    from tests.test_fleettrunk_edacs import GROUP, LCN, LID, TONE_HZ

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:2]), axis_names=("sys",))
    cm = ChannelMap()
    cm.entries[LCN] = CENTER + VC_OFF
    one = _build_edacs_system()
    wides = np.stack([one, one])
    B = int(FS)
    fleet = ShardedTrunkedFleet(mesh, n_systems=2, fs=FS, B=B,
                                cc_offsets_hz=[CC_OFF, CC_OFF],
                                n_voice_rows=2, centers_hz=CENTER,
                                mode="edacs", hangtime_s=0.6,
                                grant_grace_s=0.5, chan_map=cm,
                                max_tsdus=8)
    fleet.step(wides[:, :B])
    assert fleet.stats.grants == 2
    for s in range(2):
        assert fleet.calls[s][0].tg == GROUP
        assert fleet.calls[s][0].src == LID
    assert fleet.offs[0, 1] == VC_OFF
    pcm1 = fleet.step(wides[:, B:2 * B])
    row = np.asarray(pcm1[0, 0], np.float64)
    assert np.abs(row).mean() > 1e-2, "granted row must carry audio"
    assert np.abs(pcm1[0, 1]).max() == 0.0      # parked row masked
    # the audio IS the 1 kHz test tone
    spec = np.abs(np.fft.rfft(row * np.hanning(row.size)))
    f = np.fft.rfftfreq(row.size, 1 / 8000.0)
    assert abs(f[np.argmax(spec[5:]) + 5] - TONE_HZ) < 10.0
    # dekey at 2 s: squelch closes, hangtime releases on all systems
    fleet.step(wides[:, 2 * B:3 * B])
    fleet.step(np.zeros((2, B), np.complex64))
    assert fleet.stats.releases == 2
    assert fleet.offs[0, 1] == CC_OFF
    assert fleet.step_fn._cache_size() == 1


# -- mixed-phase P25 at mesh scale ------------------------------------------
NAC_M, WACN_M, SYSID_M = 0x293, 0x92065, 0x0D5
CH_SLOT0 = (2 << 12) | 16       # iden 2 (TDMA), ch 16 → slot 0
CH_SLOT1 = (2 << 12) | 17       # same RF channel, slot 1
VC_OFF_P2 = 8 * 6250            # ch//2 = 8 spacings above base=CENTER


def _build_mixed_system(seconds: float = 3.0,
                        voice_until: float = 2.0) -> np.ndarray:
    """One mixed-phase P25 system's wideband: P1 C4FM CC at CC_OFF
    granting TDMA channels (IDEN_UP TDMA + grants on both slots of one
    RF channel), dense 2-slot P2 voice at VC_OFF_P2."""
    from dsdneo_tpu.dsp.resampler import resample
    from dsdneo_tpu.engine.p2batch import synth_p2_voice_stream
    from dsdneo_tpu.protocol.p25 import encode as E

    sps = int(FS / 4800)
    netstat = E.tsbk_bytes(0x3B, [0, 0x92, 0x06, 0x50, 0xD5, 0, 0, 0],
                           lb=True)
    iden_tdma = E.iden_up_tdma_tsbk(2, CENTER, 6250.0)
    frames_grant = [
        E.tsdu_frame(NAC_M, [iden_tdma,
                             E.group_grant_tsbk(CH_SLOT0, tg=301,
                                                src=7001), netstat]),
        E.tsdu_frame(NAC_M, [iden_tdma,
                             E.group_grant_tsbk(CH_SLOT1, tg=302,
                                                src=7002), netstat]),
    ]
    frame_idle = E.tsdu_frame(NAC_M, [iden_tdma, netstat])
    rng = np.random.default_rng(7)
    need = int(seconds * 4800)
    cc_dib = [rng.integers(0, 4, 60).astype(np.uint8)]
    total, k = 60, 0
    while total < need:
        f = frames_grant[k % 2] if total < 4800 else frame_idle
        k += 1
        cc_dib.append(f)
        cc_dib.append(rng.integers(0, 4, 24).astype(np.uint8))
        total += len(f) + 24
    cc = E.c4fm_iq(np.concatenate(cc_dib)[:need], sps=sps, fs=FS,
                   seed=1)
    n_sf = int(voice_until / 0.365) + 2
    vc48, _dib, _bits = synth_p2_voice_stream(
        n_superframes=n_sf, seed=3, wacn=WACN_M, sysid=SYSID_M,
        nac=NAC_M, sps=8)
    vc = np.asarray(resample(vc48.astype(np.complex64), 48000, int(FS)))
    vc = vc[:int(voice_until * FS)]
    n = int(seconds * FS)
    return _mix([(cc, CC_OFF), (vc, VC_OFF_P2)], n)


def test_mixed_phase_mesh_trunking_closed_loop():
    """P1 CC → P2 TDMA voice at mesh scale: both slots of one granted
    frequency share one extraction row, decode through the sharded
    Phase-2 body, and release on hangtime (the mesh-scale form of
    test_fleettrunk_p2; reference p25_trunk_sm.c P1-CC→P2-VC follow +
    p25p2_frame.c both-timeslot decode)."""
    from dsdneo_tpu.parallel.trunkfleet import ShardedTrunkedFleet

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:2]), axis_names=("sys",))
    one = _build_mixed_system()
    wides = np.stack([one, one])
    B = int(FS)
    fleet = ShardedTrunkedFleet(mesh, n_systems=2, fs=FS, B=B,
                                cc_offsets_hz=[CC_OFF, CC_OFF],
                                n_voice_rows=2, centers_hz=CENTER,
                                mode="p25_mixed", hangtime_s=0.6,
                                grant_grace_s=0.5, max_tsdus=4,
                                max_ldus=6,
                                p2_params=(WACN_M, SYSID_M, NAC_M))
    fleet.step(wides[:, :B])
    # both TDMA grants observed on every system: slots share p2 row 0
    assert fleet.stats.grants == 4
    for s in range(2):
        assert set(fleet.calls2[s]) == {(0, 0), (0, 1)}
        assert fleet.calls2[s][(0, 0)].tg == 301
        assert fleet.calls2[s][(0, 1)].tg == 302
        assert not fleet.calls[s]          # no P1 (FDMA) call
    assert fleet.offs[0, 1] == VC_OFF_P2
    assert fleet.offs[0, 2] == CC_OFF      # parked
    pcm1 = fleet.step(wides[:, B:2 * B])   # [S, 2·n_vc, T]
    assert pcm1.shape[1] == 4
    e = np.abs(pcm1).mean(axis=2)
    for s in range(2):
        assert e[s, 0] > 1e-3, "slot 0 of the granted row must decode"
        assert e[s, 1] > 1e-3, "slot 1 of the granted row must decode"
        assert e[s, 2] == 0.0 and e[s, 3] == 0.0   # parked row masked
    # voice ends at 2 s: both slot calls release, the row parks
    fleet.step(wides[:, 2 * B:3 * B])
    fleet.step(np.zeros((2, B), np.complex64))
    assert fleet.stats.releases == 4
    assert not fleet.calls2[0] and not fleet.calls2[1]
    assert fleet.offs[0, 1] == CC_OFF
    assert fleet.step_fn._cache_size() == 1
