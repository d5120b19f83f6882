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
