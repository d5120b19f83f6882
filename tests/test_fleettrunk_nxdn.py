"""NXDN Type-C closed-loop fleet trunking: a VCALL_ASSGN CAC on the
RCCH (spec-built, CRC16-CAC-valid) rewrites a voice row's NCO offset,
and the granted row decodes the REAL off-air nxdn48 voice fixture
through the batched AMBE chain (reference nxdn_element.c
nxdn_vcall_assgn_parse channel → trunk follow)."""

import os

import numpy as np
import pytest

FS = 768000.0
CENTER = 451_000_000.0
CC_OFF = -96_000
VC_OFF = 144_000
TG, SRC, CHAN = 200, 31, 0x0A5

FIXTURE = "/root/reference/tests/fixtures/iq/nxdn48.iq.json"
pytestmark = [pytest.mark.slow,     # full tier (docs/testing.md)
              pytest.mark.skipif(not os.path.exists(FIXTURE),
                                reason="reference fixtures unavailable")]


def _grant_cac_dibits(n_frames: int, seed: int = 3) -> np.ndarray:
    """Spec-built RCCH stream whose CAC message is a VCALL_ASSGN
    (mtype 0x04) granting TG/SRC on CHAN (message field map per
    protocol/nxdn/decoder._message: msg = dec[8:155], mtype msg[2:8],
    src msg[24:40], dst msg[40:56], chan msg[62:72])."""
    from dsdneo_tpu.fec import conv
    from dsdneo_tpu.protocol.nxdn.decoder import (_PERM_12_25,
                                                  _pn9_scramble_positions,
                                                  crc16_cac)
    from dsdneo_tpu.symbols.framesync import SYNC_DEFS
    rng = np.random.default_rng(seed)
    fsw = next(d for d in SYNC_DEFS if d.name == "+NXDN FSW")
    fsw_d = np.array([int(c) for c in fsw.pattern], dtype=np.uint8)
    scram = np.zeros(182, dtype=np.uint8)
    scram[_pn9_scramble_positions()] = 1

    def close_crc(bits171):
        base = bits171.copy()
        base[155:] = 0
        r0 = crc16_cac(base)
        A = np.zeros((16, 16), dtype=np.uint8)
        for i in range(16):
            e = base.copy()
            e[155 + i] = 1
            ri = crc16_cac(e) ^ r0
            A[:, i] = [(ri >> (15 - j)) & 1 for j in range(16)]
        b = np.array([(r0 >> (15 - j)) & 1 for j in range(16)], np.uint8)
        M = np.concatenate([A, b[:, None]], axis=1)
        for col in range(16):
            piv = next(r for r in range(col, 16) if M[r, col])
            M[[col, piv]] = M[[piv, col]]
            for r in range(16):
                if r != col and M[r, col]:
                    M[r] ^= M[col]
        bits171[155:] = M[:, 16]
        assert crc16_cac(bits171) == 0
        return bits171

    def put(bits, at, width, value):
        for i in range(width):
            bits[at + i] = (value >> (width - 1 - i)) & 1

    mapping = [0, 1, 2, None, 3, 4, 5, 6, 7, 8, 9, None, 10, 11]
    lich_full = 0x01 << 1
    parity = 0
    for k in range(7, 3, -1):
        parity ^= (lich_full >> k) & 1
    lich_full |= parity

    frames = []
    for _f in range(n_frames):
        bits171 = np.zeros(171, dtype=np.uint8)
        put(bits171, 2, 6, 5)                  # RAN 5
        put(bits171, 10, 6, 0x04)              # VCALL_ASSGN
        put(bits171, 24, 3, 1)                 # call type
        put(bits171, 32, 16, SRC)
        put(bits171, 48, 16, TG)
        put(bits171, 70, 10, CHAN)
        close_crc(bits171)
        enc = conv.encode(bits171)
        deperm = np.zeros(300, dtype=np.uint8)
        for g in range(25):
            for i, m in enumerate(mapping):
                if m is not None:
                    deperm[g * 12 + m] = enc[g * 14 + i]
        bits300 = deperm[_PERM_12_25]
        payload = np.zeros(182, dtype=np.uint8)
        for i in range(8):
            payload[i] = ((lich_full >> (7 - i)) & 1) << 1
        payload[8:158] = ((bits300[0::2] << 1) | bits300[1::2]
                          ).astype(np.uint8)
        payload ^= scram * 2
        frames.append(np.concatenate([fsw_d, payload]))
        frames.append(rng.integers(0, 4, 2).astype(np.uint8))
    return np.concatenate([rng.integers(0, 4, 100).astype(np.uint8)]
                          + frames)


def _build_wideband(seconds: float = 4.0):
    from tests.test_dsp import synth_c4fm

    from dsdneo_tpu.dsp.resampler import resample
    from dsdneo_tpu.io import read_iq_capture

    # RCCH at 2400 baud (sps=20 at 48 kHz): CAC frames for the whole
    # capture; the fixture's real voice rides the granted offset
    n_frames = int(seconds * 2400 / 2 / 192) + 2
    cc_dib = _grant_cac_dibits(n_frames)
    cc48 = synth_c4fm(cc_dib, sps=20, dev_hz=1050.0, snr_db=35, seed=1)

    _meta, vc48 = read_iq_capture(FIXTURE)

    n = int(seconds * FS)
    wide = np.zeros(n, dtype=np.complex128)
    t = np.arange(n) / FS
    cc = np.asarray(resample(cc48.astype(np.complex64), 48000, int(FS)))
    vc = np.asarray(resample(vc48.astype(np.complex64), 48000, int(FS)))
    m = min(len(cc), n)
    wide[:m] += cc[:m] * np.exp(2j * np.pi * CC_OFF * t[:m])
    m = min(len(vc), n)
    wide[:m] += vc[:m] * np.exp(2j * np.pi * VC_OFF * t[:m])
    return wide.astype(np.complex64)


def test_nxdn_vcall_assgn_retargets_and_decodes(wide=None):
    from dsdneo_tpu.engine.fleettrunk import TrunkedFleet
    from dsdneo_tpu.engine.trunk import ChannelMap

    wide = _build_wideband() if wide is None else wide
    cm = ChannelMap()
    cm.entries[CHAN] = CENTER + VC_OFF
    fleet = TrunkedFleet(FS, [CC_OFF], n_voice_rows=2, center_hz=CENTER,
                         mode="nxdn48", hangtime_s=1.5, grant_grace_s=0.5,
                         chan_map=cm)
    B = int(FS)
    fleet.step(wide[:B])
    assert fleet.stats.grants == 1
    assert 0 in fleet.calls
    assert fleet.calls[0].tg == TG and fleet.calls[0].src == SRC
    assert fleet.offs[fleet.n_cc + 0] == VC_OFF

    pcm = fleet.step(wide[B:2 * B])
    assert pcm.shape[0] == 2
    assert np.abs(pcm[0]).mean() > 1e-3, \
        "granted row must decode the fixture's AMBE voice"
    assert np.abs(pcm[1]).mean() < np.abs(pcm[0]).mean() / 10
