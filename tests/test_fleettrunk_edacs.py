"""EDACS closed-loop fleet trunking with ANALOG working channels: a
standard MT-A voice group assignment on the CC rewrites a voice row's
NCO offset, and the granted row decodes analog NBFM audio through the
batched analog pipeline (reference edacs.c grant handling + the analog
voice path the reference follows grants to)."""

import numpy as np
import pytest

FS = 768000.0
CENTER = 860_000_000.0
CC_OFF = -96_000
VC_OFF = 144_000
GROUP, LID, LCN = 0x155, 77, 7
TONE_HZ = 1000.0


def _edacs_cc_dibits(msg1: int, msg2: int, reps: int) -> np.ndarray:
    from dsdneo_tpu.protocol.edacs.decoder import edacs_bch_encode
    from dsdneo_tpu.symbols import framesync
    sync = next(d for d in framesync.SYNC_DEFS
                if d.protocol == "edacs" and not d.inverted)
    sync_d = np.array([int(c) for c in sync.pattern], dtype=np.uint8)
    w1 = edacs_bch_encode(msg1)
    w2 = edacs_bch_encode(msg2)
    bits = []
    for w in (w1, (~w1) & 0xFFFFFFFFFF, w1, w2, (~w2) & 0xFFFFFFFFFF, w2):
        bits.extend((w >> (39 - i)) & 1 for i in range(40))
    frame = np.array([3 if b else 1 for b in bits], dtype=np.uint8)
    lead = np.tile(np.array([1, 3], np.uint8), 30)
    return np.concatenate([lead] + [np.concatenate([sync_d, frame])
                                    for _ in range(reps)])


def _build_wideband(seconds: float = 4.0, voice_until: float = 3.0):
    from tests.test_dsp import synth_c4fm

    # standard MT-A=0: ANALOG voice group assignment (lcn msg1[16:12],
    # tx_trunk bit 11, group msg1[10:0])
    # lid spans msg1[24:18] (upper 7 bits) | msg2[23:17] (lower 7)
    msg1 = (0 << 25) | ((LID >> 7) << 18) | (LCN << 12) | (1 << 11) | GROUP
    msg2 = (LID & 0x7F) << 17
    # one CC frame is 288 dibits ≈ 30 ms at 9600 baud; repeat for the
    # whole capture (grant repeats refresh the active call)
    reps = int(seconds * 9600 / 2 / 288) + 2
    cc_dib = _edacs_cc_dibits(msg1, msg2, reps)
    cc48 = synth_c4fm(cc_dib, sps=5, dev_hz=4800.0, snr_db=35, seed=1)

    # analog NBFM voice: 1 kHz tone at 2.5 kHz deviation, carrier only
    # until voice_until (dekey → squelch closes → hangtime release)
    fs = FS
    nv = int(voice_until * fs)
    t = np.arange(nv) / fs
    msg = np.sin(2 * np.pi * TONE_HZ * t)
    vc = np.exp(1j * 2 * np.pi * 2500.0 * np.cumsum(msg) / fs)

    n = int(seconds * fs)
    from dsdneo_tpu.dsp.resampler import resample
    cc = np.asarray(resample(cc48.astype(np.complex64), 48000, int(fs)))
    wide = np.zeros(n, dtype=np.complex128)
    tt = np.arange(n) / fs
    m = min(len(cc), n)
    wide[:m] += cc[:m] * np.exp(2j * np.pi * CC_OFF * tt[:m])
    wide[:nv] += vc * np.exp(2j * np.pi * VC_OFF * tt[:nv])
    return wide.astype(np.complex64)


@pytest.fixture(scope="module")
def wide():
    return _build_wideband()


def test_edacs_grant_decodes_analog_voice(wide):
    from dsdneo_tpu.engine.fleettrunk import TrunkedFleet
    from dsdneo_tpu.engine.trunk import ChannelMap

    cm = ChannelMap()
    cm.entries[LCN] = CENTER + VC_OFF
    fleet = TrunkedFleet(FS, [CC_OFF], n_voice_rows=2, center_hz=CENTER,
                         mode="edacs", hangtime_s=0.6, grant_grace_s=0.5,
                         chan_map=cm)
    B = int(FS)
    blocks = [wide[i * B:(i + 1) * B] for i in range(4)]

    fleet.step(blocks[0])
    assert fleet.stats.grants == 1
    assert 0 in fleet.calls and fleet.calls[0].tg == GROUP
    assert fleet.calls[0].src == LID
    assert fleet.offs[fleet.n_cc + 0] == VC_OFF

    pcm2 = fleet.step(blocks[1])
    assert pcm2.shape[0] == 2
    row = np.asarray(pcm2[0], np.float64)
    assert np.abs(row).mean() > 1e-2, "granted row must carry audio"
    assert np.abs(np.asarray(pcm2[1])).mean() < 1e-6, "parked row silent"
    # the audio IS the 1 kHz test tone
    spec = np.abs(np.fft.rfft(row * np.hanning(row.size)))
    f = np.fft.rfftfreq(row.size, 1 / 8000.0)
    assert abs(f[np.argmax(spec[5:]) + 5] - TONE_HZ) < 10.0

    # dekey at 3 s: squelch closes, hangtime releases the call
    fleet.step(blocks[2])
    fleet.step(blocks[3])
    assert fleet.stats.releases == 1
    assert not fleet.calls
    assert fleet.offs[fleet.n_cc + 0] == CC_OFF
    assert fleet.stats.grants == 1
    assert fleet.stats.grant_refreshes >= 1
