"""EDACS grant → ProVoice working-channel follow on synthesized
material (reference src/protocol/edacs/edacs.c grant handling +
provoice.c working-channel decode; the reference itself ships no
ProVoice fixture — docs/testing.md:63-66 — so this goes beyond its own
e2e coverage).  A synthesized EDACS control channel on one channelizer
bin issues a digital voice group assignment (LCN); the TrunkFollower
resolves the LCN through the channel map and retunes; the granted bin
carries a synthesized ProVoice superframe (frames through the
hypothesis IMBE-7100 ECC, labeled as such in PARITY.md) that decodes
bit-exactly."""

import numpy as np
import pytest

from tests.test_dsp import synth_c4fm


def _edacs_cc_dibits(msg1: int, msg2: int, reps: int = 3) -> np.ndarray:
    """Leader + reps × (sync + 240-dibit voted frame)."""
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
                                    for _ in range(reps)] + [lead])


def test_pair_interleave_roundtrip():
    """TX interleaver and the decoder's deinterleave walk share one
    schedule: interleave → _load_pair is exact."""
    from dsdneo_tpu.protocol.provoice.decoder import ProVoiceDecoder
    from dsdneo_tpu.protocol.provoice.encode import (interleave_pair,
                                                     pair_bit_schedule)
    rng = np.random.default_rng(5)
    sched = pair_bit_schedule()
    # only positions named by the schedule are carried on air
    f1 = np.zeros((7, 24), np.uint8)
    f2 = np.zeros((7, 24), np.uint8)
    for tag, w, x in sched:
        if tag == "1":
            f1[w, x] = rng.integers(0, 2)
        elif tag == "2":
            f2[w, x] = rng.integers(0, 2)
    bits = interleave_pair(f1, f2)
    cur = [0]

    def take(n):
        out = bits[cur[0]:cur[0] + n]
        cur[0] += n
        return out

    g1, g2 = ProVoiceDecoder._load_pair(take)
    np.testing.assert_array_equal(g1, f1)
    np.testing.assert_array_equal(g2, f2)


def test_edacs_grant_to_provoice_follow():
    from dsdneo_tpu.dsp.channelizer import channelize
    from dsdneo_tpu.dsp.resampler import resample
    from dsdneo_tpu.engine import decode_samples
    from dsdneo_tpu.engine.trunk import (ChannelMap, TrunkFollower,
                                         TrunkSM)
    from dsdneo_tpu.protocol.provoice.encode import provoice_stream_dibits
    from dsdneo_tpu.protocol.provoice.imbe7100 import (
        decode_imbe7100_ecc, encode_imbe7100_ecc)

    group, lid, lcn = 0x155, 0, 7
    rf_center = 860_000_000.0
    vc_rf = rf_center - 96_000.0            # bin 6 of 8
    n_ch, fs_ch = 8, 48000.0

    # EDACS standard MT-A=2 (digital voice group assignment):
    # lcn at msg1[16:12], tx_trunk bit 11, group msg1[10:0]
    msg1 = (2 << 25) | (lcn << 12) | (1 << 11) | group
    cc_dibits = _edacs_cc_dibits(msg1, 0)

    # ProVoice working channel: 4 IMBE-7100 frames through the
    # hypothesis ECC (labeled; PARITY.md round-3)
    rng = np.random.default_rng(9)
    bits90 = rng.integers(0, 2, (4, 90)).astype(np.uint8)
    frames = np.stack([encode_imbe7100_ecc(b) for b in bits90])
    vc_dibits = provoice_stream_dibits(frames, lid=0x2BAD, bf=0x0042)

    # 9600-baud 2-level GFSK at 48 kHz (sps=5), wide deviation
    cc_bb = synth_c4fm(cc_dibits, sps=5, dev_hz=4800.0, snr_db=35, seed=1)
    vc_bb = synth_c4fm(vc_dibits, sps=5, dev_hz=4800.0, snr_db=35, seed=2)
    n = max(len(cc_bb), len(vc_bb)) + 400
    cc_bb = np.pad(cc_bb, (200, n - len(cc_bb) - 200))
    vc_bb = np.pad(vc_bb, (200, n - len(vc_bb) - 200))

    fs_wb = n_ch * fs_ch
    cc_wb = np.asarray(resample(cc_bb, 48000, int(fs_wb)))
    vc_wb = np.asarray(resample(vc_bb, 48000, int(fs_wb)))
    t = np.arange(len(cc_wb))
    wb = (cc_wb * np.exp(2j * np.pi * 48000.0 * t / fs_wb)
          + vc_wb * np.exp(2j * np.pi * (-96000.0) * t / fs_wb))
    chans = np.asarray(channelize(wb.astype(np.complex64), n_ch))

    # 1) EDACS CC decodes the grant
    cc_ctx = decode_samples(chans[1], "edacs")
    text = "\n".join(e.line for e in cc_ctx.events)
    assert "Voice Group Channel Assignment" in text, text
    assert f"LCN [{lcn:02d}]" in text
    grants = [e for e in cc_ctx.events if e.fields.get("grant")]
    assert grants and grants[0].fields["lpcn"] == lcn

    # 2) follower resolves the LCN through the channel map and tunes
    cmap = ChannelMap()
    cmap.entries[lcn] = vc_rf
    tuned = {}

    def tune(freq_hz, kind):
        rel = freq_hz - rf_center
        tuned["bin"] = int(round(rel / fs_ch)) % n_ch
        return True

    sm = TrunkSM(tune)
    follower = TrunkFollower(sm, cc_ctx, chan_map=cmap,
                             current_freq=lambda: rf_center + 48000.0)
    sm.on_cc_activity(rf_center + 48000.0)
    follower.on_event(grants[0])
    assert sm.phase.name == "TUNED"
    assert tuned["bin"] == 6

    # 3) the granted bin decodes the ProVoice superframe bit-exactly
    vc_ctx = decode_samples(chans[tuned["bin"]], "provoice")
    pv = [e for e in vc_ctx.events if "ProVoice" in e.line]
    assert pv, [e.line for e in vc_ctx.events]
    ev = pv[0]
    assert "LID: 2BAD" in ev.line and "BF: 0042" in ev.line
    got = ev.fields["imbe7100_frames"]
    # only schedule-carried positions compare (others never go on air)
    from dsdneo_tpu.protocol.provoice.encode import pair_bit_schedule
    mask = np.zeros((2, 7, 24), bool)
    for tag, w, x in pair_bit_schedule():
        if tag != "pad":
            mask[int(tag) - 1, w, x] = True
    for k in range(4):
        np.testing.assert_array_equal(got[k][mask[k % 2]],
                                      frames[k][mask[k % 2]])
    # and the hypothesis ECC reports clean frames (errs == 0)
    assert ev.fields["imbe7100_errs"] == [0, 0, 0, 0]
