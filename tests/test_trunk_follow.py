"""End-to-end trunk following over a channelized multi-channel capture:
a synthesized P25 control channel (IDEN_UP + voice grant TSBKs) on one
channelizer bin steers the TrunkSM to the voice channel's bin, where
TDULC link control decodes — the batched-serving flagship scenario
(SURVEY §2.8 / BASELINE config 5)."""

import numpy as np
import pytest

from tests.test_dsp import synth_c4fm

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)


def _bits_of(v, n):
    return np.array([(v >> (n - 1 - i)) & 1 for i in range(n)], dtype=np.uint8)


def _p25_frame(nac: int, duid: int, payload_dibits: np.ndarray) -> np.ndarray:
    """FS + NID + payload with status dibits at ≡35 (mod 36)."""
    from dsdneo_tpu.fec.blockcodes import bch_63_16
    from dsdneo_tpu.symbols import framesync
    sync = next(d for d in framesync.SYNC_DEFS if d.name == "+P25p1")
    fs = np.array([1 if c == "1" else 3 for c in sync.pattern], dtype=np.uint8)
    nid_bits = np.concatenate([bch_63_16().codebook[(nac << 4) | duid],
                               np.zeros(1, dtype=np.uint8)])
    nid = ((nid_bits[0::2] << 1) | nid_bits[1::2]).astype(np.uint8)
    body = list(fs) + list(nid) + list(payload_dibits)
    out = []
    i = 0
    k = 0
    while k < len(body):
        if i % 36 == 35:
            out.append(0)          # status dibit (stripped by the reader)
        else:
            out.append(int(body[k]))
            k += 1
        i += 1
    return np.array(out, dtype=np.uint8)


def _tsbk_bits(b: list) -> np.ndarray:
    from dsdneo_tpu.fec import crc
    bits = np.zeros(96, dtype=np.uint8)
    for i, v in enumerate(b[:10]):
        bits[8 * i:8 * i + 8] = _bits_of(int(v), 8)
    c = crc.crc16_bits(bits[:80], init=0, xorout=0xFFFF)
    bits[80:96] = _bits_of(c, 16)
    return bits


def _tdulc_payload(lc_bits72: np.ndarray) -> np.ndarray:
    from dsdneo_tpu.fec import rs
    from dsdneo_tpu.fec.blockcodes import golay_24_12
    hexwords = np.zeros(12, dtype=np.int64)
    for i in range(12):
        v = 0
        for b in lc_bits72[6 * i:6 * i + 6]:
            v = (v << 1) | int(b)
        hexwords[i] = v
    full = rs.rs_24_12_13().encode(hexwords)
    g24 = golay_24_12()
    dibits = []
    for w in range(12):
        msg = (int(full[2 * w]) << 6) | int(full[2 * w + 1])
        cw = g24.codebook[msg]
        dibits.extend(((cw[0::2] << 1) | cw[1::2]).tolist())
    return np.array(dibits, dtype=np.uint8)


def test_decode_wideband_two_channels():
    """engine.wideband must find both active channels in a 384 kHz band
    (os2 bank + halfband) and decode each with the right content."""
    from dsdneo_tpu.dsp.resampler import resample
    from dsdneo_tpu.engine.wideband import decode_wideband

    nac, tg, src = 0x140, 4321, 987654
    lc = np.zeros(72, dtype=np.uint8)
    lc[32:48] = _bits_of(tg, 16)
    lc[48:72] = _bits_of(src, 24)
    vc_frame = _p25_frame(nac, 0xF, _tdulc_payload(lc))
    vc_dibits = np.concatenate([np.zeros(60, np.uint8), vc_frame,
                                np.zeros(60, np.uint8)])
    bb = synth_c4fm(vc_dibits, snr_db=35, seed=3)
    bb = np.pad(bb, (200, 200))
    wbv = np.asarray(resample(bb, 48000, 384000))
    t = np.arange(len(wbv))
    wb = (wbv * np.exp(2j * np.pi * 48000.0 * t / 384000.0)
          + wbv * np.exp(2j * np.pi * (-96000.0) * t / 384000.0)
          ).astype(np.complex64)
    results = decode_wideband(wb, 384000.0, mode="p25p1")
    assert [r.freq_hz for r in results] == [-96000.0, 48000.0]
    for r in results:
        text = "\n".join(e.line for e in r.ctx.events)
        assert f"Group {tg} Source {src}" in text


def test_trunk_follow_channelized():
    import jax
    from dsdneo_tpu.dsp.channelizer import channel_frequencies, channelize
    from dsdneo_tpu.dsp.resampler import resample
    from dsdneo_tpu.engine import decode_samples
    from dsdneo_tpu.engine.trunk import GrantEvent, TrunkSM
    from dsdneo_tpu.fec import trellis

    nac, tg, src = 0x140, 4321, 987654
    rf_center = 851_000_000.0
    vc_rf = 850_904_000.0           # −96 kHz from centre → bin 6 of 8

    # control channel: one TSDU with IDEN_UP (standard) + group grant
    base_units = int(vc_rf / 5)     # iden 1 channel 0 lands on vc_rf
    iden_tsbk = _tsbk_bits([
        0x3D, 0x00,
        (1 << 4) | 0x0,                     # iden 1, bw hi nibble 0
        0x04,                               # bw lo, sign 0, raw hi
        0x00 | 0x00,                        # raw lo<<2 | spac hi
        0x64,                               # spacing 100 (12.5 kHz)
        (base_units >> 24) & 0xFF, (base_units >> 16) & 0xFF,
        (base_units >> 8) & 0xFF, base_units & 0xFF])
    grant_tsbk = _tsbk_bits([
        0x80 | 0x00, 0x00,                  # LB | opcode 0x00, MFID std
        0x00,                               # SVC
        (1 << 4) | 0x00, 0x00,              # channel = iden 1, chan 0
        (tg >> 8) & 0xFF, tg & 0xFF,
        (src >> 16) & 0xFF, (src >> 8) & 0xFF, src & 0xFF])
    payload = np.concatenate([trellis.p25_12_encode(iden_tsbk),
                              trellis.p25_12_encode(grant_tsbk)])
    pd = ((payload[0::2] << 1) | payload[1::2]).astype(np.uint8)
    cc_frame = _p25_frame(nac, 0x7, pd)
    cc_dibits = np.concatenate([np.zeros(60, np.uint8), cc_frame,
                                np.zeros(60, np.uint8)])

    # voice channel: TDULC frames with Group Voice Channel User LCW
    lc = np.zeros(72, dtype=np.uint8)
    lc[32:48] = _bits_of(tg, 16)
    lc[48:72] = _bits_of(src, 24)
    vc_frame = _p25_frame(nac, 0xF, _tdulc_payload(lc))
    vc_dibits = np.concatenate([np.zeros(60, np.uint8), vc_frame,
                                np.zeros(40, np.uint8), vc_frame,
                                np.zeros(60, np.uint8)])

    cc_bb = synth_c4fm(cc_dibits, snr_db=35, seed=1)
    vc_bb = synth_c4fm(vc_dibits, snr_db=35, seed=2)
    n = max(len(cc_bb), len(vc_bb)) + 400
    cc_bb = np.pad(cc_bb, (200, n - len(cc_bb) - 200))
    vc_bb = np.pad(vc_bb, (200, n - len(vc_bb) - 200))

    # wideband assembly at 384 kHz: CC at +48 kHz (bin 1), VC at −96 kHz
    n_ch, fs_ch = 8, 48000.0
    fs_wb = n_ch * fs_ch
    cc_wb = np.asarray(resample(cc_bb, 48000, 384000))
    vc_wb = np.asarray(resample(vc_bb, 48000, 384000))
    t = np.arange(len(cc_wb))
    wb = (cc_wb * np.exp(2j * np.pi * 48000.0 * t / fs_wb)
          + vc_wb * np.exp(2j * np.pi * (-96000.0) * t / fs_wb))
    chans = np.asarray(channelize(wb.astype(np.complex64), n_ch))

    # 1) decode the control channel bin
    cc_ctx = decode_samples(chans[1], "p25p1")
    cc_text = "\n".join(e.line for e in cc_ctx.events)
    assert "Identifier Update (8.3.1.23)" in cc_text
    assert f"TG [{tg}]" in cc_text
    freq = cc_ctx.state.iden_table.channel_to_freq(0x1000)
    assert freq == pytest.approx(vc_rf)

    # 2) trunk SM maps the grant frequency to a channelizer bin and tunes
    tuned = {}

    def tune(freq_hz, kind):
        rel = freq_hz - rf_center
        tuned["bin"] = int(round(rel / fs_ch)) % n_ch
        return True

    sm = TrunkSM(tune)
    sm.on_cc_activity(rf_center + 48000.0)
    assert sm.on_grant(GrantEvent(freq_hz=freq, tg=tg, src=src))
    assert sm.phase.name == "TUNED"
    assert tuned["bin"] == 6

    # 3) decode the voice channel bin the SM selected
    vc_ctx = decode_samples(chans[tuned["bin"]], "p25p1")
    vc_text = "\n".join(e.line for e in vc_ctx.events)
    assert f"Group Voice Channel User - Group {tg} Source {src}" in vc_text


def test_channel_map_csv(tmp_path):
    from dsdneo_tpu.engine.trunk import ChannelMap
    p = tmp_path / "chan.csv"
    p.write_text("ChannelNumber(dec),frequency(Hz) (do not delete)\n"
                 "999,456318750,default cc\n36,455756250\njunk,row\n")
    m = ChannelMap()
    assert m.import_csv(str(p)) == 2
    assert m.freq(999) == 456318750.0
    assert m.freq(36) == 455756250.0
    assert m.freq(1) is None


def test_trunk_scan_targets_csv(tmp_path):
    from dsdneo_tpu.engine.trunk import (TrunkScanner,
                                         import_trunk_scan_targets,
                                         load_scan_targets)
    p = tmp_path / "targets.csv"
    p.write_text(
        "id,type,frequency_hz,chan_csv,dwell_ms,activity_hold_ms,notes,"
        "modulation,rtl_gain\n"
        "county-p25,p25-trunk,851012500,,3000,,P25 CC,auto,\n"
        "city-dmr,dmr-trunk,456318750,dmr.csv,3000,,DMR T3,auto,\n"
        "bad,, not_a_freq,,,,,,\n")
    ts = import_trunk_scan_targets(str(p))
    assert [t.id for t in ts] == ["county-p25", "city-dmr"]
    assert ts[1].chan_csv == "dmr.csv" and ts[0].dwell_ms == 3000

    tunes = []
    clock = [0.0]
    sc = TrunkScanner(tune=lambda f, why: tunes.append((f, why)) or True,
                      dwell_s=1.0, hold_s=0.0, now_fn=lambda: clock[0])
    assert load_scan_targets(sc, str(p)) == 2
    sc.tick()
    assert tunes[-1][0] == 851012500.0
    clock[0] = 1.5
    sc.tick()
    assert tunes[-1][0] == 456318750.0


def test_trunk_follow_p25p2_tdma_grant():
    """BASELINE config "P25p2 trunk-follow": the P1 control channel
    announces a TDMA identifier (IDEN_UP_TDMA, 2-slot) and grants a
    TDMA channel; the TrunkSM resolves frequency AND slot, tunes the
    channelizer bin, and the P25p2 decoder synthesizes 4V voice there."""
    from dsdneo_tpu.dsp.channelizer import channelize
    from dsdneo_tpu.dsp.resampler import resample
    from dsdneo_tpu.engine import decode_samples
    from dsdneo_tpu.engine.trunk import GrantEvent, TrunkSM
    from dsdneo_tpu.fec import trellis
    from dsdneo_tpu.protocol.dmr.ambe_frame import AMBE_MAP
    from dsdneo_tpu.protocol.p25 import p2_xcch
    from dsdneo_tpu.protocol.p25.imbe_frame import _pn_bits, golay_23_12
    from dsdneo_tpu.protocol.p25.phase2 import DUID_CANONICAL, DUID_OFFSETS
    from dsdneo_tpu.symbols import framesync

    wacn, sysid, nac = 0xBEE00, 0x14C, 0x140
    tg, src = 4321, 987654
    rf_center = 851_000_000.0
    vc_rf = 850_904_000.0           # −96 kHz → bin 6 of 8

    # CC: IDEN_UP_TDMA (iden 2, channel type 3 = 2-slot FDMA pair) +
    # group grant on channel (iden 2, chan 1) → vc_rf slot 1
    base_units = int(vc_rf / 5)
    iden_tsbk = _tsbk_bits([
        0x33, 0x00,
        (2 << 4) | 0x3,                      # iden 2, chan type 3
        0x00,                                # sign 0, raw hi
        0x00, 0x64,                          # raw lo | spacing 100
        (base_units >> 24) & 0xFF, (base_units >> 16) & 0xFF,
        (base_units >> 8) & 0xFF, base_units & 0xFF])
    grant_tsbk = _tsbk_bits([
        0x80 | 0x00, 0x00,                   # LB | opcode 0x00, MFID std
        0x00,                                # SVC
        (2 << 4) | 0x00, 0x01,               # channel = iden 2, chan 1
        (tg >> 8) & 0xFF, tg & 0xFF,
        (src >> 16) & 0xFF, (src >> 8) & 0xFF, src & 0xFF])
    payload = np.concatenate([trellis.p25_12_encode(iden_tsbk),
                              trellis.p25_12_encode(grant_tsbk)])
    pd = ((payload[0::2] << 1) | payload[1::2]).astype(np.uint8)
    cc_frame = _p25_frame(nac, 0x7, pd)
    cc_dibits = np.concatenate([np.zeros(60, np.uint8), cc_frame,
                                np.zeros(60, np.uint8)])
    cc_bb = synth_c4fm(cc_dibits, snr_db=35, seed=1)

    # VC: P25p2 sync + ts0 carrying a 4V voice timeslot (position 0)
    g23 = golay_23_12()
    rng = np.random.default_rng(4)

    def encode_ambe72(c0_msg, c1_msg, c2, c3):
        fr = np.zeros((4, 24), dtype=np.uint8)
        cw0 = g23.codebook[c0_msg]
        fr[0][0:23] = cw0
        fr[0][23] = int(cw0.sum()) & 1
        pn = _pn_bits(c0_msg, 23)[::-1]
        fr[1][0:23] = g23.codebook[c1_msg] ^ pn
        fr[2][:11] = _bits_of(c2, 11)
        fr[3][:14] = _bits_of(c3, 14)
        bits = np.zeros(72, dtype=np.uint8)
        for j, (hr, hc, lr, lc) in enumerate(AMBE_MAP):
            bits[2 * j] = fr[hr][hc]
            bits[2 * j + 1] = fr[lr][lc]
        return bits

    scr = p2_xcch.generate_scramble_bits(wacn, sysid, nac, 4800)
    ts = np.zeros(360, dtype=np.uint8)
    for off in (2, 76, 172, 246):
        ts[off:off + 72] = encode_ambe72(int(rng.integers(0, 4096)),
                                         int(rng.integers(0, 4096)),
                                         int(rng.integers(0, 2048)),
                                         int(rng.integers(0, 16384)))
    mask = scr[20:380]
    keep = np.zeros(360, dtype=bool)
    for off in (2, 76, 172, 246):
        keep[off:off + 72] = True
    ts = np.where(keep, ts ^ mask, ts)
    cw = DUID_CANONICAL[0]                      # 4V
    for k, off in enumerate(DUID_OFFSETS):
        ts[off] = (cw >> (7 - k)) & 1
    ts[320:360] = _bits_of(p2_xcch.isch_codeword((1 << 5) | 0), 40)
    bits = np.concatenate([ts, np.zeros(3 * 360, np.uint8)])
    p2_payload = ((bits[0::2] << 1) | bits[1::2]).astype(np.uint8)
    p2_sync = next(d for d in framesync.SYNC_DEFS
                   if d.protocol == "p25p2" and not d.inverted)
    p2_sync_d = np.array([1 if c == "1" else 3 for c in p2_sync.pattern],
                         dtype=np.uint8)
    vc_dibits = np.concatenate([np.zeros(60, np.uint8), p2_sync_d,
                                p2_payload, np.zeros(60, np.uint8)])
    vc_bb = synth_c4fm(vc_dibits, sps=8, snr_db=35, seed=2)

    n = max(len(cc_bb), len(vc_bb)) + 400
    cc_bb = np.pad(cc_bb, (200, n - len(cc_bb) - 200))
    vc_bb = np.pad(vc_bb, (200, n - len(vc_bb) - 200))
    n_ch, fs_ch = 8, 48000.0
    fs_wb = n_ch * fs_ch
    cc_wb = np.asarray(resample(cc_bb, 48000, 384000))
    vc_wb = np.asarray(resample(vc_bb, 48000, 384000))
    t = np.arange(len(cc_wb))
    wb = (cc_wb * np.exp(2j * np.pi * 48000.0 * t / fs_wb)
          + vc_wb * np.exp(2j * np.pi * (-96000.0) * t / fs_wb))
    chans = np.asarray(channelize(wb.astype(np.complex64), n_ch))

    # 1) CC decode: TDMA iden learned, grant resolves freq + slot
    cc_ctx = decode_samples(chans[1], "p25p1")
    cc_text = "\n".join(e.line for e in cc_ctx.events)
    assert "Identifier Update for TDMA" in cc_text
    it = cc_ctx.state.iden_table
    assert it.channel_to_freq(0x2001) == pytest.approx(vc_rf)
    assert it.channel_to_slot(0x2001) == 1

    # 2) trunk SM tunes the bin
    tuned = {}

    def tune(freq_hz, kind):
        tuned["bin"] = int(round((freq_hz - rf_center) / fs_ch)) % n_ch
        return True

    sm = TrunkSM(tune)
    sm.on_cc_activity(rf_center + 48000.0)
    assert sm.on_grant(GrantEvent(freq_hz=it.channel_to_freq(0x2001),
                                  tg=tg, src=src))
    assert tuned["bin"] == 6

    # 3) P25p2 voice decodes on the tuned bin (params from the CC
    # system, the reference's -X equivalents)
    vc_ctx = decode_samples(chans[tuned["bin"]], "p25p2",
                            p2_params=(wacn, sysid, nac))
    vc_text = "\n".join(e.line for e in vc_ctx.events)
    assert "4V" in vc_text
    assert 0 in vc_ctx.audio
    assert sum(len(c) for c in vc_ctx.audio[0]) >= 4 * 160
