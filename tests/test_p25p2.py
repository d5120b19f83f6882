"""P25 Phase 2 SACCH/FACCH loopback: scramble, ISCH, RS(63,35), CRC12
and MAC PDU parse via synthesized timeslots."""

import numpy as np
import pytest


def _bits_of(v, n):
    return np.array([(v >> (n - 1 - i)) & 1 for i in range(n)], dtype=np.uint8)


def test_isch_affine_roundtrip():
    from dsdneo_tpu.protocol.p25.p2_xcch import isch_codeword, isch_lookup
    for v in range(128):
        w = isch_codeword(v)
        assert isch_lookup(w) == v
        assert isch_lookup(w ^ 0b101) == v       # 2-bit error corrected


def test_scramble_known_prefix():
    """LFSR self-consistency: deterministic, seed-dependent."""
    from dsdneo_tpu.protocol.p25.p2_xcch import generate_scramble_bits
    a = generate_scramble_bits(0xBEE00, 0x14C, 0x140, 64)
    b = generate_scramble_bits(0xBEE00, 0x14C, 0x140, 64)
    c = generate_scramble_bits(0xBEE00, 0x14C, 0x141, 64)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    # first output bit is seed bit 43
    seed = (0xBEE00 << 24) | (0x14C << 12) | 0x140
    assert a[0] == (seed >> 43) & 1


def test_xcch_rs_roundtrip():
    from dsdneo_tpu.protocol.p25 import p2_xcch
    rng = np.random.default_rng(0)
    for kind, nbits in (("sacch", 180), ("facch", 156)):
        payload = rng.integers(0, 2, nbits).astype(np.uint8)
        parity = p2_xcch.xcch_rs_encode(payload, kind)
        got, nerr = p2_xcch.xcch_rs_decode(payload, parity, kind)
        assert nerr >= 0          # erased (untransmitted) symbols count
        assert np.array_equal(got, payload)
        # flip a few payload bits → corrected
        bad = payload.copy()
        bad[[5, 40, 90]] ^= 1
        got, nerr = p2_xcch.xcch_rs_decode(bad, parity, kind)
        assert nerr >= 0
        assert np.array_equal(got, payload)


def _make_sacch_ts(payload180, duid_idx, isch_val, scramble=None, sf_pos=0):
    from dsdneo_tpu.protocol.p25 import p2_xcch
    from dsdneo_tpu.protocol.p25.phase2 import DUID_CANONICAL, DUID_OFFSETS
    parity = p2_xcch.xcch_rs_encode(payload180, "sacch")
    ts = np.zeros(360, dtype=np.uint8)
    p2_xcch.insert_sacch(ts, payload180, parity)
    if scramble is not None:
        base = 360 * sf_pos + 20
        mask = np.zeros(360, dtype=np.uint8)
        mask[:] = scramble[base:base + 360]
        # scramble only the payload/parity positions; DUID+ISCH stay clear
        keep = np.zeros(360, dtype=bool)
        keep[2:74] = keep[76:184] = keep[184:244] = keep[246:318] = True
        ts = np.where(keep, ts ^ mask, ts)
    cw = DUID_CANONICAL[duid_idx]
    for k, off in enumerate(DUID_OFFSETS):
        ts[off] = (cw >> (7 - k)) & 1
    ts[320:360] = _bits_of(p2_xcch.isch_codeword(isch_val), 40)
    return ts


def test_p25p2_sacch_mac_loopback():
    """Scrambled SACCH carrying MAC_IDLE + Network Status Broadcast
    decodes through the real Phase 2 decoder."""
    from dsdneo_tpu.protocol.base import DecoderContext, DibitReader
    from dsdneo_tpu.protocol.p25 import p2_xcch
    from dsdneo_tpu.protocol.p25.phase2 import P25P2Decoder
    from dsdneo_tpu.symbols import framesync

    wacn, sysid, nac = 0xBEE00, 0x14C, 0x140
    payload = np.zeros(180, dtype=np.uint8)
    payload[0:3] = [0, 1, 1]                    # MAC_IDLE header opcode 3
    mac = np.zeros(22, dtype=np.int64)
    mac[1] = 0x7B                               # Network Status Broadcast
    mac[2] = 0x00                               # LRA
    mac[3] = (wacn >> 12) & 0xFF
    mac[4] = (wacn >> 4) & 0xFF
    mac[5] = ((wacn & 0xF) << 4) | (sysid >> 8)
    mac[6] = sysid & 0xFF
    mac[7] = 0x21                               # CHAN-T hi
    mac[8] = 0x14                               # CHAN-T lo
    for i in range(1, 21):
        payload[8 * i:8 * i + 8] = _bits_of(int(mac[i]), 8)
    # CRC12 over first 168 bits
    buf = np.concatenate([payload[:168], np.zeros(12, np.uint8)])
    poly = [1, 1, 0, 0, 0, 1, 0, 0, 1, 0, 1, 1, 1]
    for i in range(168):
        if buf[i]:
            for j in range(13):
                buf[i + j] ^= poly[j]
    crc = 0
    for i in range(12):
        crc = (crc << 1) | int(buf[168 + i])
    payload[168:180] = _bits_of(crc ^ 0xFFF, 12)

    scr = p2_xcch.generate_scramble_bits(wacn, sysid, nac, 4800)
    # superframe: ts0 at position 0 (ISCH chan1 loc0), duid 3 = scrambled SACCH
    tss = [_make_sacch_ts(payload, 3, (1 << 5) | (0 << 3), scr, sf_pos=k)
           for k in range(4)]
    bits = np.concatenate(tss)
    dibits = ((bits[0::2] << 1) | bits[1::2]).astype(np.uint8)

    ctx = DecoderContext()
    ctx.state.p2_wacn, ctx.state.p2_sysid, ctx.state.p2_cc = wacn, sysid, nac
    dec = P25P2Decoder()

    sync_def = next(d for d in framesync.SYNC_DEFS
                    if d.protocol == "p25p2" and not d.inverted)
    sync_d = np.array([1 if c == "1" else 3 for c in sync_def.pattern],
                      dtype=np.uint8)
    stream = np.concatenate([sync_d, dibits])
    lv = np.array([1.0, 3.0, -1.0, -3.0], dtype=np.float32)
    hits = framesync.find_syncs(lv[stream], [sync_def], threshold=0.9)
    assert hits, "sync not found"
    r = DibitReader(stream, lv[stream], pos=hits[0].end,
                    frame_start=hits[0].pos, invert=False)
    dec.handle(r, hits[0], ctx)
    text = "\n".join(e.line for e in ctx.events)
    assert "SACCH" in text
    assert "MAC_IDLE" in text
    assert "Network Status Broadcast" in text
    assert "WACN [BEE00] SYSID [14C]" in text
    assert "CHAN-T [2114]" in text


def test_p25_mpdu_loopback():
    """Synthesized MPDU (header + 2 data blocks) through the real P1
    decoder's packet-data path."""
    import numpy as np
    from dsdneo_tpu.fec import crc, trellis
    from dsdneo_tpu.protocol.base import DecoderContext, DibitReader
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder

    hdr = np.zeros(96, dtype=np.uint8)
    by = np.zeros(12, dtype=np.int64)
    by[0] = (1 << 5) | 0x16          # IO=1, FMT=0x16 unconfirmed
    by[1] = 0x04                      # SAP 4 = IP Data
    by[2] = 0x00
    by[3], by[4], by[5] = 0x01, 0x23, 0x45   # LLID 74565
    by[6] = 2                         # 2 blocks
    for i in range(10):
        hdr[8 * i:8 * i + 8] = _bits_of(int(by[i]), 8)
    c = crc.crc16_bits(hdr[:80], init=0, xorout=0xFFFF)
    hdr[80:96] = _bits_of(c, 16)

    rng = np.random.default_rng(9)
    blocks = [hdr] + [rng.integers(0, 2, 96).astype(np.uint8)
                      for _ in range(2)]
    bits = np.concatenate([trellis.p25_12_encode(b) for b in blocks])
    dibits = ((bits[0::2] << 1) | bits[1::2]).astype(np.uint8)
    soft = np.array([1.0, 3.0, -1.0, -3.0], dtype=np.float32)[dibits]

    ctx = DecoderContext()
    dec = P25P1Decoder()
    r = DibitReader(dibits, soft, pos=0, frame_start=0, invert=False)

    class _Hit:
        pos = 0
    dec._mpdu(r, _Hit(), ctx)
    text = "\n".join(e.line for e in ctx.events)
    assert "P25 Data - AN: 0; IO: 1; FMT: 16;" in text
    assert "SAP: 04 [Packet Data]" in text
    assert "DST LLID: 74565;" in text
    assert "P25 PDU Payload (24 bytes)" in text


def test_p25p2_4v_voice_loopback():
    """Synthesized 4V timeslot: scrambled AMBE frames decode and
    synthesize through the real Phase 2 decoder."""
    from dsdneo_tpu.protocol.base import DecoderContext, DibitReader
    from dsdneo_tpu.protocol.dmr.ambe_frame import AMBE_MAP
    from dsdneo_tpu.protocol.p25 import p2_xcch
    from dsdneo_tpu.protocol.p25.imbe_frame import golay_23_12, _pn_bits
    from dsdneo_tpu.protocol.p25.phase2 import (DUID_CANONICAL, DUID_OFFSETS,
                                                P25P2Decoder)
    from dsdneo_tpu.symbols import framesync

    wacn, sysid, nac = 0xBEE00, 0x14C, 0x140
    g23 = golay_23_12()

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
    rng = np.random.default_rng(4)
    for off in (2, 76, 172, 246):
        ts[off:off + 72] = encode_ambe72(int(rng.integers(0, 4096)),
                                         int(rng.integers(0, 4096)),
                                         int(rng.integers(0, 2048)),
                                         int(rng.integers(0, 16384)))
    # scramble voice regions (position 0 in the superframe)
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
    dibits = ((bits[0::2] << 1) | bits[1::2]).astype(np.uint8)

    ctx = DecoderContext()
    ctx.state.p2_wacn, ctx.state.p2_sysid, ctx.state.p2_cc = wacn, sysid, nac
    dec = P25P2Decoder()
    sync_def = next(d for d in framesync.SYNC_DEFS
                    if d.protocol == "p25p2" and not d.inverted)
    sync_d = np.array([1 if c == "1" else 3 for c in sync_def.pattern],
                      dtype=np.uint8)
    stream = np.concatenate([sync_d, dibits])
    lv = np.array([1.0, 3.0, -1.0, -3.0], dtype=np.float32)
    hits = framesync.find_syncs(lv[stream], [sync_def], threshold=0.9)
    r = DibitReader(stream, lv[stream], pos=hits[0].end,
                    frame_start=hits[0].pos, invert=False)
    dec.handle(r, hits[0], ctx)
    text = "\n".join(e.line for e in ctx.events)
    assert "4V" in text
    assert 0 in ctx.audio and len(ctx.audio[0]) >= 1
    total = sum(len(c) for c in ctx.audio[0])
    assert total >= 4 * 160 and total % (4 * 160) == 0   # 160/frame


def test_p2_audio_jitter_ring():
    """Bounded-latency per-slot ring: drop-oldest when full, zero-fill
    when empty (reference p25_p2_audio_ring.h contract)."""
    import numpy as np
    from dsdneo_tpu.runtime.jitter import P2AudioJitterRing
    r = P2AudioJitterRing(capacity_frames=3)
    for i in range(5):
        assert r.push(0, np.full(160, float(i), dtype=np.float32))
    assert r.depth(0) == 3 and r.dropped[0] == 2
    fr, ok = r.pop(0)
    assert ok and fr[0] == 2.0            # oldest two were dropped
    # slot isolation
    assert r.depth(1) == 0
    fr, ok = r.pop(1)
    assert not ok and not fr.any() and r.underruns[1] == 1
    # push_pcm splits bursts into frames
    assert r.push_pcm(1, np.ones(160 * 2 + 50, dtype=np.float32)) == 2
    assert r.depth(1) == 2
    # invalid inputs rejected
    assert not r.push(2, np.zeros(160, dtype=np.float32))
    assert not r.push(0, np.zeros(100, dtype=np.float32))
    r.reset()
    assert r.depth(0) == 0 and r.depth(1) == 0


def test_p25p2_ess_rs_roundtrip_stages_rekey():
    """ESS RS(44,16,29): ALG/KID/MI hexbits + RS(63,35) parity decode and
    stage the next-superframe crypto (reference p25p2_ess_decode)."""
    from dsdneo_tpu.fec import rs
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.p25 import p2_xcch
    from dsdneo_tpu.protocol.p25.phase2 import P25P2Decoder

    alg, kid, mi = 0xAA, 0x0001, 0x1234567890ABCDEF
    bits = np.concatenate([_bits_of(alg, 8), _bits_of(kid, 16),
                           _bits_of(mi, 64), _bits_of(0xA5, 8)])
    vec = np.zeros(35, dtype=np.int64)
    vec[19:35] = p2_xcch._hexpack(bits)
    full = rs.rs_63_35().encode(vec)
    parity_bits = np.zeros(168, dtype=np.uint8)
    for i in range(28):
        parity_bits[6 * i:6 * i + 6] = _bits_of(int(full[35 + i]), 6)

    dec = P25P2Decoder()
    dec.ess_b[0][:] = bits
    x = np.zeros(360, dtype=np.uint8)
    x[148:244] = parity_bits[:96]
    x[246:318] = parity_bits[96:]
    # corrupt a couple of payload bits -> RS must fix them
    dec.ess_b[0][5] ^= 1
    dec.ess_b[0][40] ^= 1
    detail = dec._process_ess(x, 0, DecoderContext())
    assert "ESS_B" in detail
    cs = dec.crypto[0]
    assert (cs["alg"], cs["kid"], cs["mi"]) == (alg, kid, mi)
    assert cs["drop"] == 256


def test_p25p2_rc4_voice_decrypt_roundtrip():
    """P2 ADP/RC4 voice: 18-frame superframe keystream (drop 256, +7 per
    frame, 5-byte key + 8-byte MI) decrypts what the same convention
    encrypted (reference mbeslot_*_apply_p25p2_rc4)."""
    from dsdneo_tpu.crypto.keyring import KeyRing
    from dsdneo_tpu.crypto.keystream import rc4_keystream
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.p25.phase2 import P25P2Decoder

    key, kid, mi = 0x0102030405, 0x21, 0xDEADBEEF12345678
    rng = np.random.default_rng(7)
    plain = rng.integers(0, 2, (18, 49)).astype(np.uint8)
    rckey = key.to_bytes(5, "big") + mi.to_bytes(8, "big")
    cipher = np.zeros_like(plain)
    drop = 256
    for i in range(18):
        ks = rc4_keystream(rckey, 7, drop=drop)
        drop += 7
        cipher[i] = np.unpackbits(np.packbits(plain[i]) ^ ks)[:49]

    ctx = DecoderContext()
    kr = KeyRing()
    kr.scalar[kid] = key
    ctx.state.keyring = kr
    dec = P25P2Decoder()
    dec.crypto[0].update(alg=0xAA, kid=kid, mi=mi, drop=256)
    got = np.stack([dec._decrypt_ambe(cipher[i], 0, ctx)
                    for i in range(18)])
    np.testing.assert_array_equal(got, plain)
    # without the key in the ring: frames pass through untouched
    ctx2 = DecoderContext()
    dec2 = P25P2Decoder()
    dec2.crypto[0].update(alg=0xAA, kid=kid, mi=mi, drop=256)
    np.testing.assert_array_equal(dec2._decrypt_ambe(cipher[0], 0, ctx2),
                                  cipher[0])


def test_p2_scramble_seed_recovery_synthetic():
    """Blind WACN/SYS/NAC recovery: the keystream and RS parity map are
    GF(2)-linear, so one clean scrambled SACCH determines the 44-bit
    seed (p2_xcch.recover_scramble_seed)."""
    import numpy as np
    from dsdneo_tpu.protocol.p25 import p2_xcch

    rng = np.random.default_rng(11)
    wacn, sysid, nac = 0x92ABC, 0x3D5, 0x29F
    ks = p2_xcch.generate_scramble_bits(wacn, sysid, nac, 4340)
    bursts = []
    for p in (2, 7, 11):
        payload = rng.integers(0, 2, 180).astype(np.uint8)
        parity = p2_xcch.xcch_rs_encode(payload, "sacch")
        ts = np.zeros(360, np.uint8)
        p2_xcch.insert_sacch(ts, payload, parity)
        base = 360 * p + 20
        bursts.append(((ts ^ ks[base:base + 360]).astype(np.uint8),
                       p, "sacch"))
    assert p2_xcch.recover_scramble_seed(bursts) == (wacn, sysid, nac)

    # a corrupted burst must not produce a (wrong) accepted seed:
    # its overdetermined system goes inconsistent and is skipped
    bad = bursts[0][0].copy()
    bad[40] ^= 1
    assert p2_xcch.recover_scramble_seed([(bad, 2, "sacch")]) is None
    # ...and mixed in with clean bursts, recovery still succeeds
    assert p2_xcch.recover_scramble_seed(
        [(bad, 2, "sacch")] + bursts[1:]) == (wacn, sysid, nac)


def test_p2_scramble_seed_recovery_facch():
    """FACCH bursts (114 parity equations) also solve the seed."""
    import numpy as np
    from dsdneo_tpu.protocol.p25 import p2_xcch

    rng = np.random.default_rng(13)
    wacn, sysid, nac = 0xABCDE, 0x0FF, 0x5A5
    ks = p2_xcch.generate_scramble_bits(wacn, sysid, nac, 4340)
    payload = rng.integers(0, 2, 156).astype(np.uint8)
    parity = p2_xcch.xcch_rs_encode(payload, "facch")
    ts = np.zeros(360, np.uint8)
    p2_xcch.insert_facch(ts, payload, parity)
    base = 360 * 5 + 20
    got = p2_xcch.recover_scramble_seed(
        [((ts ^ ks[base:base + 360]).astype(np.uint8), 5, "facch")])
    assert got == (wacn, sysid, nac)
