"""Vendor keystreams, keyring import, secret redaction."""

import numpy as np
import pytest


def test_kenwood_scrambler_period():
    from dsdneo_tpu.crypto.vendor import kenwood_scrambler_keystream
    a = kenwood_scrambler_keystream(1)
    b = kenwood_scrambler_keystream(1)
    c = kenwood_scrambler_keystream(12345)
    assert np.array_equal(a, b) and not np.array_equal(a, c)
    # direct recurrence check against the reference formula
    lfsr = 12345
    for i in range(100):
        assert c[i] == lfsr & 1
        bit = ((lfsr >> 1) ^ lfsr) & 1
        lfsr = (lfsr >> 1) | (bit << 14)


def test_anytone_bp_permutation():
    from dsdneo_tpu.crypto.vendor import anytone_bp_keystream
    ks = anytone_bp_keystream(0x1234)
    # nib1=~1=E, nib2=2+8=A, nib3=~3=C, nib4=4+8=C → EACC
    want = np.array([(0xEACC >> (15 - i)) & 1 for i in range(16)],
                    dtype=np.uint8)
    assert np.array_equal(ks, want)


def test_hytera_bp_40bit_cycle():
    from dsdneo_tpu.crypto.vendor import (hytera_bp_apply_frame49,
                                          hytera_bp_keystream)
    ks = hytera_bp_keystream(0x123456789A)
    assert len(ks) == 882
    # 40-bit key: keystream repeats with period 40
    assert np.array_equal(ks[:40], ks[40:80])
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 2, 49).astype(np.uint8)
    enc = hytera_bp_apply_frame49(ks, 3, frame)
    dec = hytera_bp_apply_frame49(ks, 3, enc)
    assert np.array_equal(dec, frame)
    assert not np.array_equal(enc, frame)


def test_static_keystream_roundtrip_and_silence_skip():
    from dsdneo_tpu.crypto.vendor import AMBE_SILENT_49, StaticKeystream
    ks = StaticKeystream.parse("DEADBEEF:32")
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 2, 49).astype(np.uint8) for _ in range(3)]
    enc = [ks.apply_frame49(f) for f in frames]
    ks2 = StaticKeystream.parse("DEADBEEF:32")
    dec = [ks2.apply_frame49(e) for e in enc]
    for f, d in zip(frames, dec):
        assert np.array_equal(f, d)
    # silence frame passes through untouched but advances the counter
    sil = np.array([(AMBE_SILENT_49 >> (48 - i)) & 1 for i in range(49)],
                   dtype=np.uint8)
    ks3 = StaticKeystream.parse("DEADBEEF:32")
    out = ks3.apply_frame49(sil)
    assert np.array_equal(out, sil)
    assert ks3.counter[0] != 0


def test_keyring_imports_and_redaction(tmp_path):
    from dsdneo_tpu.crypto.keyring import REDACTED, KeyRing
    dec = tmp_path / "keys.csv"
    dec.write_text("key id (dec), value (dec)\n2,70\n1,123\n")
    hexf = tmp_path / "keys_hex.csv"
    hexf.write_text("key id(hex), key value (hex)\nC,0B57935150\n")
    aes = tmp_path / "aes.csv"
    aes.write_text("keyid(hex), keyvalue(hex)\n"
                   "0001,0000000000000000,0000002823d87923\n"
                   "0004,0101010101010101,0101010101010101,"
                   "0101010101010101,0101010101010101\n")
    kr = KeyRing()
    assert kr.import_dec_csv(str(dec)) == 2
    assert kr.import_hex_csv(str(hexf)) == 1
    assert kr.import_aes_csv(str(aes)) == 2
    assert kr.scalar[2] == 70 and kr.scalar[0xC] == 0x0B57935150
    assert len(kr.aes[1]) == 16 and len(kr.aes[4]) == 32
    text = kr.describe(show_keys=False)
    assert REDACTED in text and "0B57935150" not in text
    text = kr.describe(show_keys=True)
    assert "B57935150" in text


def test_p25_adp_voice_decrypt_reference_offsets():
    """ADP/RC4 voice decrypt must consume the keystream exactly like the
    reference: absolute drop 267 at superframe start (p25p1_hdu.c:429),
    +11 per frame, +2 across the LSD before frame 9 (p25p1_ldu1.c:185),
    keyed by 5-byte key ‖ top-8-bytes-of-MI."""
    from types import SimpleNamespace

    from dsdneo_tpu.crypto.keyring import KeyRing
    from dsdneo_tpu.crypto.keystream import rc4_keystream
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder

    key, kid, mi = 0x0123456789, 0x0001, 0x112233445566778800
    kr = KeyRing()
    kr.scalar[kid] = key
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 2, 88).astype(np.uint8) for _ in range(9)]

    # encrypt independently with the reference's exact layout
    rckey = key.to_bytes(5, "big") + (mi >> 8).to_bytes(8, "big")
    ks = rc4_keystream(rckey, 267 + 9 * 11 + 2)
    enc = []
    for i, f in enumerate(frames):
        off = 267 + 11 * i + (2 if i == 8 else 0)
        kb = np.unpackbits(ks[off:off + 11])[:88]
        enc.append(f ^ kb)

    dec = P25P1Decoder()
    ctx = SimpleNamespace(state=SimpleNamespace(
        keyring=kr, payload_algid=0xAA, payload_kid=kid, payload_mi=mi,
        ks_offset=0))
    for i, e in enumerate(enc):
        if i == 8:
            ctx.state.ks_offset += 2       # what _voice does across the LSD
        o = dec._decrypt_imbe(e, ctx)
        assert np.array_equal(frames[i], o), f"frame {i}"
    # without a key: passthrough
    ctx.state.keyring = None
    assert np.array_equal(dec._decrypt_imbe(enc[0], ctx), enc[0])


def test_p25_des_ofb_voice_decrypt_reference_offsets():
    """DES-OFB: octet counter starts at 19 (8 discard + 8 LC + 3
    reserved, dsd_mbe.c:367), +11 per frame, +2 across the LSD."""
    from types import SimpleNamespace

    from dsdneo_tpu.crypto.keyring import KeyRing
    from dsdneo_tpu.crypto.keystream import des_ofb_keystream
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder

    key, kid, mi = 0x0123456789ABCDEF, 0x0002, 0x112233445566778800
    kr = KeyRing()
    kr.scalar[kid] = key
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 2, 88).astype(np.uint8) for _ in range(9)]
    ks = des_ofb_keystream(key, mi >> 8, 19 + 9 * 11 + 2)
    enc = []
    for i, f in enumerate(frames):
        off = 19 + 11 * i + (2 if i == 8 else 0)
        kb = np.unpackbits(ks[off:off + 11])[:88]
        enc.append(f ^ kb)
    dec = P25P1Decoder()
    ctx = SimpleNamespace(state=SimpleNamespace(
        keyring=kr, payload_algid=0x81, payload_kid=kid, payload_mi=mi,
        ks_offset=0))
    for i, e in enumerate(enc):
        if i == 8:
            ctx.state.ks_offset += 2
        o = dec._decrypt_imbe(e, ctx)
        assert np.array_equal(frames[i], o), f"frame {i}"


def test_p25_ldu2_ess_staged_until_after_voice():
    """LDU2's newly decoded MI must NOT decrypt LDU2's own voice: the
    prior superframe keystream continues through LDU2, and the new ESS
    + offset reset apply afterwards (p25p1_ldu2.c:238-239 resets only
    at the end of ldu2_collect_voice_symbols)."""
    from dsdneo_tpu.crypto.keyring import KeyRing
    from dsdneo_tpu.crypto.keystream import rc4_keystream
    from dsdneo_tpu.protocol.p25 import imbe_frame as IF
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    from dsdneo_tpu.protocol.base import DecoderContext

    key, kid = 0x0123456789, 0x0001
    mi_old, mi_new = 0xAABBCCDDEEFF112200, 0x99887766554433 << 16

    # Build an LDU2 dibit stream: 9 encrypted IMBE frames + RS(24,16,9)
    # ESS carrying mi_new, with voice encrypted under mi_old.
    rng = np.random.default_rng(7)
    rckey = key.to_bytes(5, "big") + (mi_old >> 8).to_bytes(8, "big")
    ks = rc4_keystream(rckey, 267 + 9 * 11 + 2)
    frames, enc_ecc = [], []
    from dsdneo_tpu.vocoder.imbe import B0_HI_POS
    for i in range(9):
        off = 267 + 11 * i + (2 if i == 8 else 0)
        kb = np.unpackbits(ks[off:off + 11])[:88]
        pt = rng.integers(0, 2, 88).astype(np.uint8)
        pt[B0_HI_POS[0]] = 0       # b0 < 128: a valid VOICE frame (a
        # random plaintext can land in the tone/invalid b0 band, which
        # the voice loop now short-circuits before parameter decode)
        frames.append(pt)                  # expected plaintext
        enc_ecc.append(IF.encode_imbe_ecc(pt ^ kb))

    from dsdneo_tpu.fec import rs as rsmod
    es_bits = np.zeros(96, dtype=np.uint8)
    for j in range(72):
        es_bits[j] = (mi_new >> (71 - j)) & 1
    for j in range(8):
        es_bits[72 + j] = (0xAA >> (7 - j)) & 1
    for j in range(16):
        es_bits[80 + j] = (kid >> (15 - j)) & 1
    data16 = [int(sum(es_bits[i * 6 + j] << (5 - j) for j in range(6)))
              for i in range(16)]
    code = rsmod.rs_24_16_9()
    word24 = code.encode(np.asarray(data16, dtype=np.int64))

    # serialize in the decoder's _ldu2 read order
    from dsdneo_tpu.fec import blockcodes
    ham = blockcodes.hamming_10_6_3()
    dibits = []

    def push_bits(bits):
        for k in range(0, len(bits), 2):
            dibits.append((int(bits[k]) << 1) | int(bits[k + 1]))

    w = 0
    for seg in range(8):
        push_bits(enc_ecc[seg])
        if 1 <= seg <= 6:
            for _ in range(4):
                push_bits(ham.encode(int(word24[w]))); w += 1
        elif seg == 7:
            push_bits(np.zeros(32, dtype=np.uint8))   # LSD placeholder
    push_bits(enc_ecc[8])

    from types import SimpleNamespace
    from dsdneo_tpu.protocol.base import DibitReader
    kr = KeyRing(); kr.scalar[kid] = key
    ctx = DecoderContext()
    ctx.state.keyring = kr
    ctx.state.payload_algid, ctx.state.payload_kid = 0xAA, kid
    ctx.state.payload_mi, ctx.state.ks_offset = mi_old, 0

    decoded_params = []
    import dsdneo_tpu.vocoder.mbe as mbe
    orig_fn = mbe.decode_imbe_4400

    def spy(bits88, prev=None):
        decoded_params.append(np.asarray(bits88).copy())
        return orig_fn(bits88, prev=prev)

    mbe.decode_imbe_4400 = spy
    try:
        dibits += [0] * (900 - len(dibits))   # pad past the 820-dibit gate
        dd = np.asarray(dibits, dtype=np.uint8)
        reader = DibitReader(dd, np.zeros(len(dd), dtype=np.float32), pos=0)
        hit = SimpleNamespace(pos=0)
        P25P1Decoder()._ldu2(reader, hit, ctx)
    finally:
        mbe.decode_imbe_4400 = orig_fn

    # voice decrypted with the OLD mi → plaintext recovered
    assert len(decoded_params) == 9
    for i in range(9):
        assert np.array_equal(decoded_params[i], frames[i]), f"frame {i}"
    # new ESS installed + offset reset AFTER voice
    assert ctx.state.payload_mi == mi_new
    assert ctx.state.ks_offset == 0


def test_csi72_keystream():
    from dsdneo_tpu.crypto.vendor import csi72_keystream72
    key = bytes(range(1, 10))
    ks = csi72_keystream72(key)
    assert ks.shape == (72,)
    # independent derivation: bit i = bit (71-i) of reversed-byte key
    rev = bytes(key[8 - i] for i in range(9))
    bits = np.unpackbits(np.frombuffer(rev, dtype=np.uint8))
    for i in range(72):
        assert ks[i] == bits[71 - i]
    # involution: applying twice restores the frame
    rng = np.random.default_rng(0)
    fr = rng.integers(0, 2, 72).astype(np.uint8)
    assert np.array_equal((fr ^ ks) ^ ks, fr)
    with pytest.raises(ValueError):
        csi72_keystream72(b"short")


def test_tyt16_keystream_frame_phase():
    from dsdneo_tpu.crypto.vendor import tyt16_keystream72
    k0 = tyt16_keystream72(0xABCD, 0)
    k1 = tyt16_keystream72(0xABCD, 1)
    assert k0.shape == (72,) and not np.array_equal(k0, k1)
    # fnum 0 starts at bit 79 of the repeated 80-bit pattern
    ksb = bytes([0xAB, 0xCD]) * 5
    ks = np.unpackbits(np.frombuffer(ksb, dtype=np.uint8))
    assert k0[0] == ks[79] and k0[71] == ks[8]
    assert k1[0] == ks[71] and k1[71] == ks[0]


def test_tyt_ep_keystream_is_aes_derived():
    from dsdneo_tpu.crypto.keystream import aes_encrypt_block
    from dsdneo_tpu.crypto.vendor import _TYT_EP_STATIC_KEY, tyt_ep_keystream49
    user = 0x0123456789ABCDEF0011223344556677
    ks = tyt_ep_keystream49(user)
    assert ks.shape == (49,)
    iv = bytes(user.to_bytes(16, "big")[15 - i] for i in range(16))
    block = aes_encrypt_block(iv, _TYT_EP_STATIC_KEY)
    bits = np.unpackbits(np.frombuffer(block, dtype=np.uint8))
    assert np.array_equal(ks, bits[:49])


def test_md2ii_hash_properties():
    from dsdneo_tpu.crypto.retevis_rc2 import md2ii_hash
    a = md2ii_hash(b"key one")
    b = md2ii_hash(b"key one")
    c = md2ii_hash(b"key two")
    assert len(a) == 264 and a == b and a != c
    # multi-block input (> 264 bytes) works
    d = md2ii_hash(b"x" * 600)
    assert len(d) == 264 and d != a


def test_retevis_rc2_roundtrip_and_determinism():
    from dsdneo_tpu.crypto.retevis_rc2 import RetevisRC2
    rc = RetevisRC2.from_hex("0123456789ABCDEF0123456789ABCDEF")
    rng = np.random.default_rng(3)
    for _ in range(4):
        plain = rng.integers(0, 2, 49).astype(np.uint8)
        enc = rc.encrypt_frame49(plain)
        assert not np.array_equal(enc, plain)
        dec = rc.decrypt_frame49(enc)
        np.testing.assert_array_equal(dec, plain)
    # per-frame keystream restarts from internal_zero: same plaintext →
    # same ciphertext (the reference resets internal_state per frame)
    p = rng.integers(0, 2, 49).astype(np.uint8)
    assert np.array_equal(rc.encrypt_frame49(p), rc.encrypt_frame49(p))
    # 64-hex keys hash the ASCII text (different from raw-byte path)
    rc64 = RetevisRC2.from_hex("00" * 32)
    assert rc64.xkey != rc.xkey
    with pytest.raises(ValueError):
        RetevisRC2.from_hex("1234")


def test_retevis_rc2_in_dmr_voice_path():
    """A Retevis-encrypted AMBE frame decrypts through the decoder's
    voice path wiring."""
    from types import SimpleNamespace

    from dsdneo_tpu.crypto.retevis_rc2 import RetevisRC2
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.dmr import ambe_frame as AF
    from dsdneo_tpu.protocol.dmr.bs import DmrBsDecoder

    rc = RetevisRC2.from_hex("FEDCBA9876543210FEDCBA9876543210")
    rng = np.random.default_rng(9)
    plain = [rng.integers(0, 2, 49).astype(np.uint8) for _ in range(3)]
    voice216 = np.concatenate(
        [AF.encode_ambe_ecc(rc.encrypt_frame49(p)) for p in plain])

    got = []
    import dsdneo_tpu.vocoder.mbe as mbe
    orig = mbe.decode_ambe_2450

    def spy(bits49, *a, **k):
        got.append(np.asarray(bits49).copy())
        return orig(bits49, *a, **k)

    ctx = DecoderContext()
    ctx.state.dmr_retevis_rc2 = rc
    mbe.decode_ambe_2450 = spy
    try:
        DmrBsDecoder()._synthesize(voice216, 0, ctx)
    finally:
        mbe.decode_ambe_2450 = orig
    assert len(got) == 3
    for p, g in zip(plain, got):
        np.testing.assert_array_equal(g, p)


def test_pc4_tyt_ap_roundtrip():
    """PC4 (TYT AP): derived-table cipher round-trips 49-bit frames and
    distinct keys diverge; key-parse rules match the reference (64-hex
    keys hash the ASCII text, 32-hex keys the reversed raw bytes)."""
    from dsdneo_tpu.crypto.pc4 import PC4
    pc = PC4.from_hex("0123456789ABCDEF0123456789ABCDEF")
    rng = np.random.default_rng(11)
    for _ in range(3):
        p = rng.integers(0, 2, 49).astype(np.uint8)
        e = pc.encrypt_frame49(p)
        assert not np.array_equal(e, p)
        np.testing.assert_array_equal(pc.decrypt_frame49(e), p)
    pc2 = PC4.from_hex("0123456789ABCDEF0123456789ABCDE0")
    p = rng.integers(0, 2, 49).astype(np.uint8)
    assert not np.array_equal(pc.encrypt_frame49(p), pc2.encrypt_frame49(p))
    with pytest.raises(ValueError):
        PC4.from_hex("123")


def test_pc4_in_dmr_voice_path():
    from dsdneo_tpu.crypto.pc4 import PC4
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.dmr import ambe_frame as AF
    from dsdneo_tpu.protocol.dmr.bs import DmrBsDecoder

    pc = PC4.from_hex("00112233445566778899AABBCCDDEEFF")
    rng = np.random.default_rng(12)
    plain = [rng.integers(0, 2, 49).astype(np.uint8) for _ in range(3)]
    voice216 = np.concatenate(
        [AF.encode_ambe_ecc(pc.encrypt_frame49(p)) for p in plain])
    got = []
    import dsdneo_tpu.vocoder.mbe as mbe
    orig = mbe.decode_ambe_2450

    def spy(bits49, *a, **k):
        got.append(np.asarray(bits49).copy())
        return orig(bits49, *a, **k)

    ctx = DecoderContext()
    ctx.state.dmr_tyt_ap = pc
    mbe.decode_ambe_2450 = spy
    try:
        DmrBsDecoder()._synthesize(voice216, 0, ctx)
    finally:
        mbe.decode_ambe_2450 = orig
    for p, g in zip(plain, got):
        np.testing.assert_array_equal(g, p)


def test_pc5_baofeng_ap_roundtrip():
    from dsdneo_tpu.crypto.pc5 import PC5
    pc = PC5.from_hex("0123456789ABCDEF0123456789ABCDEF")
    rng = np.random.default_rng(13)
    for _ in range(3):
        p = rng.integers(0, 2, 49).astype(np.uint8)
        e = pc.encrypt_frame49(p)
        assert not np.array_equal(e, p)
        np.testing.assert_array_equal(pc.decrypt_frame49(e), p)
    # tail mask covers bits 24-48 (block cipher only the first 24)
    assert pc.tail.shape == (25,)
    with pytest.raises(ValueError):
        PC5.from_hex("zz")


def test_kirisun_adv_keystream():
    """Kirisun ADV: PC4-generated 126-byte rolling keystream, chained
    6-byte blocks with the 48-bit state rotated between frames and a
    gap byte per frame (reference crypt-kirisun.c + crypt-pc4.c
    pc4_kirisun_generate_keystream)."""
    from dsdneo_tpu.crypto.vendor import kirisun_adv_keystream
    key = bytes(range(32))
    ks1 = kirisun_adv_keystream(key, mi=0x12345678)
    ks2 = kirisun_adv_keystream(key, mi=0x12345678)
    ks3 = kirisun_adv_keystream(key, mi=0x12345679)
    assert len(ks1) == 126 and ks1 == ks2 and ks1 != ks3
    # one zero gap byte per 7-byte frame stride
    assert all(ks1[7 * f + 6] == 0 for f in range(18))
