"""Vendor keystreams, keyring import, secret redaction."""

import numpy as np


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


def test_p25_adp_voice_decrypt_roundtrip():
    """ADP/RC4 voice decrypt: keystream applies at rolling 11-byte
    offsets per frame; decrypt(encrypt(x)) == x through the decoder's
    state machinery."""
    from types import SimpleNamespace

    from dsdneo_tpu.crypto.keyring import KeyRing
    from dsdneo_tpu.crypto.keystream import p25_adp_keystream
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder

    key, kid, mi = 0x0123456789, 0x0001, 0x11223344556677 << 8
    kr = KeyRing()
    kr.scalar[kid] = key
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 2, 88).astype(np.uint8) for _ in range(9)]

    # encrypt: same scheme, rolling offset
    ks = p25_adp_keystream(key, mi, 9 * 11)
    enc = []
    for i, f in enumerate(frames):
        kb = np.unpackbits(ks[11 * i:11 * i + 11])[:88]
        enc.append(f ^ kb)

    dec = P25P1Decoder()
    ctx = SimpleNamespace(state=SimpleNamespace(
        keyring=kr, payload_algid=0xAA, payload_kid=kid, payload_mi=mi,
        rc4_drop=0))
    out = [dec._decrypt_imbe(e, ctx) for e in enc]
    for f, o in zip(frames, out):
        assert np.array_equal(f, o)
    # without a key: passthrough
    ctx.state.keyring = None
    assert np.array_equal(dec._decrypt_imbe(enc[0], ctx), enc[0])


def test_p25_des_ofb_voice_decrypt_roundtrip():
    from types import SimpleNamespace

    from dsdneo_tpu.crypto.keyring import KeyRing
    from dsdneo_tpu.crypto.keystream import des_ofb_keystream
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder

    key, kid, mi = 0x0123456789ABCDEF, 0x0002, 0x1122334455667788
    kr = KeyRing()
    kr.scalar[kid] = key
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 2, 88).astype(np.uint8) for _ in range(4)]
    ks = des_ofb_keystream(key, mi, 19 + 4 * 11)
    enc = []
    for i, f in enumerate(frames):
        kb = np.unpackbits(ks[19 + 11 * i:19 + 11 * i + 11])[:88]
        enc.append(f ^ kb)
    dec = P25P1Decoder()
    ctx = SimpleNamespace(state=SimpleNamespace(
        keyring=kr, payload_algid=0x81, payload_kid=kid, payload_mi=mi,
        rc4_drop=0))
    out = [dec._decrypt_imbe(e, ctx) for e in enc]
    for f, o in zip(frames, out):
        assert np.array_equal(f, o)
