"""DMR late-entry MI recovery + RC4 voice crypto lifecycle
(reference src/protocol/dmr/dmr_le.c, src/fec/dmr_late_entry.c,
src/crypto/dmr_mi.c, dsd_mbe.c mbeslot_*_apply_rc4)."""

import numpy as np

from dsdneo_tpu.protocol.dmr.late_entry import (crc4, late_entry_decode,
                                                late_entry_encode,
                                                mi_advance32)


def test_late_entry_roundtrip_and_golay_correction():
    for mi in (0xDEADBEEF, 0x00000001, 0xFFFFFFFF, 0x12345678):
        frags = late_entry_encode(mi)
        got, crc_ok, golay_ok = late_entry_decode(frags)
        assert (got, crc_ok, golay_ok) == (mi, True, True)
        # up to 3 bit errors per Golay codeword are corrected
        frags[2][1] ^= 0x5
        frags[5][0] ^= 0x1
        got, crc_ok, golay_ok = late_entry_decode(frags)
        assert (got, crc_ok, golay_ok) == (mi, True, True)


def test_late_entry_crc_rejects_wrong_mi():
    frags = late_entry_encode(0xCAFEBABE)
    # flip an entire Golay message half beyond correction: decode may
    # produce a different MI, but the CRC4 must catch it
    frags[1][0] ^= 0xF
    frags[1][1] ^= 0xF
    frags[1][2] ^= 0xF
    frags[2][0] ^= 0xF
    mi, crc_ok, _ = late_entry_decode(frags)
    assert mi != 0xCAFEBABE or not crc_ok


def test_mi_advance32_lfsr():
    # pinned vectors from the reference LFSR (taps 31, 3, 1)
    assert mi_advance32(0x12345678) == 0xB468E067
    assert mi_advance32(0x00000001) == 0x45145144
    assert mi_advance32(0) == 0


def test_crc4_known_properties():
    bits = np.zeros(32, np.uint8)
    assert crc4(bits) == 0xF            # all-zero input -> final XOR only
    bits[0] = 1
    assert crc4(bits) != 0xF


def test_dmr_rc4_superframe_decrypt_cycle():
    """Two superframes: keystream drop 256 +7/frame, MI advances through
    the LFSR between superframes."""
    from dsdneo_tpu.crypto.keyring import KeyRing
    from dsdneo_tpu.crypto.keystream import rc4_keystream
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.dmr.bs import DmrBsDecoder

    key, kid, mi0 = 0x0102030405, 0x05, 0x11223344
    rng = np.random.default_rng(5)
    plain = rng.integers(0, 2, (36, 49)).astype(np.uint8)
    cipher = np.zeros_like(plain)
    mi, drop = mi0, 256
    for i in range(36):
        if i == 18:                       # superframe boundary
            mi, drop = mi_advance32(mi), 256
        rckey = key.to_bytes(5, "big") + mi.to_bytes(4, "big")
        ks = rc4_keystream(rckey, 7, drop=drop)
        drop += 7
        cipher[i] = np.unpackbits(np.packbits(plain[i]) ^ ks)[:49]

    ctx = DecoderContext()
    kr = KeyRing()
    kr.scalar[kid] = key
    ctx.state.keyring = kr
    dec = DmrBsDecoder()
    dec.crypto[0].update(alg=0x21, kid=kid, mi=mi0, drop=256)
    got = []
    for i in range(36):
        if i == 18:
            dec._alg_refresh(0, ctx)
        got.append(dec._decrypt_rc4(cipher[i], 0, ctx))
    np.testing.assert_array_equal(np.stack(got), plain)


def test_late_entry_collection_via_voice_frames():
    """C3-embedded fragments round-trip through _collect_late_entry."""
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.dmr.ambe_frame import AMBE_MAP
    from dsdneo_tpu.protocol.dmr.bs import DmrBsDecoder

    mi = 0xA5C3F00D
    frags = late_entry_encode(mi)
    dec = DmrBsDecoder()
    ctx = DecoderContext()
    from dsdneo_tpu.crypto.keyring import KeyRing
    kr = KeyRing()
    kr.scalar[0x01] = 0x1122334455
    ctx.state.keyring = kr

    def burst(vc):
        v = np.zeros(216, np.uint8)
        for k in range(3):
            fr = np.zeros((4, 24), np.uint8)
            fr[3][0:4] = [(int(frags[vc % 7][k]) >> (3 - b)) & 1
                          for b in range(4)]
            bits = np.zeros(72, np.uint8)
            for j, (hr, hc, lr, lc) in enumerate(AMBE_MAP):
                bits[2 * j] = fr[hr][hc]
                bits[2 * j + 1] = fr[lr][lc]
            v[72 * k:72 * (k + 1)] = bits
        return v

    for vc in range(1, 7):
        dec._collect_late_entry(burst(vc), 0, vc, ctx)
    # no PI header seen -> MI adopted, RC4 inferred from the loaded key
    assert dec.crypto[0]["mi"] == mi
    assert dec.crypto[0]["alg"] == 0x21
    text = "\n".join(e.line for e in ctx.events)
    assert f"Late Entry MI: {mi:08X}" in text
