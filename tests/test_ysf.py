"""YSF wide/full-rate (VWFR) voice slot decode."""

def test_vwfr_full_rate_voice_roundtrip():
    """VWFR slot: IMBE frame matrix → FR interleave → dibits →
    _voice_fr decodes the same parameter bits (reference
    dsd_ysf_unpack_full_rate_imbe inverse)."""
    import numpy as np

    from dsdneo_tpu.protocol.p25.imbe_frame import (decode_imbe_fr,
                                                    encode_imbe_ecc)
    from dsdneo_tpu.protocol.ysf.decoder import (_FR_INTERLEAVE,
                                                 _FR_ROW_LENS,
                                                 _fr_slot_to_matrix)

    rng = np.random.default_rng(7)
    bits88 = rng.integers(0, 2, 88).astype(np.uint8)
    bits144 = encode_imbe_ecc(bits88)
    # bits144 is the P25 on-air interleaved form; rebuild the fr matrix
    from dsdneo_tpu.protocol.p25.imbe_frame import IMBE_W, IMBE_X, IMBE_Y, IMBE_Z
    fr = np.zeros((8, 23), np.uint8)
    for j in range(72):
        fr[IMBE_W[j]][IMBE_X[j]] = bits144[2 * j]
        fr[IMBE_Y[j]][IMBE_Z[j]] = bits144[2 * j + 1]

    # serialize the matrix the YSF way (rows top-bit first), then
    # apply the FR interleave inverse to get raw slot bits
    vch = np.zeros(144, np.uint8)
    k = 0
    for n, mlen in enumerate(_FR_ROW_LENS):
        for m in range(mlen - 1, -1, -1):
            vch[k] = fr[n][m]
            k += 1
    raw = np.zeros(144, np.uint8)
    raw[_FR_INTERLEAVE] = vch
    seg = (raw[0::2] << 1) | raw[1::2]

    fr2 = _fr_slot_to_matrix(seg.astype(np.uint8))
    assert np.array_equal(fr2, fr)
    out88, errs = decode_imbe_fr(fr2)
    assert errs == 0 and np.array_equal(out88, bits88)
