"""Device-side FEC kernels must match the host decoders bit-exactly."""

import numpy as np
import pytest

from dsdneo_tpu.fec import blockcodes, device, trellis


@pytest.mark.parametrize("host,dev", [
    (blockcodes.golay_24_12, device.golay_24_12_batch),
    (blockcodes.golay_20_8, device.golay_20_8_batch),
    (blockcodes.golay_18_6_8, device.golay_18_6_8_batch),
    (blockcodes.hamming_10_6_3, device.hamming_10_6_3_batch),
    (blockcodes.hamming_15_11, device.hamming_15_11_batch),
    (blockcodes.qr_16_7_6, device.qr_16_7_6_batch),
    (blockcodes.bch_63_16, device.bch_63_16_batch),
])
def test_codebook_ml_matches_host(host, dev):
    code = host()
    rng = np.random.default_rng(0)
    N = 64
    msgs = rng.integers(0, 2 ** code.k, N)
    words = code.codebook[msgs].astype(np.uint8)
    # flip up to 2 bits + random soft reliabilities
    for i in range(N):
        for j in rng.choice(code.n, size=int(rng.integers(0, 3)),
                            replace=False):
            words[i, j] ^= 1
    rel = rng.uniform(0.1, 1.0, size=words.shape).astype(np.float32)
    m_h, e_h = code.decode_batch(words, rel)
    m_d, e_d = dev(words, rel)
    np.testing.assert_array_equal(np.asarray(m_d), m_h)
    np.testing.assert_array_equal(np.asarray(e_d), e_h)
    # hard-decision path too
    m_h2, e_h2 = code.decode_batch(words)
    m_d2, e_d2 = dev(words)
    np.testing.assert_array_equal(np.asarray(m_d2), m_h2)
    np.testing.assert_array_equal(np.asarray(e_d2), e_h2)


def test_p25_trellis_batch_matches_host():
    rng = np.random.default_rng(1)
    N = 16
    blocks, datas = [], []
    for _ in range(N):
        bits96 = rng.integers(0, 2, 96).astype(np.uint8)
        onair = trellis.p25_12_encode(bits96)
        noisy = onair.copy()
        for j in rng.choice(196, size=int(rng.integers(0, 4)), replace=False):
            noisy[j] ^= 1
        blocks.append(noisy)
        datas.append(bits96)
    blocks = np.stack(blocks)
    out_d, cost_d = device.p25_12_decode_batch(blocks)
    for i in range(N):
        out_h, cost_h = trellis.p25_12_decode(blocks[i])
        np.testing.assert_array_equal(np.asarray(out_d[i]), out_h)
        assert int(cost_d[i]) == cost_h
    # and with soft LLRs
    llr = (1 - 2 * blocks.astype(np.int32)) * np.int32(50)
    llr += rng.integers(-20, 20, size=llr.shape)
    out_ds, cost_ds = device.p25_12_decode_batch(blocks, llr)
    for i in range(N):
        out_h, cost_h = trellis.p25_12_decode(blocks[i], llr[i])
        np.testing.assert_array_equal(np.asarray(out_ds[i]), out_h)
        assert int(cost_ds[i]) == cost_h


def test_rs_syndrome_screen():
    from dsdneo_tpu.fec import rs
    code = rs.rs_24_12_13()
    rng = np.random.default_rng(2)
    words = []
    dirty = []
    for i in range(32):
        data = rng.integers(0, 64, 12)
        w = code.encode(data)
        if i % 3 == 0:
            w = w.copy()
            w[int(rng.integers(0, 24))] ^= int(rng.integers(1, 64))
            dirty.append(True)
        else:
            dirty.append(False)
        words.append(w)
    words = np.stack(words)
    syn = device.rs_syndromes_batch(words, code.nroots, code.fcr)
    flagged = np.any(syn != 0, axis=1)
    np.testing.assert_array_equal(flagged, np.asarray(dirty))


def test_imbe_ecc_batch_matches_host():
    from dsdneo_tpu.protocol.p25 import imbe_frame as IF
    rng = np.random.default_rng(3)
    F = 24
    frames, params = [], []
    for _ in range(F):
        bits88 = rng.integers(0, 2, 88).astype(np.uint8)
        onair = IF.encode_imbe_ecc(bits88)
        # flip one protected bit half the time
        if rng.integers(0, 2):
            while True:
                j = int(rng.integers(0, 144))
                row = IF.IMBE_W[j // 2] if j % 2 == 0 else IF.IMBE_Y[j // 2]
                if row < 7:
                    break
            onair = onair.copy()
            onair[j] ^= 1
        frames.append(onair)
        params.append(bits88)
    out, errs = device.imbe_ecc_batch(np.stack(frames))
    out = np.asarray(out)
    for i in range(F):
        h_out, h_errs = IF.decode_imbe_ecc(frames[i])
        np.testing.assert_array_equal(out[i], h_out)
        assert int(errs[i]) == h_errs
        np.testing.assert_array_equal(out[i], params[i])
