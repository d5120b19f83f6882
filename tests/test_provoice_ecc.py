"""IMBE-7100 ECC hypothesis layer (protocol/provoice/imbe7100.py)."""

import numpy as np

from dsdneo_tpu.protocol.provoice.imbe7100 import (decode_imbe7100_ecc,
                                                   encode_imbe7100_ecc,
                                                   grade_hypotheses)


def test_roundtrip_exact():
    rng = np.random.default_rng(0)
    for _ in range(16):
        bits = rng.integers(0, 2, 90).astype(np.uint8)
        fr = encode_imbe7100_ecc(bits)
        out, errs = decode_imbe7100_ecc(fr)
        assert errs == 0
        np.testing.assert_array_equal(out, bits)


def test_corrects_injected_errors():
    from dsdneo_tpu.protocol.provoice.imbe7100 import carried_positions
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 90).astype(np.uint8)
    fr = encode_imbe7100_ecc(bits)
    cells = carried_positions()
    # codewords lie over the carried bits in flat order: u0/u1/u2/u3
    # Golay(23,12) at flat 0/23/46/69, u4/u5 Hamming(15,11) at 92/107
    # — inject up to 3 errors per Golay codeword, 1 per Hamming
    for base, width, n in ((0, 23, 3), (23, 23, 3), (46, 23, 2),
                           (92, 15, 1)):
        for off in rng.choice(width, size=n, replace=False):
            w, x = cells[base + int(off)]
            fr[w, x] ^= 1
    out, errs = decode_imbe7100_ecc(fr)
    np.testing.assert_array_equal(out, bits)
    assert errs == 9


def test_grader_identifies_the_encoding_convention():
    """The seed-inversion grader: frames encoded under the hypothesis
    convention grade at ~0 mean errors; every wrong combo grades near
    the random-codeword floor (≈3 corrected bits/row)."""
    rng = np.random.default_rng(2)
    frames = np.stack([encode_imbe7100_ecc(
        rng.integers(0, 2, 90).astype(np.uint8)) for _ in range(24)])
    ranked = grade_hypotheses(frames)
    best = ranked[0]
    assert best["pn"] and best["seed"] == "parity_lsb" and best["reversed"]
    assert best["mean_errs"] < 0.01
    assert ranked[1]["mean_errs"] > 1.5, (
        "wrong conventions must be clearly separable")


def test_grader_flags_unknown_convention():
    """Random (non-codeword) frames grade every combo at the random
    floor — the 'unverified' negative result."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 2, (24, 7, 24)).astype(np.uint8)
    ranked = grade_hypotheses(frames)
    assert all(r["mean_errs"] > 1.5 for r in ranked)
