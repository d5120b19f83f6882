"""IMBE 7200x4400 dequantizer tests: allocation invariants, exact
quantize/dequantize roundtrips, and fixture-recovered layout checks."""

import numpy as np
import pytest

from dsdneo_tpu.vocoder import imbe


def test_bit_allocation_exhausts_budget():
    """Every (L, K) pair allocates exactly 73-K bits with per-value cap."""
    for b0 in range(0, 208, 7):
        w0, L, K = imbe.harmonics_for_b0(b0)
        gbits, cbits = imbe.bit_allocation(L, K)
        total = sum(gbits) + sum(sum(c) for c in cbits)
        assert total == imbe.bits_total_amp(K), (b0, L, K)
        assert all(0 <= g <= 10 for g in gbits)
        assert all(0 <= b <= 10 for c in cbits for b in c)
        assert sum(imbe.block_lengths(L)) == L


def test_quantizer_roundtrip_parameter_exact():
    """encode_frame(decode_frame(S)) == S for random parameter strings:
    the quantizer pair is exactly invertible (codes reproduce bit-exactly
    through dequantize -> re-quantize)."""
    rng = np.random.default_rng(0)
    prev = None
    for _ in range(50):
        S = rng.integers(0, 2, 88).astype(np.uint8)
        p = imbe.decode_frame(S, prev)
        S2 = imbe.encode_frame(p, prev, sync=int(S[imbe.SYNC_POS]))
        assert np.array_equal(S2, S)
        prev = p


def test_decode_ranges():
    rng = np.random.default_rng(1)
    for _ in range(20):
        S = rng.integers(0, 2, 88).astype(np.uint8)
        p = imbe.decode_frame(S)
        assert 0 <= p.b0 <= 255        # raw code; >207 = tone/silence range
        assert 9 <= p.L <= 56
        assert 3 <= p.K <= 12
        assert len(p.voiced_bands) == p.K
        assert p.log_m.shape == (p.L,)
        assert np.isfinite(p.log_m).all()


def test_prediction_carries_between_frames():
    """A repeated frame converges: with prediction, log_m accumulates
    toward T/(1-decay·centering); distinct from the no-prev decode."""
    rng = np.random.default_rng(2)
    S = rng.integers(0, 2, 88).astype(np.uint8)
    p0 = imbe.decode_frame(S, None)
    p1 = imbe.decode_frame(S, p0)
    assert not np.allclose(p0.log_m, p1.log_m)


@pytest.fixture(scope="module")
def fixture_frames():
    from dsdneo_tpu.engine import decode_capture
    from dsdneo_tpu.protocol.p25.imbe_frame import decode_imbe_ecc
    out = []
    for fx, cq in [("p25p1_c4fm_vc", False)]:
        ctx = decode_capture(
            f"/root/reference/tests/fixtures/iq/{fx}.iq.json", "p25p1",
            cqpsk=cq)
        for ev in ctx.events:
            if "imbe" in ev.fields:
                for fr in ev.fields["imbe"]:
                    bits88, errs = decode_imbe_ecc(fr)
                    if errs == 0:
                        out.append(bits88)
    if len(out) < 30:
        pytest.skip("fixture produced too few clean frames")
    return out


def test_fixture_pitch_track_smooth(fixture_frames):
    """Recovered layout sanity on real off-air speech: the decoded b0
    track is in-range and far smoother than random bit groups."""
    prev = None
    b0s = []
    for S in fixture_frames:
        p = imbe.decode_frame(S, prev)
        prev = p
        b0s.append(p.b0)
    b0s = np.asarray(b0s)
    assert b0s.min() >= 0 and b0s.max() <= 255
    # 6-MSB smoothness (LSBs are low-confidence): random 6-bit fields
    # average |d| ~ 21; the recovered pitch track is far below
    hi = b0s >> 2
    assert np.abs(np.diff(hi)).mean() < 8.0


def test_fixture_voicing_runs(fixture_frames):
    """Voicing vectors on real speech are runs-structured (transition
    density well below the 0.5 of random bits)."""
    trans = tot = 0
    prev = None
    for S in fixture_frames:
        p = imbe.decode_frame(S, prev)
        prev = p
        v = p.voiced_bands
        trans += int((v[1:] != v[:-1]).sum())
        tot += len(v) - 1
    assert trans / tot < 0.3


def test_fixture_sync_bit_alternates(fixture_frames):
    """S[87] alternates per frame on-air; error-frame filtering leaves
    gaps (a skipped frame keeps the value), so require well above the
    0.5 of a random bit rather than a perfect 1.0."""
    flips = sum(int(a[imbe.SYNC_POS] != b[imbe.SYNC_POS])
                for a, b in zip(fixture_frames, fixture_frames[1:]))
    assert flips / (len(fixture_frames) - 1) > 0.65
