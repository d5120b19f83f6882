"""Batched P25p2 TDMA voice pipeline (engine.p2batch)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)

WACN, SYSID, NAC = 0xBEE00, 0x14C, 0x140


def _stream(C=2, n_superframes=4, **kw):
    from dsdneo_tpu.engine.p2batch import synth_p2_voice_stream
    samples, dib, bits49 = synth_p2_voice_stream(
        n_superframes=n_superframes, seed=3, wacn=WACN, sysid=SYSID,
        nac=NAC, **kw)
    iq1 = np.stack([samples.real, samples.imag], axis=-1).astype(np.float32)
    iq = np.broadcast_to(iq1[None], (C,) + iq1.shape).copy()
    return iq, bits49


def test_p2batch_bits49_roundtrip_clear():
    """Device chain (gather → descramble → AMBE ECC) recovers the
    generator's exact parameter bits on every frame of both slots."""
    from dsdneo_tpu.engine.p2batch import BatchedP2VoicePipeline
    C = 2
    iq, bits49 = _stream(C=C, n_superframes=4)
    pipe = BatchedP2VoicePipeline(C, wacn=WACN, sysid=SYSID, nac=NAC)
    out, f_out, f_ord = pipe.decode_block_bits49(iq)
    assert out.shape[0] > 0
    for c in range(C):
        for slot in (0, 1):
            sel = np.flatnonzero(f_out == 2 * c + slot)
            sel = sel[np.argsort(f_ord[sel])]
            got = out[sel]
            n = got.shape[0]
            assert n >= 4 * 18 - 18, f"too few frames decoded: {n}"
            np.testing.assert_array_equal(got, bits49[slot][:n])


def test_p2batch_pcm_shape():
    from dsdneo_tpu.engine.p2batch import BatchedP2VoicePipeline
    C = 2
    iq, _ = _stream(C=C, n_superframes=2)
    pipe = BatchedP2VoicePipeline(C, wacn=WACN, sysid=SYSID, nac=NAC)
    pcm = pipe.decode_block(iq)
    assert pcm.shape[0] == 2 * C
    assert pcm.shape[1] % 160 == 0 and pcm.shape[1] > 0
    assert np.isfinite(pcm).all()


def test_p2_stream_decodes_on_serial_path():
    """Cross-validation: the independent serial P25p2 decoder walks the
    synthesized stream — 4V/2V lines, ESS output, and audio."""
    from dsdneo_tpu.engine.decoder import decode_samples
    from dsdneo_tpu.engine.p2batch import synth_p2_voice_stream
    samples, _dib, _bits = synth_p2_voice_stream(
        n_superframes=2, seed=3, wacn=WACN, sysid=SYSID, nac=NAC)
    ctx = decode_samples(samples, "p25p2",
                         p2_params=(WACN, SYSID, NAC))
    text = "\n".join(e.line for e in ctx.events)
    assert "4V" in text and "2V" in text
    assert sum(len(np.concatenate(v)) for v in ctx.audio.values()) > 0


def test_p2batch_rc4_keystream():
    """ADP/RC4-encrypted stream: with the key in the keyring, ESS
    staging + keystream application recover the plaintext parameter
    bits from the second superframe on (the first superframe's ESS has
    not yet been collected — the reference's behavior)."""
    from dsdneo_tpu.crypto.keyring import KeyRing
    from dsdneo_tpu.engine.p2batch import BatchedP2VoicePipeline
    C = 1
    key, kid, mi = 0x1234567890, 0x0123, 0xA5A5F00D5EED0001
    iq, bits49 = _stream(C=C, n_superframes=4, alg=0xAA, kid=kid,
                         key=key, mi=mi)
    kr = KeyRing()
    kr.scalar[kid] = key
    pipe = BatchedP2VoicePipeline(C, wacn=WACN, sysid=SYSID, nac=NAC,
                                  keyring=kr)
    out, f_out, f_ord = pipe.decode_block_bits49(iq)
    for slot in (0, 1):
        sel = np.flatnonzero(f_out == slot)
        sel = sel[np.argsort(f_ord[sel])]
        got = out[sel]
        n = got.shape[0]
        assert n >= 3 * 18
        # superframe 0 cannot decrypt (no ESS yet); 1+ must be exact
        np.testing.assert_array_equal(got[18:], bits49[slot][18:n])
        assert (got[:18] != bits49[slot][:18]).any()


def test_p2batch_without_keys_leaves_cipher():
    """Encrypted stream, no keyring: the pipeline still decodes frames
    (cipher bits) without crashing."""
    from dsdneo_tpu.engine.p2batch import BatchedP2VoicePipeline
    iq, bits49 = _stream(C=1, n_superframes=2, alg=0xAA, kid=1,
                         key=0xDEADBEEF01, mi=0x1111222233334444)
    pipe = BatchedP2VoicePipeline(1, wacn=WACN, sysid=SYSID, nac=NAC)
    out, f_out, f_ord = pipe.decode_block_bits49(iq)
    assert out.shape[0] >= 2 * 36
    sel = np.flatnonzero(f_out == 0)
    got = out[sel[np.argsort(f_ord[sel])]]
    assert (got[:18] != bits49[0][:18]).any()
