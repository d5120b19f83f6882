"""Vocoder behavior contract (vocoder.glue): tone synthesis, silence
on FEC failure, bounded frame repeat, error accounting — the reference
semantics of dsd_mbe.c / the mbelib process contract."""

import numpy as np

from dsdneo_tpu.vocoder.glue import (AMBE_ERR_THRESHOLD, MbeGlue,
                                     ambe_tone_info, imbe_tone_info,
                                     synthesize_tone)


def _mk_frame(seed=0):
    from dsdneo_tpu.vocoder.mbe import decode_imbe_4400
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, 88).astype(np.uint8)
    # force a voice-range b0
    from dsdneo_tpu.vocoder.imbe import B0_HI_POS, B0_LO_POS
    for i, p in enumerate(B0_HI_POS):
        bits[p] = (100 >> (7 - i)) & 1
    bits[B0_LO_POS[0]] = 0
    bits[B0_LO_POS[1]] = 0
    return decode_imbe_4400(bits)


def test_tone_frame_synthesizes_tone():
    """A tone directive renders a sinusoid at 31.25 Hz · ID with
    amplitude AD · 75/8000 (reference dsd_audio2.c soft_tonef)."""
    glue = MbeGlue()
    tone_id, amp_id = 32, 50           # 1 kHz
    d = glue.condition(None, 0, (tone_id, amp_id))
    assert d[0] == "tone"
    pcm = glue.render([d])
    assert pcm.shape == (160,)
    # dominant frequency = 1 kHz
    spec = np.abs(np.fft.rfft(pcm * np.hanning(160)))
    f = np.fft.rfftfreq(160, 1 / 8000.0)
    assert abs(f[np.argmax(spec)] - 1000.0) < 60.0
    assert np.abs(pcm).max() > 0.1


def test_tone_phase_continuity():
    glue = MbeGlue()
    d = ("tone", (32, 50))
    a = glue.render([d, d])
    b = np.concatenate([synthesize_tone(32, 50, 0)[0],
                        synthesize_tone(32, 50, 160)[0]])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_corrupt_frame_repeats_then_mutes():
    """errs over threshold: repeat the last good parameters up to
    MAX_REPEAT times, then silence (classic mbelib semantics)."""
    glue = MbeGlue()
    good = _mk_frame()
    assert glue.condition(good, 2, None)[0] == "voice"
    outs = [glue.condition(None, 9, None) for _ in range(5)]
    kinds = [k for k, _ in outs]
    assert kinds == ["repeat", "repeat", "repeat", "silence", "silence"]
    assert outs[0][1] is good
    # silence renders as zeros
    pcm = glue.render([outs[3]])
    assert np.all(pcm == 0.0)
    # a clean frame resets the repeat budget
    assert glue.condition(good, 0, None)[0] == "voice"
    assert glue.condition(None, 9, None)[0] == "repeat"


def test_corrupt_before_any_good_frame_is_silence():
    glue = MbeGlue()
    kind, _ = glue.condition(None, 99, None)
    assert kind == "silence"


def test_error_accounting_ring():
    glue = MbeGlue(hist_len=5)
    for e in (1, 2, 3, 4, 5, 6):
        glue.account(e)
    assert len(glue.err_hist) == 5
    assert glue.err_avg() == np.mean([2, 3, 4, 5, 6])
    assert glue.total_errs == 21


def test_imbe_tone_info_detection():
    bits = np.zeros(88, dtype=np.uint8)
    assert imbe_tone_info(bits) is None
    from dsdneo_tpu.vocoder.imbe import B0_HI_POS, B0_LO_POS
    b0 = 210                                 # tone-code band
    for i, p in enumerate(B0_HI_POS):
        bits[p] = (b0 >> (7 - i)) & 1
    bits[B0_LO_POS[0]] = (b0 >> 1) & 1
    bits[B0_LO_POS[1]] = b0 & 1
    for i in range(7):                       # ID 32 (redundant)
        bits[12 + i] = (32 >> (6 - i)) & 1
    assert imbe_tone_info(bits) is None      # ID not repeated yet
    for i in range(7):
        bits[19 + i] = (32 >> (6 - i)) & 1
    for i in range(7):                       # AD 50
        bits[26 + i] = (50 >> (6 - i)) & 1
    assert imbe_tone_info(bits) == (32, 50)
    # invalid non-voice code (outside the tone band) is not a tone
    from dsdneo_tpu.vocoder.glue import imbe_raw_b0
    b0 = 240
    for i, p in enumerate(B0_HI_POS):
        bits[p] = (b0 >> (7 - i)) & 1
    bits[B0_LO_POS[0]] = (b0 >> 1) & 1
    bits[B0_LO_POS[1]] = b0 & 1
    assert imbe_tone_info(bits) is None
    assert imbe_raw_b0(bits) == 240


def test_ambe_tone_info_detection():
    bits = np.zeros(49, dtype=np.uint8)
    assert ambe_tone_info(bits) is None
    bits[:7] = 1                             # b0 = 0x7F
    for i in range(7):
        bits[7 + i] = (40 >> (6 - i)) & 1
        bits[14 + i] = (86 >> (6 - i)) & 1
    assert ambe_tone_info(bits) is None      # ID not repeated yet
    for i in range(7):
        bits[21 + i] = (40 >> (6 - i)) & 1
    assert ambe_tone_info(bits) == (40, 86)


def test_p25_ldu_with_corrupt_frame_emits_err_accounting():
    """End-to-end: a P25 LDU whose frames pass through the glue gets
    voice_err_avg accounting on the LDU event, and heavily corrupted
    voice frames do not crash the path."""
    from dsdneo_tpu.engine.decoder import decode_samples
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(
        "/root/reference/tests/fixtures/iq/p25p1_c4fm_vc.iq.json")
    ctx = decode_samples(samples[:96000], "p25p1",
                         fs=float(meta.sample_rate_hz))
    ldu_events = [e for e in ctx.events if "VOICE (9" in e.line]
    assert ldu_events
    assert all("voice_err_avg" in e.fields for e in ldu_events)
    assert ctx.audio, "voice PCM must still be produced"


def test_device_batch_mutes_tone_and_corrupt_frames():
    """The fleet path's mute mask: AMBE tone frames and over-threshold
    frames produce silent PCM rows in the batched decode."""
    import jax.numpy as jnp
    from dsdneo_tpu.vocoder.device import ambe_frame_mask
    bits = np.zeros((3, 49), dtype=np.uint8)
    bits[0, :7] = [0, 1, 1, 0, 0, 1, 0]      # voice pitch
    bits[1, :7] = 1                          # tone frame (ID repeated)
    for i in range(7):
        bits[1, 7 + i] = (40 >> (6 - i)) & 1
        bits[1, 21 + i] = (40 >> (6 - i)) & 1
    bits[2, :7] = [0, 1, 1, 0, 0, 1, 0]
    errs = np.array([0, 0, AMBE_ERR_THRESHOLD + 2])
    m = np.asarray(ambe_frame_mask(jnp.asarray(bits), jnp.asarray(errs)))
    np.testing.assert_array_equal(m, [1.0, 0.0, 0.0])
