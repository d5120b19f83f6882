"""Inverted-polarity DMR (reference opts->inverted_dmr, -xr).

DMR's BS voice and data sync words are dibit complements of each
other, so a spectrally inverted channel's voice bursts correlate as
"+DMR BS data".  Under the -xr expectation the serial paths reinterpret
such hits as their same-pattern inverted twins, and the batched
pipeline's second sync kernel + EMB gate does the same on device.
The test inverts the real dmr_voice fixture (complex conjugate =
spectral inversion = negated discriminator) and requires decode parity
with the normal-polarity run."""

import numpy as np

FX = "/root/reference/tests/fixtures/iq/dmr_voice.iq.json"


def _fixture():
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(FX)
    return float(meta.sample_rate_hz), samples


def _lines(ctx):
    return [e.line for e in ctx.events]


def test_serial_inverted_dmr_matches_normal():
    from dsdneo_tpu.engine.decoder import decode_samples
    fs, samples = _fixture()
    norm = decode_samples(samples, "dmr", fs=fs)
    inv = decode_samples(np.conjugate(samples), "dmr", fs=fs,
                         state_attrs={"force_polarity": {"dmr": True}})
    n_lines, i_lines = _lines(norm), _lines(inv)
    assert len(n_lines) > 0
    # every payload line of the normal decode appears in the inverted
    # decode (sync names differ by polarity, payloads must not)
    n_payload = [l for l in n_lines if not l.startswith("Sync:")]
    i_payload = [l for l in i_lines if not l.startswith("Sync:")]
    assert n_payload == i_payload
    # and the voice-burst count carries over through the sync lines
    assert sum("Color Code=" in l for l in i_lines) \
        == sum("Color Code=" in l for l in n_lines)


def test_serial_blind_polarity_hypothesis_decode():
    """The serial DMR handler is polarity-agnostic by design (each hit
    is tried under the data hypothesis, Golay-validated slot type,
    else voice — bs.py docstring): even WITHOUT -xr an inverted
    capture decodes the same payloads."""
    from dsdneo_tpu.engine.decoder import decode_samples
    fs, samples = _fixture()
    norm = decode_samples(samples, "dmr", fs=fs)
    blind = decode_samples(np.conjugate(samples), "dmr", fs=fs)
    n_payload = [l for l in _lines(norm) if not l.startswith("Sync:")]
    b_payload = [l for l in _lines(blind) if not l.startswith("Sync:")]
    assert b_payload == n_payload


def test_xr_expectation_no_longer_kills_dmr():
    """Regression: with no inverted DMR SyncDefs, force_polarity
    {'dmr': True} used to drop EVERY hit — -xr decoded nothing."""
    from dsdneo_tpu.engine.decoder import decode_samples
    fs, samples = _fixture()
    inv = decode_samples(np.conjugate(samples), "dmr", fs=fs,
                         state_attrs={"force_polarity": {"dmr": True}})
    assert len(inv.events) > 0


def test_batched_inverted_dmr_pcm_identical():
    """The batched pipeline's second (inverted) sync kernel + EMB gate
    recover bit-identical voice: PCM of a spectrally inverted dense
    voice stream equals the normal-polarity PCM.  (The off-air fixture
    has no complete voice superframe, so the dense synthetic stream
    carries this check.)"""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dsdneo_tpu.engine.dmrbatch import (BatchedDmrVoicePipeline,
                                            synth_voice_stream)
    samples, _dib, _bits = synth_voice_stream(n_superframes=6, seed=3)
    iq_n = np.stack([samples.real, samples.imag], axis=-1
                    ).astype(np.float32)
    iq_i = np.stack([samples.real, -samples.imag], axis=-1
                    ).astype(np.float32)
    pipe = BatchedDmrVoicePipeline(1, fs=48000.0, pcm_fmt="f16")
    d_n = pipe.frontend_sync_device(iq_n[None])
    ac_n, _at, ai_n, _f, _o = pipe.pick_superframes(*d_n[1:5], d_n[5])
    d_i = pipe.frontend_sync_device(iq_i[None])
    ac_i, _at2, ai_i, _f2, _o2 = pipe.pick_superframes(*d_i[1:5], d_i[5])
    assert len(ac_n) >= 5 and not ai_n.any()
    assert len(ac_i) == len(ac_n) and ai_i.all(), (
        "inverted stream must be accepted via the inverted sync defs")
    # decode_block carries (synthesis, repeat) state across calls by
    # design; reset between the two independent streams so the check
    # compares like with like
    pcm_n = pipe.decode_block(iq_n[None])
    pipe.reset_voice_state()
    pcm_i = pipe.decode_block(iq_i[None])
    assert pcm_n.shape[1] > 0
    assert pcm_i.shape == pcm_n.shape
    assert np.array_equal(pcm_n, pcm_i)
