"""Cross-block synthesis continuity (reference: mbelib keeps its
oscillator state across calls — dsd_mbe.c synthesis never resets phase
mid-call).  synthesize_stream chained over two halves must equal the
one-shot synthesis of the whole frame sequence EXACTLY, and the device
voice path must carry the same state across decode blocks."""

import numpy as np
import pytest
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)


def _params(F: int, L: int = 24, seed: int = 7):
    rng = np.random.default_rng(seed)
    w0 = (0.18 + 0.02 * rng.standard_normal(F)).astype(np.float32)
    amps = np.zeros((F, 56), np.float32)
    amps[:, :L] = rng.uniform(0.5, 2.0, size=(F, L)).astype(np.float32)
    voiced = np.zeros((F, 56), np.float32)
    voiced[:, :L] = 1.0
    noise = rng.uniform(0, 2 * np.pi, size=(F, 56)).astype(np.float32)
    return w0, amps, voiced, noise


def test_chained_stream_equals_one_shot():
    from dsdneo_tpu.vocoder.synth import synthesize, synthesize_stream
    F = 12
    w0, amps, voiced, noise = _params(F)
    full = np.asarray(synthesize(jnp.asarray(w0), jnp.asarray(amps),
                                 jnp.asarray(voiced), jnp.asarray(noise)))
    for cut in (1, 5, 11):
        p1, t, w, a = synthesize_stream(
            jnp.asarray(w0[:cut]), jnp.asarray(amps[:cut]),
            jnp.asarray(voiced[:cut]), jnp.asarray(noise[:cut]),
            jnp.float32(0.0), jnp.float32(0.0),
            jnp.zeros(56, jnp.float32))
        p2, _t, _w, _a = synthesize_stream(
            jnp.asarray(w0[cut:]), jnp.asarray(amps[cut:]),
            jnp.asarray(voiced[cut:]), jnp.asarray(noise[cut:]),
            t, w, a)
        chained = np.concatenate([np.asarray(p1), np.asarray(p2)])
        # the seam mod-2pi changes f32 rounding; a harmonic-24 bank
        # amplifies a ~1e-3 rad phase round-off to ~2e-2 amplitude.
        # The RESET path (old behavior) deviates by ~the full signal
        # amplitude — assert an order-of-magnitude separation.
        dev_chain = float(np.abs(chained - full).max())
        r1 = np.asarray(synthesize(
            jnp.asarray(w0[:cut]), jnp.asarray(amps[:cut]),
            jnp.asarray(voiced[:cut]), jnp.asarray(noise[:cut])))
        r2 = np.asarray(synthesize(
            jnp.asarray(w0[cut:]), jnp.asarray(amps[cut:]),
            jnp.asarray(voiced[cut:]), jnp.asarray(noise[cut:])))
        dev_reset = float(np.abs(np.concatenate([r1, r2]) - full).max())
        assert dev_chain < 5e-2, (dev_chain, cut)
        assert dev_reset > 20 * dev_chain, (dev_chain, dev_reset, cut)


def test_device_path_carries_synth_state_across_blocks():
    """voice_decode_gather with prev_synth carry: two consecutive
    decode blocks of one channel concatenate PCM without the seam the
    stateless call produces (compare against one big block)."""
    from dsdneo_tpu.vocoder.device import voice_decode_device
    from dsdneo_tpu.vocoder.imbe import encode_frame, ImbeParams
    from dsdneo_tpu.protocol.p25 import imbe_frame as IF

    # build 6 coherent voiced frames through the real encoder
    from dsdneo_tpu.vocoder.imbe import harmonics_for_b0
    rng = np.random.default_rng(11)
    w0, L, K = harmonics_for_b0(80)
    frames = []
    prev = None
    for i in range(6):
        logm = rng.uniform(1.0, 5.0, size=L)
        p = ImbeParams(b0=80, w0=w0, L=L, K=K,
                       voiced_bands=np.ones(K, np.uint8), log_m=logm,
                       gain_code=40)
        bits88 = encode_frame(p, prev)
        prev = p
        frames.append(bits88)
    f144 = np.stack([IF.encode_imbe_ecc(b) for b in frames])

    C = 1
    fch = np.zeros(6, np.int32)
    pl0 = jnp.zeros((C, 56), jnp.float32)
    pL0 = jnp.zeros(C, jnp.int32)

    full, _l, _L2, _sy, _aux = voice_decode_device(
        jnp.asarray(f144), jnp.asarray(fch),
        jnp.asarray(np.arange(6, dtype=np.int32)), pl0, pL0, C, 6)
    full = np.asarray(full, np.float32).reshape(-1)

    a1, l1, L1, sy1, _ = voice_decode_device(
        jnp.asarray(f144[:3]), jnp.asarray(fch[:3]),
        jnp.asarray(np.arange(3, dtype=np.int32)), pl0, pL0, C, 3)
    a2, _l, _L3, _sy2, _ = voice_decode_device(
        jnp.asarray(f144[3:]), jnp.asarray(fch[:3]),
        jnp.asarray(np.arange(3, dtype=np.int32)), l1, L1, C, 3,
        prev_synth=sy1)
    chained = np.concatenate([np.asarray(a1, np.float32).reshape(-1),
                              np.asarray(a2, np.float32).reshape(-1)])
    err = np.abs(chained - full).max()
    assert err < 2e-2, err          # f16 PCM + f32 phase rounding
