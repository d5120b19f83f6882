"""Tests for the batched device pipeline, channelizer, mesh sharding and
vocoder kernels (all on the virtual-CPU backend via conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_batched_frontend_matches_offline_decode():
    """The [C,B] device step must produce the same dibits as the offline
    path on a synthetic C4FM signal."""
    from dsdneo_tpu.engine.batched import make_frontend_step
    from tests.test_dsp import synth_c4fm

    rng = np.random.default_rng(0)
    dibits = rng.integers(0, 4, 470).astype(np.uint8)
    x = synth_c4fm(dibits, sps=10)
    B = 4800
    x = x[:B]
    iq = np.stack([x.real, x.imag], axis=-1).astype(np.float32)[None]
    step = make_frontend_step("p25p1", B)
    out_d, out_soft, power = step(iq)
    out_d = np.asarray(out_d)[0]
    match = (out_d[5:460] == dibits[5:460]).mean()
    assert match > 0.98, f"batched dibit accuracy {match}"


def test_channelizer_tone_mapping():
    from dsdneo_tpu.dsp.channelizer import channelize, channel_frequencies
    n_ch = 16
    fs = n_ch * 48000.0
    B = n_ch * 2400
    t = np.arange(B) / fs
    freqs = channel_frequencies(n_ch, fs)
    x = (np.exp(2j * np.pi * (freqs[3] + 5000) * t)
         + 0.5 * np.exp(2j * np.pi * (freqs[12] - 3000) * t)).astype(np.complex64)
    ch = np.asarray(channelize(jnp.asarray(x), n_ch))
    pw = (np.abs(ch) ** 2).mean(axis=1)
    top2 = set(np.argsort(pw)[-2:])
    assert top2 == {3, 12}
    seg = ch[3][100:]
    f = np.angle(seg[1:] * np.conj(seg[:-1])).mean() * 48000 / (2 * np.pi)
    assert abs(f - 5000) < 100


def test_mesh_sharded_step():
    from dsdneo_tpu.parallel.mesh import dryrun_multichip
    n = min(len(jax.devices()), 8)
    if n < 2:
        pytest.skip("needs multiple devices")
    dryrun_multichip(n)


def test_vocoder_synthesis_shape_and_energy():
    from dsdneo_tpu.vocoder.mbe import MbeFrame
    from dsdneo_tpu.vocoder.synth import synthesize_frames
    frames = []
    for i in range(5):
        L = 20
        frames.append(MbeFrame(
            w0=2 * np.pi / 64, L=L,
            voiced=np.ones(L, dtype=np.uint8),
            amps=np.full(L, 0.01, dtype=np.float32)))
    pcm = synthesize_frames(frames)
    assert pcm.shape == (5 * 160,)
    rms = np.sqrt((pcm ** 2).mean())
    assert 1e-4 < rms < 1.0
    # pitch: autocorrelation peak near 64 samples
    ac = np.correlate(pcm, pcm, "full")[len(pcm) - 1:]
    pk = 32 + int(np.argmax(ac[32:96]))
    assert abs(pk - 64) <= 2


def test_imbe_ecc_u0_roundtrip():
    """Encode a synthetic IMBE ECC frame and decode it back (u0 path)."""
    from dsdneo_tpu.protocol.p25 import imbe_frame as IF
    rng = np.random.default_rng(2)
    g23 = IF.golay_23_12()
    fr = np.zeros((8, 23), dtype=np.uint8)
    u0 = 0x2A5
    fr[0] = g23.encode(u0)
    bits144 = np.zeros(144, dtype=np.uint8)
    for j in range(72):
        bits144[2 * j] = fr[IF.IMBE_W[j]][IF.IMBE_X[j]]
        bits144[2 * j + 1] = fr[IF.IMBE_Y[j]][IF.IMBE_Z[j]]
    out, errs = IF.decode_imbe_ecc(bits144)
    got_u0 = 0
    for b in out[:12]:
        got_u0 = (got_u0 << 1) | int(b)
    assert got_u0 == u0
