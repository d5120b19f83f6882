"""Tests for the batched device pipeline, channelizer, mesh sharding and
vocoder kernels (all on the virtual-CPU backend via conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)


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


def _skip_if_backend_unimplemented(fn, *args):
    """Run a channelizer call, skipping when the experimental axon TPU
    plugin lacks the complex ops it needs (production wideband decode
    runs them on a supported backend).  The skip must happen BEFORE
    any complex transfer is attempted: a failed put leaves the axon
    client unusable for the rest of the process."""
    if jax.default_backend() not in ("cpu",) and any(
            isinstance(a, np.ndarray) and np.iscomplexobj(a) for a in args):
        pytest.skip("complex-sample channelizer path unsupported by the "
                    "experimental axon TPU plugin")
    try:
        args = [jnp.asarray(a) if isinstance(a, np.ndarray) else a
                for a in args]
        return np.asarray(fn(*args))
    except jax.errors.JaxRuntimeError as e:
        if "UNIMPLEMENTED" in str(e) and jax.default_backend() not in ("cpu",):
            pytest.skip(f"channelizer op unsupported by this backend: {e}")
        raise


def test_channelizer_tone_mapping():
    from dsdneo_tpu.dsp.channelizer import channelize, channel_frequencies
    n_ch = 16
    fs = n_ch * 48000.0
    B = n_ch * 2400
    t = np.arange(B) / fs
    freqs = channel_frequencies(n_ch, fs)
    x = (np.exp(2j * np.pi * (freqs[3] + 5000) * t)
         + 0.5 * np.exp(2j * np.pi * (freqs[12] - 3000) * t)).astype(np.complex64)
    ch = _skip_if_backend_unimplemented(channelize, x, n_ch)
    pw = (np.abs(ch) ** 2).mean(axis=1)
    top2 = set(np.argsort(pw)[-2:])
    assert top2 == {3, 12}
    seg = ch[3][100:]
    f = np.angle(seg[1:] * np.conj(seg[:-1])).mean() * 48000 / (2 * np.pi)
    assert abs(f - 5000) < 100


def test_channelizer_os2_edge_rejection():
    """2x-oversampled bank + halfband must suppress adjacent-channel
    energy that critical sampling aliases in-band (reference analog:
    rtl_stream channel filtering margins, src/io/radio/rtl_stream.c)."""
    from dsdneo_tpu.dsp.channelizer import channelize, channelize_os2
    from dsdneo_tpu.dsp import frontend, firdes

    n_ch = 8
    fs = n_ch * 48000.0
    t = np.arange(300000)
    # in-band tone at +6 kHz in channel 1, interferer at +0.55 spacing
    # (26.4 kHz past channel-1 center: beyond the 24 kHz critical Nyquist)
    x = (np.exp(2j * np.pi * 54000.0 * t / fs)
         + np.exp(2j * np.pi * (48000.0 * 1.55) * t / fs)).astype(np.complex64)
    hb = firdes.lowpass_taps(62, 2.0, 0.5, window="blackman-harris").astype(np.float32)

    def band_frac(sig, rate, f0, bw=600.0):
        s = np.asarray(sig)[3000:3000 + 16384]
        sp = np.abs(np.fft.fft(s * np.hanning(len(s)))) ** 2
        fr = np.fft.fftfreq(len(s), 1.0 / rate)
        return float(np.sum(sp[np.abs(fr - f0) < bw]) / np.sum(sp))

    alias = 0.55 * 48000.0 - 48000.0        # folds to -21.6 kHz at 48k
    c1 = _skip_if_backend_unimplemented(channelize, x, n_ch, 12)[1]
    c2 = _skip_if_backend_unimplemented(channelize_os2, x, n_ch, 12)[1]
    # at 96k the interferer sits at its true +26.4 kHz, not the alias
    assert band_frac(c2, 96000.0, 26400.0) > 0.2
    assert band_frac(c2, 96000.0, alias) < 0.02
    c2d = (np.asarray(frontend.decimate2_halfband(c2[None].real, hb))[0]
           + 1j * np.asarray(frontend.decimate2_halfband(c2[None].imag, hb))[0])
    a_crit = band_frac(c1, 48000.0, alias)
    a_os2 = band_frac(c2d, 48000.0, alias)
    assert a_crit > 0.2                      # critical sampling folds it in
    assert a_os2 < 0.01                      # os2 + halfband rejects it
    assert band_frac(c2d, 48000.0, 6000.0) > 0.95


def test_mesh_sharded_step():
    from dsdneo_tpu.parallel.mesh import dryrun_multichip
    n = min(len(jax.devices()), 8)
    if n < 2:
        pytest.skip("needs multiple devices")
    dryrun_multichip(n)


def test_mesh_shard_layout_and_collective():
    """Per-device shards carry C/n channels each, and the fleet-power
    all-reduce equals the host-computed mean over the full batch."""
    from jax.sharding import Mesh
    from dsdneo_tpu.parallel.mesh import make_sharded_frontend
    n = min(len(jax.devices()), 8)
    if n < 2:
        pytest.skip("needs multiple devices")
    mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("ch",))
    C, B = 2 * n, 4800
    step, in_shard = make_sharded_frontend(mesh, "p25p1", C, B)
    rng = np.random.default_rng(1)
    iq = rng.normal(size=(C, B, 2)).astype(np.float32)
    x = jax.device_put(iq, in_shard)
    assert len(x.addressable_shards) == n
    for sh in x.addressable_shards:
        assert sh.data.shape == (C // n, B, 2)
    dibits, soft, power, fleet = step(x)
    for sh in dibits.addressable_shards:
        assert sh.data.shape[0] == C // n
    np.testing.assert_allclose(float(fleet), float(np.mean(np.asarray(power))),
                               rtol=1e-5)


def test_graft_entry_dryrun_self_provisions():
    """__graft_entry__.dryrun_multichip must succeed even when the
    calling process sees fewer devices than requested (driver contract)."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


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


def test_imbe_ecc_roundtrip_and_correction():
    """encode_imbe_ecc/decode_imbe_ecc are exact inverses for arbitrary
    88-bit parameter strings, and single bit errors per code vector are
    corrected."""
    from dsdneo_tpu.protocol.p25 import imbe_frame as IF
    rng = np.random.default_rng(2)
    for _ in range(20):
        bits88 = rng.integers(0, 2, 88).astype(np.uint8)
        on_air = IF.encode_imbe_ecc(bits88)
        out, errs = IF.decode_imbe_ecc(on_air)
        assert errs == 0
        assert np.array_equal(out, bits88)
        # flip one bit in a protected vector (u0-u6) → corrected
        while True:
            j = int(rng.integers(0, 144))
            row = IF.IMBE_W[j // 2] if j % 2 == 0 else IF.IMBE_Y[j // 2]
            if row < 7:
                break
        flipped = on_air.copy()
        flipped[j] ^= 1
        out2, errs2 = IF.decode_imbe_ecc(flipped)
        assert np.array_equal(out2, bits88)
        assert errs2 == 1


def test_mesh_voice_chain_matches_unsharded():
    """The FULL sharded voice step (front end → sync → NID → LDU gather
    → IMBE ECC → dequant → synthesis) decodes the real P25 fixture
    identically on an n-device mesh and a 1-device mesh."""
    from jax.sharding import Mesh
    from dsdneo_tpu.io import read_iq_capture
    from dsdneo_tpu.parallel.mesh import make_sharded_voice_step
    n = min(len(jax.devices()), 8)
    if n < 2:
        pytest.skip("needs multiple devices")
    meta, samples = read_iq_capture(
        "/root/reference/tests/fixtures/iq/p25p1_c4fm_vc.iq.json")
    fs = float(meta.sample_rate_hz)
    B = int(fs)                       # 1 s slice; voice starts ~1.22 s
    sl = samples[int(1.2 * fs):int(1.2 * fs) + B]
    iq1 = np.stack([sl.real, sl.imag], axis=-1).astype(np.float32)
    C = n
    iq = np.broadcast_to(iq1[None], (C,) + iq1.shape).copy()

    pcms = []
    for nd in (n, 1):
        mesh = Mesh(np.array(jax.devices()[:nd]), axis_names=("ch",))
        step, in_shard = make_sharded_voice_step(mesh, C, B, fs=fs)
        x = jax.device_put(iq, in_shard)
        pcm, fleet = step(x)
        assert np.isfinite(float(fleet))
        pcms.append(np.asarray(pcm))
    # real voice must have decoded (non-silent PCM on every channel)
    assert np.abs(pcms[0]).max() > 1e-4
    assert (np.abs(pcms[0]).max(axis=1) > 1e-6).all()
    # channel 0 sees the same deterministic unvoiced-noise row under
    # both layouts (other channels' noise rows are shard-local by
    # design); f16 PCM ⇒ relative tolerance
    a, b = pcms[0][0].astype(np.float32), pcms[1][0].astype(np.float32)
    np.testing.assert_allclose(a, b, rtol=2e-3,
                               atol=2e-3 * max(np.abs(b).max(), 1.0))
