"""Batched dPMR voice pipeline (engine.dpmrbatch) vs the serial
decoder on the real dpmr fixture."""

import numpy as np

FX = "/root/reference/tests/fixtures/iq/dpmr.iq.json"


def _fixture():
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(FX)
    iq = np.stack([samples.real, samples.imag],
                  axis=-1).astype(np.float32)
    return float(meta.sample_rate_hz), samples, iq


def test_dpmr_batched_bits_match_serial():
    """The device gather + AMBE ECC recovers the same 49-bit frames the
    serial FS2 part decoder extracts on the off-air fixture."""
    from dsdneo_tpu.engine.decoder import decode_samples
    from dsdneo_tpu.engine.dpmrbatch import BatchedDpmrVoicePipeline
    from dsdneo_tpu.vocoder import mbe as mbemod
    fs, samples, iq = _fixture()

    serial = []
    orig = mbemod.decode_ambe_2450

    def spy(bits49):
        serial.append(np.asarray(bits49).copy())
        return orig(bits49)

    mbemod.decode_ambe_2450 = spy
    try:
        decode_samples(samples, "dpmr", fs=fs)
    finally:
        mbemod.decode_ambe_2450 = orig
    assert len(serial) >= 8

    pipe = BatchedDpmrVoicePipeline(1, fs=fs)
    dibits_dev, idx, vq, dq, n_sym = pipe.frontend_sync_device(iq[None])
    ac, at, ai, fch, forder = pipe.pick_parts(idx, vq, dq, n_sym)
    assert ac.size >= 3
    # extract the batched AMBE frames for comparison
    import jax.numpy as jnp
    from dsdneo_tpu.fec.device import ambe_ecc_batch
    offs = np.asarray(pipe._offs).reshape(-1)
    recovered = np.asarray(dibits_dev)[0]
    got = set()
    for h in range(ac.size):
        dd = recovered[np.clip(int(at[h]) + offs, 0, recovered.size - 1)]
        dd = (dd ^ (int(ai[h]) * 2)).reshape(-1, 36)
        b72 = np.zeros((8, 72), np.uint8)
        b72[:, 0::2] = (dd >> 1) & 1
        b72[:, 1::2] = dd & 1
        out, errs = (np.asarray(v) for v in ambe_ecc_batch(b72))
        for i in range(8):
            got.add(out[i].tobytes())
    truth = {f.tobytes() for f in serial}
    inter = len(truth & got)
    assert inter >= 0.8 * len(truth), (
        f"batched matched {inter}/{len(truth)} serial AMBE frames")


def test_dpmr_batched_pcm():
    from dsdneo_tpu.engine.dpmrbatch import BatchedDpmrVoicePipeline
    fs, _samples, iq = _fixture()
    pipe = BatchedDpmrVoicePipeline(2, fs=fs)
    iqb = np.broadcast_to(iq[None], (2,) + iq.shape).copy()
    pcm = pipe.decode_block(iqb)
    assert pcm.shape[0] == 2 and pcm.shape[1] % 160 == 0
    assert 0 < np.abs(pcm).max() <= 1.0
