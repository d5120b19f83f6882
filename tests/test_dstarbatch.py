"""Batched D-STAR pipeline (engine.dstarbatch) vs the serial decoder
on the real dstar fixture."""

import numpy as np
import pytest

FX = "/root/reference/tests/fixtures/iq/dstar.iq.json"


def _fixture():
    import os
    if not os.path.exists(FX):
        pytest.skip("reference fixtures unavailable")
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(FX)
    iq = np.stack([samples.real, samples.imag],
                  axis=-1).astype(np.float32)
    return float(meta.sample_rate_hz), samples, iq


def test_conv_k3_device_matches_host_viterbi():
    """The batched K=3 Viterbi is bit-identical to the host decoder on
    encoded streams with up to 2 injected bit errors per word."""
    from dsdneo_tpu.fec.device import conv_k3_decode_batch
    from dsdneo_tpu.protocol.dstar.decoder import _V_TRANS, _viterbi_k3
    rng = np.random.default_rng(3)

    def encode(info):
        # G1=x²+x+1, G2=x²+1 (dstar decoder trellis, forward direction)
        s = 0
        out = []
        for b in info:
            nxt = ((s << 1) | int(b)) & 3
            # find the transition s→nxt in the decoder lattice
            for ns, ((pa, a1, a0), (pb, b1, b0)) in _V_TRANS.items():
                if ns == nxt and pa == s:
                    out += [a1, a0]
                    break
                if ns == nxt and pb == s:
                    out += [b1, b0]
                    break
            s = nxt
        return np.asarray(out, np.uint8)

    words = []
    for _ in range(16):
        info = rng.integers(0, 2, 330).astype(np.uint8)
        coded = encode(info)
        nerr = rng.integers(0, 3)
        for p in rng.choice(660, size=nerr, replace=False):
            coded[p] ^= 1
        words.append(coded)
    batch = np.stack(words)
    dev = np.asarray(conv_k3_decode_batch(batch))
    for i, coded in enumerate(words):
        host = _viterbi_k3(coded)
        assert np.array_equal(dev[i], host), f"word {i} diverges"


def test_dstar_batched_matches_and_extends_serial():
    """Every event the serial decoder recovers (header + voice
    superframes with their slow-data header copy) is reproduced with
    an identical payload line and identical raw AMBE voice bits; the
    chain gate additionally recovers the superframes the serial
    threshold drops."""
    from dsdneo_tpu.engine.decoder import decode_samples
    from dsdneo_tpu.engine.dstarbatch import BatchedDstarPipeline
    fs, samples, iq = _fixture()
    host = decode_samples(samples, "dstar", fs=fs)
    host_by_pos = {e.pos: e for e in host.events
                   if "KB7WUK" in e.line}
    assert len(host_by_pos) >= 3

    pipe = BatchedDstarPipeline(1, fs=fs)
    pipe.decode_block_events(iq[None])
    batch_by_pos = {e.pos: e for e in pipe.events(0)}
    for pos, he in host_by_pos.items():
        be = batch_by_pos.get(pos)
        assert be is not None, f"batch lost serial event at {pos}"
        assert be.line == he.line
        if "voice" in he.fields:
            assert np.array_equal(be.fields["voice"], he.fields["voice"])
    # chain-gate recovery: strictly more KB7WUK voice superframes
    hv = [e for e in host_by_pos.values() if "VOICE" in e.line]
    bv = [e for e in batch_by_pos.values()
          if "VOICE" in e.line and "KB7WUK" in e.line]
    assert len(bv) > len(hv)
    # consecutive superframes sit exactly 2016 dibits apart
    vp = sorted(e.pos for e in bv)
    assert all(b - a == 2016 for a, b in zip(vp, vp[1:]))
    # the early header the serial path garbles decodes with CRC intact
    hd = [e for e in pipe.events(0) if "HEADER" in e.line]
    assert any("CRC ERR" not in e.line and "WB7DZG" in e.line
               for e in hd)


def test_dstar_batched_rejects_noise():
    """Noise-only channels emit nothing: voice needs the ±2016 chain
    partner, headers need CRC or a strong correlation."""
    from dsdneo_tpu.engine.dstarbatch import BatchedDstarPipeline
    fs, _samples, iq = _fixture()
    rng = np.random.default_rng(7)
    noise = rng.normal(0, 0.3, iq.shape).astype(np.float32)
    pipe = BatchedDstarPipeline(2, fs=fs)
    pipe.decode_block_events(np.stack([iq, noise]))
    assert len(pipe.events(0)) >= 5
    assert len(pipe.events(1)) == 0


def test_dstar_fleet_group():
    """D-STAR registers as a fleet mode: events reachable per channel,
    PCM surface is the documented empty [C, 0] (raw AMBE-2400)."""
    from dsdneo_tpu.engine.fleet import FleetMonitor
    fs, _samples, iq = _fixture()
    fm = FleetMonitor(fs=fs)
    fm.assign("dstar", 2, kind="voice")
    fm.decode_block(np.stack([iq, iq]))
    assert len(fm.events(0)) >= 5 and len(fm.events(1)) >= 5
    assert fm.groups[0].pcm.shape == (2, 0)
    srcs = [e.fields.get("src", "") for e in fm.events(0)]
    assert any("KB7WUK" in s for s in srcs)
    # channel grid reflects voicing activity despite the empty PCM
    assert all(r["state"] == "voice" for r in fm.channel_dicts())
