"""M17 Codec2 voice + stream encryption.

The reference decodes M17 voice with the external libcodec2
(/root/reference/src/protocol/m17/m17.c:63-66, 755-835) and decrypts
stream payloads with the M17 scrambler LFSR or AES-CTR
(m17.c:600-640, m17_algorithms.c:170-270).  These tests loop our TX
encoder through the RX chain and assert the emitted PCM is exactly what
libcodec2 produces for the same frame sequence.
"""

import numpy as np
import pytest

from dsdneo_tpu.vocoder import codec2 as c2

pytestmark = pytest.mark.skipif(not c2.available(),
                                reason="libcodec2 not present")


def _decode_dibits(dibits, **state):
    from dsdneo_tpu.protocol.base import DecoderContext, DibitReader, registry
    import dsdneo_tpu.protocol.m17  # noqa: F401
    from dsdneo_tpu.symbols import framesync

    lv = np.array([1.0, 3.0, -1.0, -3.0], dtype=np.float32)
    soft = lv[dibits]
    hits = framesync.find_syncs(soft, framesync.patterns_for({"m17"}),
                                threshold=0.9)
    ctx = DecoderContext()
    for k, v in state.items():
        setattr(ctx.state, k, v)
    dec = registry()["m17"]()
    consumed = 0
    for h in hits:
        if h.pos < consumed:
            continue
        r = DibitReader(dibits, soft, pos=h.end, frame_start=h.pos,
                        invert=h.sync.inverted)
        consumed = dec.handle(r, h, ctx)
    return ctx


def _tone_pcm(n_samples: int, f: float = 235.0) -> np.ndarray:
    t = np.arange(n_samples) / 8000.0
    return (6000 * np.sin(2 * np.pi * f * t)
            * (0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t))).astype(np.int16)


def _voice_frames_3200(n_frames: int) -> np.ndarray:
    enc = c2.Codec2(c2.MODE_3200)
    pcm = _tone_pcm(160 * 2 * n_frames)
    frames = np.zeros((n_frames, 128), dtype=np.uint8)
    for i in range(n_frames):
        frames[i, :64] = np.unpackbits(np.frombuffer(
            enc.encode(pcm[320 * i:320 * i + 160]), dtype=np.uint8))
        frames[i, 64:] = np.unpackbits(np.frombuffer(
            enc.encode(pcm[320 * i + 160:320 * i + 320]), dtype=np.uint8))
    return frames


def _assert_voice_match(got: np.ndarray, want: np.ndarray) -> None:
    """libcodec2's unvoiced excitation draws from a process-global RNG,
    so two decoder instances are only sample-exact when their calls
    don't interleave; assert near-identity instead of bit-equality."""
    assert got.shape == want.shape
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.995, f"voice corr {corr}"
    np.testing.assert_allclose(got, want, atol=0.02)


def _expected_pcm(frames: np.ndarray, mode: int) -> np.ndarray:
    dec = c2.Codec2(mode)
    out = []
    for f in frames:
        if mode == c2.MODE_3200:
            out.append(dec.decode_bits(f[:64]))
            out.append(dec.decode_bits(f[64:]))
        else:
            out.append(dec.decode_bits(f[:64]))
    return np.concatenate(out).astype(np.float32) / 32768.0


def test_codec2_binding_roundtrip():
    codec = c2.Codec2(c2.MODE_3200)
    assert codec.samples_per_frame == 160
    assert codec.bits_per_frame == 64
    pcm = _tone_pcm(160)
    bits = codec.encode(pcm)
    assert len(bits) == 8
    out = c2.Codec2(c2.MODE_3200).decode(bits)
    assert out.shape == (160,)
    assert np.abs(out.astype(np.float64)).mean() > 100  # not silence


def test_m17_stream_voice_3200_end_to_end():
    from dsdneo_tpu.protocol.m17.encoder import encode_stream_transmission
    frames = _voice_frames_3200(8)
    dibits = encode_stream_transmission("BROADCAST", "N0CALL", frames)
    ctx = _decode_dibits(dibits)
    assert 0 in ctx.audio
    got = np.concatenate(ctx.audio[0])
    want = _expected_pcm(frames, c2.MODE_3200)
    assert got.shape == (8 * 320,)
    _assert_voice_match(got, want)


def test_m17_stream_voice_1600_with_adata():
    from dsdneo_tpu.protocol.m17.encoder import encode_stream_transmission
    enc = c2.Codec2(c2.MODE_1600)
    pcm = _tone_pcm(320 * 6)
    frames = np.zeros((6, 128), dtype=np.uint8)
    for i in range(6):
        frames[i, :64] = enc.encode_bits(pcm[320 * i:320 * (i + 1)])
    frames[0, 64:] = np.unpackbits(
        np.frombuffer(b"hi tpu!\x00", dtype=np.uint8))
    dibits = encode_stream_transmission("BROADCAST", "N0CALL", frames, dt=3)
    ctx = _decode_dibits(dibits)
    got = np.concatenate(ctx.audio[0])
    _assert_voice_match(got, _expected_pcm(frames, c2.MODE_1600))
    text = "\n".join(e.line for e in ctx.events)
    assert "Voice (1600bps)" in text
    assert "A_DATA: hi tpu!" in text


def test_m17_scrambler_stream_decrypts_with_key():
    from dsdneo_tpu.protocol.m17.encoder import encode_stream_transmission
    frames = _voice_frames_3200(5)
    dibits = encode_stream_transmission(
        "BROADCAST", "N0CALL", frames, enc=1, enc_st=1,
        scrambler_seed=0xBEEF)
    # without the key: no audio, frames marked encrypted
    ctx = _decode_dibits(dibits)
    assert 0 not in ctx.audio
    assert "*ENC*" in "\n".join(e.line for e in ctx.events)
    assert "Scrambler" in "\n".join(e.line for e in ctx.events)
    # with the key: bit-exact voice
    ctx = _decode_dibits(dibits, m17_scrambler_key=0xBEEF)
    got = np.concatenate(ctx.audio[0])
    _assert_voice_match(got, _expected_pcm(frames, c2.MODE_3200))


def test_m17_aes_ctr_stream_decrypts_with_key():
    from dsdneo_tpu.protocol.m17.encoder import encode_stream_transmission
    frames = _voice_frames_3200(4)
    key = bytes(range(16))
    meta = bytes(range(100, 114))
    dibits = encode_stream_transmission(
        "BROADCAST", "N0CALL", frames, enc=2, enc_st=0, meta=meta,
        aes_key=key)
    ctx = _decode_dibits(dibits)
    assert 0 not in ctx.audio
    assert "AES-CTR" in "\n".join(e.line for e in ctx.events)
    ctx = _decode_dibits(dibits, m17_aes_key=key)
    got = np.concatenate(ctx.audio[0])
    _assert_voice_match(got, _expected_pcm(frames, c2.MODE_3200))


def test_m17_fixture_emits_voice():
    """The reference m17.iq fixture carries a 3200 bps voice stream —
    with libcodec2 present the full chain must now emit PCM."""
    import os
    fx = "/root/reference/tests/fixtures/iq/m17.iq.json"
    if not os.path.exists(fx):
        pytest.skip("reference fixtures not mounted")
    from dsdneo_tpu.engine.decoder import decode_capture
    ctx = decode_capture(fx, "m17")
    text = "\n".join(e.line for e in ctx.events)
    if "Voice (3200bps)" not in text:
        pytest.skip("fixture stream is not 3200 voice")
    assert 0 in ctx.audio
    pcm = np.concatenate(ctx.audio[0])
    assert pcm.size >= 320
    assert np.abs(pcm).max() > 0


def test_lsf_meta_gnss_position():
    """META GNSS v2 (0x81): signed-24 lat/lon scaling + validity flags
    (reference m17_parse.c m17_read_gnss_v2_fields)."""
    import numpy as np
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.protocol.m17.decoder import M17Decoder

    meta = np.zeros(14, dtype=np.uint8)
    meta[0] = 0x81
    meta[2] = (0x6 << 4)                     # altitude+velocity valid
    lat = int(round(42.3 / 90.0 * 8388607))
    lon = (-71.1 / 180.0 * 8388607)
    lon = int(round(lon)) & 0xFFFFFF
    meta[4:7] = [(lat >> 16) & 0xFF, (lat >> 8) & 0xFF, lat & 0xFF]
    meta[7:10] = [(lon >> 16) & 0xFF, (lon >> 8) & 0xFF, lon & 0xFF]
    meta[10:12] = [(1500 + 120) >> 8, (1500 + 120) & 0xFF]
    meta[12] = (88 << 4) >> 8 if False else (88 >> 4)
    meta[12] = (88 >> 4) & 0xFF
    meta[13] = (88 & 0xF) << 4
    ctx = DecoderContext()
    out = M17Decoder._meta_decode(meta, ctx)
    assert "Meta GNSS Position Data" in out
    assert "Lat: 42.3" in out and "Lon: -71.1" in out
    assert "Alt: 120 m" in out
    assert "Speed: 22.0 km/h" in out
    la, lo = ctx.state.m17_gps
    assert abs(la - 42.3) < 1e-4 and abs(lo + 71.1) < 1e-4


def test_lsf_meta_text_assembly():
    """META text blocks assemble across LSFs via length/block bitmaps
    (reference m17_parse.c meta text assembler)."""
    import numpy as np
    from dsdneo_tpu.protocol.m17.decoder import M17Decoder

    dec = M17Decoder()
    msg = "HELLO M17 FROM THE TPU SIDE"
    blocks = [msg[i * 13:(i + 1) * 13].ljust(13) for i in range(2)]
    m1 = np.zeros(14, dtype=np.uint8)
    m1[0] = (0x3 << 4) | 0x1
    m1[1:14] = [ord(c) for c in blocks[0]]
    m2 = np.zeros(14, dtype=np.uint8)
    m2[0] = (0x3 << 4) | 0x2
    m2[1:14] = [ord(c) for c in blocks[1]]
    out1 = dec._meta_text_block(m1)
    assert "Meta Text Block 1/2" in out1
    out2 = dec._meta_text_block(m2)
    assert "Meta Text Data: HELLO M17 FROM THE TPU SID" in out2
