"""M17 UDP/IP frame mode + MBE data file I/O."""

import numpy as np
import pytest


def test_m17_ip_stream_roundtrip():
    from dsdneo_tpu.protocol.m17.encoder import build_lsf
    from dsdneo_tpu.protocol.m17.ip import pack_stream_frame, parse_ip_frame

    lsf = build_lsf("REFLECTOR", "N0CALL", can=7)
    rng = np.random.default_rng(0)
    voice = rng.integers(0, 2, 128).astype(np.uint8)
    frame = pack_stream_frame(lsf, sid=0x1234, fn=0x42, eot=False,
                              voice128=voice)
    assert len(frame) == 54 and frame[:4] == b"M17 "
    p = parse_ip_frame(frame)
    assert p is not None and p.kind == "stream" and p.crc_ok
    assert p.sid == 0x1234 and p.fn == 0x42 and not p.eot
    assert p.src == "N0CALL" and p.dst == "REFLECTOR"
    np.testing.assert_array_equal(p.voice, voice)
    # corrupted CRC detected
    bad = frame[:-1] + bytes([frame[-1] ^ 1])
    assert not parse_ip_frame(bad).crc_ok
    # control frames
    assert parse_ip_frame(b"PING" + b"\x00" * 6).kind == "PING"
    assert parse_ip_frame(b"JUNKxxxx") is None


def test_m17_ip_udp_sockets():
    from dsdneo_tpu.protocol.m17.encoder import build_lsf
    from dsdneo_tpu.protocol.m17.ip import (M17UdpInput, M17UdpOutput,
                                            pack_stream_frame)
    rx = M17UdpInput(0)
    tx = M17UdpOutput("127.0.0.1", rx.port)
    lsf = build_lsf("ALL", "DSDNEO", can=1)
    tx.send(pack_stream_frame(lsf, sid=9, fn=1, eot=True,
                              voice128=np.zeros(128, dtype=np.uint8)))
    fr = None
    for _ in range(10):
        fr = rx.recv_frame()
        if fr is not None:
            break
    tx.close()
    rx.close()
    assert fr is not None and fr.kind == "stream" and fr.eot
    assert fr.src == "DSDNEO"


def test_m17_decode_blasts_udp():
    """Decoding the M17 fixture with an attached UDP sink emits valid
    stream IP frames carrying the over-the-air voice payloads."""
    import os
    fx = "/root/reference/tests/fixtures/iq/m17.iq.json"
    if not os.path.exists(fx):
        pytest.skip("fixtures unavailable")
    from dsdneo_tpu.engine.decoder import decode_capture
    from dsdneo_tpu.protocol.m17.ip import M17UdpInput, M17UdpOutput
    rx = M17UdpInput(0)
    tx = M17UdpOutput("127.0.0.1", rx.port)
    decode_capture(fx, "m17", m17_udp=tx)
    frames = []
    for _ in range(200):
        f = rx.recv_frame()
        if f is None:
            break
        frames.append(f)
    tx.close()
    rx.close()
    assert len(frames) >= 20
    assert all(f.crc_ok for f in frames)
    assert any(f.src == "N0CALL" for f in frames)


def test_mbe_file_roundtrip(tmp_path):
    from dsdneo_tpu.io.mbe_files import MbeFileWriter, read_mbe_file
    rng = np.random.default_rng(1)
    # IMBE
    p = tmp_path / "voice.imb"
    w = MbeFileWriter(str(p))
    frames = [rng.integers(0, 2, 88).astype(np.uint8) for _ in range(5)]
    for i, f in enumerate(frames):
        w.write(f, errs=i)
    w.close()
    kind, got = read_mbe_file(str(p))
    assert kind == "imb" and len(got) == 5
    for i, (errs, bits) in enumerate(got):
        assert errs == i
        np.testing.assert_array_equal(bits, frames[i])
    # AMBE (49th bit preserved as raw byte)
    p2 = tmp_path / "voice.amb"
    w = MbeFileWriter(str(p2))
    fr = rng.integers(0, 2, 49).astype(np.uint8)
    fr[48] = 1
    w.write(fr, errs=2)
    w.close()
    kind, got = read_mbe_file(str(p2))
    assert kind == "amb" and got[0][0] == 2
    np.testing.assert_array_equal(got[0][1], fr)


def test_mbe_out_and_playback_cli(tmp_path):
    """--mbe-out captures voice frames during decode; --mbe-in plays
    them back to PCM (reference -d / -r round trip)."""
    import os
    fx = "/root/reference/tests/fixtures/iq/p25p1_c4fm_vc.iq.json"
    if not os.path.exists(fx):
        pytest.skip("fixtures unavailable")
    from dsdneo_tpu import cli
    mbe = tmp_path / "call.imb"
    rc = cli.main(["--frontend", "none", "-f1", "--iq-replay", fx,
                   "-o", "null", "--mbe-out", str(mbe)])
    assert rc == 0
    from dsdneo_tpu.io.mbe_files import read_mbe_file
    kind, frames = read_mbe_file(str(mbe))
    assert kind == "imb" and len(frames) >= 60

    wav = tmp_path / "out.wav"
    rc = cli.main(["--mbe-in", str(mbe), "-o", f"wav:{wav}"])
    assert rc == 0
    from dsdneo_tpu.io.audio_files import read_wav
    pcm, fs = read_wav(str(wav))
    assert fs == 8000 and len(np.asarray(pcm)) == 160 * len(frames)
