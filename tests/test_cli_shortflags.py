"""Reference short-flag surface (src/runtime/cli/args.c getopt loop):
key material, slot control, logging taps, WAV I/O, polarity
expectations, mute semantics."""

import contextlib
import io as _io
import os
import socket
import struct
import threading

import numpy as np
import pytest

FX = "/root/reference/tests/fixtures/iq/p25p1_c4fm_cc.iq.json"
needs_fixture = pytest.mark.skipif(not os.path.exists(FX),
                                   reason="reference fixtures unavailable")


def test_parser_short_flag_surface():
    from dsdneo_tpu.cli import build_parser
    p = build_parser()
    a = p.parse_args(["-f1", "--iq-replay", "x",
                      "-w", "out.wav", "-6", "raw.wav", "-P", "-7", "D",
                      "-J", "ev.log", "-L", "gps.log", "-Q", "dsp.bin",
                      "-c", "sym.bin", "-N", "-Z", "-a", "-8",
                      "-g", "25", "-n", "m", "-V", "1", "-z", "0", "-y",
                      "-s", "96000", "-l", "-q", "-xr", "-xd",
                      "-Y", "-B", "12500", "-D", "4", "-_", "300",
                      "-1", "0123456789", "-H", "0011223344",
                      "-9", "1234", "-A", "abcd",
                      "-S", "dead:256", "-4", "-0", "-3"])
    assert a.static_wav == "out.wav" and a.raw_wav == "raw.wav"
    assert a.percall_wav and a.percall_dir == "D"
    assert a.event_log == "ev.log" and a.lrrp_log == "gps.log"
    assert a.dsp_out == "dsp.bin" and a.symbol_out == "sym.bin"
    assert a.frontend_terminal and a.payload_log and a.call_alert
    assert a.monitor_input and a.digital_gain == 25.0
    assert a.analog_gain == "m" and a.slot_mask == 1 and a.slot_pref == 0
    assert a.float_audio and a.sample_rate == 96000
    assert a.no_cosine_filter and a.reverse_mute
    assert a.inversion == ["r", "d"]
    assert a.scanner_mode and a.setmod_bw == 12500
    assert a.dmrla_n == 4 and a.nxdn_seed == 300
    assert a.rc4_key == "0123456789" and a.hytera_key == "0011223344"
    assert a.ken_key == "1234" and a.anytone_key == "abcd"
    assert a.static_ks == "dead:256"
    assert a.key_priority and a.force_rc4 and a.disable_le


def test_modulation_lock_flag():
    from dsdneo_tpu.cli import _state_attrs, build_parser
    p = build_parser()
    a = p.parse_args(["-f1", "--iq-replay", "x", "-mq"])
    assert a.modulation == "q"
    assert _state_attrs(a, None, None)["mod_lock"] == "q"
    a = p.parse_args(["-f1", "--iq-replay", "x", "-mc"])
    assert a.modulation == "c"


def test_state_attrs_key_and_behavior_flags():
    from dsdneo_tpu.cli import _state_attrs, build_parser
    a = build_parser().parse_args(
        ["-f1", "--iq-replay", "x", "-H", "0011223344", "-9", "7fff",
         "-A", "1234", "-S", "dead:256", "-V", "2", "-q", "-Z",
         "-_", "300", "-D", "4", "-xr", "-xx", "-0", "-3"])
    attrs = _state_attrs(a, None, None)
    assert attrs["dmr_hytera_bp"] == (0x0011223344, 0, 0, 0)
    assert attrs["dmr_kenwood_key"] == 0x7FFF
    assert attrs["dmr_anytone_key"] == 0x1234
    assert attrs["dmr_static_ks"].apply_frame49 is not None
    assert attrs["slot_mask"] == 2
    assert attrs["reverse_mute"] and attrs["payload_log"]
    assert attrs["nxdn_pn95_seed"] == 300
    assert attrs["dmr_dmrla_n"] == 4
    assert attrs["force_polarity"] == {"dmr": True, "x2tdma": False}
    assert attrs["dmr_force_rc4"] and attrs["dmr_le_disable"]


def test_hytera_long_key_splits_into_segments():
    from dsdneo_tpu.cli import _state_attrs, build_parser
    a = build_parser().parse_args(
        ["-f1", "--iq-replay", "x",
         "-H", "00112233445566778899aabbccddeeff"])
    attrs = _state_attrs(a, None, None)
    assert attrs["dmr_hytera_bp"] == (0x0011223344556677,
                                      0x8899AABBCCDDEEFF, 0, 0)


def test_keyring_forced_lookup():
    from dsdneo_tpu.crypto.keyring import KeyRing
    kr = KeyRing()
    kr.scalar[5] = 0xABC
    kr.forced = 0x123
    assert kr.lookup(5) == 0xABC          # CSV entry wins
    assert kr.lookup(99) == 0x123         # fallback to forced -1 key
    kr.forced = None
    assert kr.lookup(99) is None


def test_slot_mask_gates_emit_audio():
    from dsdneo_tpu.protocol.base import DecoderContext
    ctx = DecoderContext()
    ctx.state.slot_mask = 1               # slot 1 only (-V 1)
    ctx.emit_audio(np.ones(160, np.float32), slot=0)
    ctx.emit_audio(np.ones(160, np.float32), slot=1)
    assert list(ctx.audio) == [0]
    ctx.state.slot_mask = 3
    ctx.emit_audio(np.ones(160, np.float32), slot=1)
    assert sorted(ctx.audio) == [0, 1]


def test_float_wav_sink(tmp_path):
    from dsdneo_tpu.io.audio_out import FloatWavSink, make_sink
    path = str(tmp_path / "f.wav")
    sink = make_sink("wav:" + path, float_audio=True)
    assert isinstance(sink, FloatWavSink)
    pcm = np.linspace(-1, 1, 160, dtype=np.float32)
    sink.write(0, pcm)
    sink.close()
    with open(path, "rb") as f:
        hdr = f.read(44)
        data = np.frombuffer(f.read(), dtype="<f4")
    fmt_tag = struct.unpack_from("<H", hdr, 20)[0]
    bits = struct.unpack_from("<H", hdr, 34)[0]
    assert fmt_tag == 3 and bits == 32    # WAVE_FORMAT_IEEE_FLOAT
    np.testing.assert_allclose(data, pcm, rtol=0, atol=0)


def test_list_audio_devices_prints():
    from dsdneo_tpu.io.audio_out import list_audio_devices
    out = _io.StringIO()
    list_audio_devices(out=out)
    text = out.getvalue()
    assert "pulse" in text or "backends" in text


def test_pn9_scramble_seed_override():
    from dsdneo_tpu.protocol.nxdn.decoder import (_SCRAMBLE_POS,
                                                  _pn9_scramble_positions)
    np.testing.assert_array_equal(_pn9_scramble_positions(0xE4),
                                  _SCRAMBLE_POS)
    other = _pn9_scramble_positions(300)
    assert not np.array_equal(other, _SCRAMBLE_POS)


def test_p25_enc_mute_flag_tracks_key_state():
    from dsdneo_tpu.protocol.p25.phase1 import P25P1Decoder
    from dsdneo_tpu.protocol.base import DecoderContext
    from dsdneo_tpu.crypto.keyring import KeyRing
    dec = P25P1Decoder()
    ctx = DecoderContext()
    s = ctx.state
    bits = np.zeros(88, np.uint8)
    s.payload_algid = 0xAA
    s.payload_kid = 7
    s.payload_mi = 0x1122334455667788
    dec._decrypt_imbe(bits, ctx)          # encrypted, no key loaded
    assert s.p25_enc_unbroken is True
    s.keyring = KeyRing()
    s.keyring.forced = 0x123              # -1 forced key applies
    dec._decrypt_imbe(bits, ctx)
    assert s.p25_enc_unbroken is False
    s.payload_algid = 0x80                # clear call
    dec._decrypt_imbe(bits, ctx)
    assert s.p25_enc_unbroken is False


def test_rigctl_set_mode():
    from dsdneo_tpu.io.net import RigctlClient
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    got = []

    def serve():
        conn, _ = srv.accept()
        got.append(conn.recv(64))
        conn.sendall(b"RPRT 0\n")
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    c = RigctlClient("127.0.0.1", port)
    assert c.set_mode("FM", 12500)
    c.close()
    t.join(timeout=2)
    assert got and got[0].strip() == b"M FM 12500"


@needs_fixture
def test_cli_event_and_lrrp_logs(tmp_path):
    """-J writes one line per decode event; -w writes the static WAV
    alias; both on a single fixture replay."""
    from dsdneo_tpu import cli
    ev = str(tmp_path / "ev.log")
    wav = str(tmp_path / "out.wav")
    err = _io.StringIO()
    with contextlib.redirect_stderr(err):
        rc = cli.main(["--frontend", "none", "-f1", "--iq-replay", FX,
                       "-J", ev, "-w", wav])
    assert rc == 0
    lines = open(ev).read().splitlines()
    assert sum("NAC/CC: 140" in ln for ln in lines) >= 10
    assert os.path.exists(wav)            # -w → wav: alias (CC = empty ok)


@needs_fixture
def test_cli_wav_file_input(tmp_path):
    """-i file.wav: discriminator-tap PCM input path (reference WAV
    input, -s rate override)."""
    import jax.numpy as jnp
    from dsdneo_tpu import cli
    from dsdneo_tpu.dsp import firdes, frontend
    from dsdneo_tpu.io import read_iq_capture
    from dsdneo_tpu.io.audio_files import write_wav
    meta, samples = read_iq_capture(FX)
    taps = jnp.asarray(firdes.channel_lpf(float(meta.sample_rate_hz),
                                          "p25_c4fm"))
    y = frontend.fir_complex(jnp.asarray(samples[None, :]), taps)
    d = np.asarray(frontend.fm_discriminate(y))[0]
    pcm = np.clip(d * 8000.0, -32767, 32767).astype(np.int16)
    path = str(tmp_path / "disc.wav")
    write_wav(path, pcm, int(meta.sample_rate_hz))
    err, out = _io.StringIO(), _io.StringIO()
    with contextlib.redirect_stderr(err), contextlib.redirect_stdout(out):
        rc = cli.main(["--frontend", "none", "-f1", "-i", path,
                       "-o", "null", "-s", str(int(meta.sample_rate_hz))])
    assert rc == 0
    assert "NAC/CC: 140" in out.getvalue() + err.getvalue()


@needs_fixture
def test_iq_info(capsys):
    from dsdneo_tpu import cli
    rc = cli.main(["--iq-info", FX])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sample_rate_hz:" in out and "duration_s:" in out
