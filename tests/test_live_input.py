"""Live -i input paths: UDP PCM discriminator tap through the CLI, and
the disc-input symbolizer (reference -i udp/tcp sources,
src/io/audio_backends/udp_input.c / tcp_input.c feed getSymbol with
already-demodulated 48 kHz PCM)."""

import os
import socket
import threading

import numpy as np
import pytest

FIXTURE = "/root/reference/tests/fixtures/iq/p25p1_c4fm_cc.iq.json"


def _disc_pcm_from_fixture() -> np.ndarray:
    """Reference-shaped source: demodulate the P25 CC fixture to 48 kHz
    discriminator PCM16LE (what a real radio's disc tap produces)."""
    import jax.numpy as jnp
    from dsdneo_tpu.dsp import firdes, frontend
    from dsdneo_tpu.io import read_iq_capture
    meta, samples = read_iq_capture(FIXTURE)
    taps = jnp.asarray(firdes.channel_lpf(float(meta.sample_rate_hz),
                                          "p25_c4fm"))
    y = frontend.fir_complex(jnp.asarray(samples[None, :]), taps)
    d = np.asarray(frontend.fm_discriminate(y))[0]
    return np.clip(d * 8000.0, -32767, 32767).astype(np.int16)


@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="reference fixtures unavailable")
def test_disc_input_stream_decoder():
    """The disc-input StreamDecoder recovers the same payload as the
    I/Q path (NAC/CC from the P25 control channel)."""
    from dsdneo_tpu.engine.stream import StreamDecoder
    pcm = _disc_pcm_from_fixture()
    sd = StreamDecoder("p25p1", fs=48000.0, input_kind="disc")
    for i in range(0, len(pcm), 12000):
        sd.push(pcm[i:i + 12000].astype(np.float32) / 32768.0)
    sd.flush()
    text = "\n".join(e.line for e in sd.ctx.events)
    assert "NAC/CC: 140" in text


@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="reference fixtures unavailable")
def test_cli_udp_pcm_live_input(capsys):
    """Full CLI: -f1 -i udp:PORT decodes a PCM16LE blast of the
    fixture's discriminator audio."""
    from dsdneo_tpu import cli

    pcm = _disc_pcm_from_fixture()
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    # pick a free port first
    probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    def blast():
        import time
        time.sleep(0.7)                   # let the receiver bind
        for i in range(0, len(pcm), 1200):
            sock.sendto(pcm[i:i + 1200].tobytes(), ("127.0.0.1", port))
            time.sleep(0.004)

    t = threading.Thread(target=blast, daemon=True)
    t.start()
    rc = cli.main(["-f1", "-i", f"udp:{port}", "--duration", "6"])
    t.join(timeout=10)
    assert rc == 0
    out = capsys.readouterr().out
    assert "NAC/CC: 140" in out
