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


def test_retune_mute_window_and_tagged_completion():
    """After tune(): the mute window drops transient blocks, stale-
    generation feeds are rejected, and the first fresh feed completes
    the pending tune (reference retune discipline)."""
    import numpy as np
    from dsdneo_tpu.engine.live import LiveEngine

    eng = LiveEngine("p25p1", fs=48000.0, block_s=0.05,
                     retune_mute_s=0.075)
    blank = bytes(2 * 4800)             # 0.05 s of cu8 zeros
    assert eng.feed_cu8(blank) > 0
    g0 = eng.tune_generation
    eng.tune(851_000_000.0)
    assert eng.tune_generation == g0 + 1
    assert eng.tune_pending
    # stale-generation data (produced before the hardware retuned)
    assert eng.feed_cu8(blank, generation=g0) == 0
    assert eng.stale_feeds == 1
    assert eng.tune_pending
    # fresh data completes the tune
    assert eng.feed_cu8(blank, generation=eng.tune_generation) > 0
    assert not eng.tune_pending
    for _ in range(5):
        eng.feed_cu8(blank, generation=eng.tune_generation)
    n = eng.run(max_blocks=2)
    assert n == 2
    # the first ceil(0.075/0.05)=2 blocks were muted
    assert eng.metrics.snapshot().retune_muted is True
    eng._stop = False
    eng.run(max_blocks=2)
    assert eng.metrics.snapshot().retune_muted is False


def test_squelch_hop_rotates_scanner():
    from dsdneo_tpu.engine.live import LiveEngine
    from dsdneo_tpu.engine.trunk import ScanTarget, TrunkScanner

    tunes = []
    fake_now = [0.0]
    sc = TrunkScanner(tune=lambda f, m: tunes.append(f) or True,
                      dwell_s=0.0, hold_s=0.0,
                      now_fn=lambda: fake_now[0])
    sc.add_target(ScanTarget(851e6, "p25p1"))
    sc.add_target(ScanTarget(852e6, "p25p1"))
    eng = LiveEngine("p25p1", fs=48000.0, block_s=0.05, scanner=sc,
                     hop_s=0.1, retune_mute_s=0.0)
    eng.squelch_db = 10.0               # force squelch closed
    blank = bytes(2 * 4800)
    for _ in range(8):
        eng.feed_cu8(blank)
        fake_now[0] += 0.05
    eng.run(max_blocks=8)
    # squelched for >hop_s repeatedly -> scanner rotated targets
    assert len(tunes) >= 2
    assert set(tunes) <= {851e6, 852e6}
