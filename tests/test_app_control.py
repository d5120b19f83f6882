"""app_control boundary: snapshot hub + command queue + engine wiring."""

import threading
import time

import numpy as np


def test_metrics_hub_generations_and_immutability():
    from dsdneo_tpu.app_control import MetricsHub
    hub = MetricsHub()
    s0 = hub.snapshot()
    assert s0.generation == 0
    hub.publish(freq_hz=851e6, snr_db=12.5)
    s1 = hub.snapshot()
    assert s1.generation == 1 and s1.freq_hz == 851e6
    # old snapshot unchanged (immutability)
    assert s0.freq_hz == 0.0
    hub.bump_health(p25p1_fec_ok=3, p25p1_fec_err=1)
    hub.bump_health(p25p1_fec_ok=2)
    h = hub.snapshot().health
    assert h.p25p1_fec_ok == 5 and h.p25p1_fec_err == 1


def test_command_queue_capacity_and_fifo():
    from dsdneo_tpu.app_control import AppCommand, CommandQueue
    q = CommandQueue(capacity=3)
    assert q.put(AppCommand.TUNE, 1.0)
    assert q.put(AppCommand.TUNE, 2.0)
    assert q.put(AppCommand.TOGGLE_MUTE)
    assert not q.put(AppCommand.TUNE, 3.0)       # full → dropped
    assert q.dropped == 1
    items = q.drain()
    assert [i.cmd for i in items] == [AppCommand.TUNE, AppCommand.TUNE,
                                      AppCommand.TOGGLE_MUTE]
    assert len(q) == 0


def test_live_engine_commands_and_snapshots():
    """Frontend-side tune/stop commands drain between blocks; the hub
    publishes per-block metrics (the reference's ui_snapshot contract)."""
    from dsdneo_tpu.app_control import AppCommand
    from dsdneo_tpu.engine.live import LiveEngine

    eng = LiveEngine("p25p1", fs=48000.0, block_s=0.05)
    rng = np.random.default_rng(0)
    # a queued TUNE purges the ring (retune discipline), so it must
    # drain before samples are fed
    eng.commands.put(AppCommand.TUNE, 852_000_000.0)
    eng._drain_commands()
    raw = (rng.integers(0, 256, 2 * 4800 * 3, dtype=np.uint8)).tobytes()
    eng.feed_cu8(raw)
    t = threading.Thread(target=eng.run, kwargs={"max_blocks": 4})
    t.start()
    t.join(timeout=30)
    assert not t.is_alive()
    snap = eng.metrics.snapshot()
    assert snap.generation >= 4
    assert snap.freq_hz == 852_000_000.0
    assert eng.retunes == 1
    assert snap.input_level_rms > 0

    # STOP command halts the loop promptly
    eng2 = LiveEngine("p25p1", fs=48000.0, block_s=0.05)
    eng2.commands.put(AppCommand.STOP)
    t0 = time.time()
    n = eng2.run()
    assert n == 0 and time.time() - t0 < 2.0


def test_menu_navigation_and_input_dispatch():
    """Data-driven menu machine: navigate to Tuning > Set frequency,
    type a value, enter -> TUNE command lands in the app_control queue
    (reference menu_core.c + app_command_queue.c shape)."""
    from dsdneo_tpu.app_control.commands import AppCommand, CommandQueue
    from dsdneo_tpu.ui.menu import (KEY_DOWN, KEY_ENTER, KEY_ESC,
                                    MenuState)
    q = CommandQueue()
    m = MenuState(queue=q)
    assert not m.handle_key(KEY_DOWN)       # closed menu ignores keys
    m.toggle()
    assert m.open and m.render_rows()
    m.handle_key(KEY_ENTER)                 # enter Tuning
    m.handle_key(KEY_ENTER)                 # Set frequency -> input mode
    for c in "851.0125":
        m.handle_key(ord(c))
    m.handle_key(KEY_ENTER)
    cmds = q.drain()
    assert len(cmds) == 1
    assert cmds[0].cmd == AppCommand.TUNE
    assert abs(cmds[0].payload - 851.0125e6) < 1
    assert not m.open                       # menu closes after dispatch

    # toggle action with fixed payload
    m.toggle()
    m.handle_key(KEY_DOWN); m.handle_key(KEY_DOWN)   # Audio
    m.handle_key(KEY_ENTER)
    m.handle_key(KEY_ENTER)                 # Toggle mute
    assert q.drain()[0].cmd == AppCommand.TOGGLE_MUTE

    # bad input is rejected without enqueueing
    m.toggle()
    m.handle_key(KEY_ENTER)                 # Tuning
    m.handle_key(KEY_ENTER)                 # Set frequency
    for c in "not-a-number":
        m.handle_key(ord(c))
    m.handle_key(KEY_ENTER)
    assert not q.drain()
    assert "bad value" in m.status
    assert m.open                           # menu stays open on bad input

    # ESC walks back out (currently inside Tuning)
    m.handle_key(KEY_ESC)
    assert m.open
    m.handle_key(KEY_ESC)
    assert not m.open


def test_menu_mode_submenu_lists_all_modes():
    from dsdneo_tpu.app_control.commands import AppCommand, CommandQueue
    from dsdneo_tpu.ui.menu import KEY_DOWN, KEY_ENTER, MenuState
    q = CommandQueue()
    m = MenuState(queue=q)
    m.toggle()
    m.handle_key(KEY_DOWN)                  # Decode
    m.handle_key(KEY_ENTER)
    m.handle_key(KEY_ENTER)                 # Mode submenu
    rows = m.render_rows()
    assert any("p25p1" in r for r in rows)
    assert any("m17" in r for r in rows)
    m.handle_key(KEY_DOWN)                  # p25p1
    m.handle_key(KEY_ENTER)
    c = q.drain()[0]
    assert c.cmd == AppCommand.SET_MODE and c.payload == "p25p1"


def test_live_engine_drains_all_menu_commands():
    """Every AppCommand the menu can send has a real engine effect."""
    from dsdneo_tpu.app_control.commands import AppCommand
    from dsdneo_tpu.core.talkgroup import TalkgroupPolicy
    from dsdneo_tpu.engine.live import LiveEngine
    eng = LiveEngine("dmr")
    eng.decoder.ctx.state.tg_policy = TalkgroupPolicy()
    eng.on_ppm = lambda p: setattr(eng, "_ppm_seen", p)
    q = eng.commands
    q.put(AppCommand.SET_SQUELCH, -50.0)
    q.put(AppCommand.GAIN_DELTA, +1)
    q.put(AppCommand.TG_HOLD, (0, 123))
    q.put(AppCommand.SET_PPM, 7)
    eng._drain_commands()
    assert eng.squelch_db == -50.0
    assert eng.gain_db == 3.0
    assert eng.decoder.ctx.state.audio_gain_db == 3.0
    assert eng._ppm_seen == 7
    pol = eng.decoder.ctx.state.tg_policy
    assert not pol.allows(999, slot=0)      # hold mutes other TGs
    assert pol.allows(123, slot=0)
    q.put(AppCommand.TG_RELEASE, 0)
    eng._drain_commands()
    assert pol.allows(999, slot=0)
    q.put(AppCommand.STOP)
    eng._drain_commands()
    assert eng._stop
