"""Env-knob batch 6: rtl_tcp link tuning (DSD_NEO_TCP_*), per-role
real-time scheduling (DSD_NEO_RT_PRIO_<ROLE> / DSD_NEO_CPU_<ROLE>),
and the DMR T3 calculator CSV env input (reference docs/cli.md:562-571,
rt_sched.cpp, oneshot_dmr_t3.c)."""

import os
import time

import numpy as np
import pytest

from dsdneo_tpu.runtime import config as C


def _cfg(**env):
    return C.load_env(environ={f"DSD_NEO_{k}": v for k, v in env.items()})


def test_reference_names_resolve():
    cfg = _cfg(TCP_PREBUF_MS="250", TCP_RCVBUF="1048576", TCP_BUFSZ="8192",
               TCP_RCVTIMEO="500", TCP_WAITALL="1", TCP_STATS="1",
               TCP_AUTOTUNE="1", TCP_MAX_TIMEOUTS="4")
    assert cfg.tcp_prebuf_ms == 250
    assert cfg.tcp_rcvbuf == 1 << 20
    assert cfg.tcp_bufsz == 8192
    assert cfg.tcp_rcvtimeo_ms == 500
    assert cfg.tcp_waitall and cfg.tcp_stats and cfg.tcp_autotune
    assert cfg.tcp_max_timeouts == 4
    # prebuffer is clamped to the reference's 5-1000 ms range
    assert _cfg(TCP_PREBUF_MS="9000").tcp_prebuf_ms == 1000
    assert _cfg(TCP_PREBUF_MS="1").tcp_prebuf_ms == 5


def _client(srv, **cfg_kw):
    from dsdneo_tpu.io.rtl_tcp import RtlTcpClient
    from dsdneo_tpu.runtime.native import IngestRing
    ring = IngestRing(1 << 20)
    cli = RtlTcpClient("127.0.0.1", srv.port, ring, sample_rate=48000)
    return cli, ring


def test_tcp_knobs_configure_client():
    """BUFSZ sets the read size, WAITALL full reads, RCVTIMEO the
    socket timeout, RCVBUF the OS buffer request."""
    from dsdneo_tpu.io.rtl_tcp import FakeRtlTcpServer
    srv = FakeRtlTcpServer(b"")
    old = C._config
    try:
        C._config = C.RuntimeConfig(tcp_bufsz=8192, tcp_waitall=True,
                                    tcp_rcvtimeo_ms=500,
                                    tcp_rcvbuf=1 << 20)
        cli, ring = _client(srv)
        assert cli.chunk == 8192
        assert cli.waitall is True
        assert abs(cli._sock.gettimeout() - 0.5) < 1e-9
        cli.close()
        ring.close()
    finally:
        C._config = old
        srv.close()


def test_tcp_prebuffer_defers_ring_writes():
    """TCP_PREBUF_MS: the reader accumulates the prebuffer before the
    first ring write; a payload smaller than it never reaches the
    ring, a satisfied prebuffer arrives as one contiguous write."""
    from dsdneo_tpu.io.rtl_tcp import FakeRtlTcpServer
    payload = bytes(20_000)
    old = C._config
    try:
        # 500 ms at 48k CU8 = 48000 bytes > payload: held back
        C._config = C.RuntimeConfig(tcp_prebuf_ms=500, tcp_rcvtimeo_ms=100)
        srv = FakeRtlTcpServer(payload)
        cli, ring = _client(srv)
        cli.start()
        time.sleep(0.8)
        assert ring.fill == 0
        assert cli.bytes_received >= len(payload)
        cli.close()
        ring.close()
        srv.close()
        # 100 ms = 9600 bytes < payload: delivered after the threshold
        C._config = C.RuntimeConfig(tcp_prebuf_ms=100, tcp_rcvtimeo_ms=100)
        srv = FakeRtlTcpServer(payload)
        cli, ring = _client(srv)
        cli.start()
        deadline = time.time() + 3
        while time.time() < deadline and ring.fill < len(payload):
            time.sleep(0.05)
        assert ring.fill >= 9600
        cli.close()
        ring.close()
        srv.close()
    finally:
        C._config = old


def test_tcp_max_timeouts_gives_up():
    """TCP_MAX_TIMEOUTS: consecutive receive timeouts end the reader
    thread instead of spinning forever."""
    from dsdneo_tpu.io.rtl_tcp import FakeRtlTcpServer
    old = C._config
    try:
        C._config = C.RuntimeConfig(tcp_rcvtimeo_ms=50, tcp_max_timeouts=3,
                                    tcp_prebuf_ms=5)
        srv = FakeRtlTcpServer(b"")      # header, then silence
        cli, ring = _client(srv)
        cli.start()
        cli._thread.join(timeout=5)
        assert not cli._thread.is_alive()
        assert cli.timeouts >= 3
        cli.close()
        ring.close()
        srv.close()
    finally:
        C._config = old


def test_tcp_autotune_grows_read_size():
    """TCP_AUTOTUNE: saturated reads double the user-space read size."""
    from dsdneo_tpu.io.rtl_tcp import FakeRtlTcpServer
    old = C._config
    try:
        C._config = C.RuntimeConfig(tcp_autotune=True, tcp_bufsz=4096,
                                    tcp_prebuf_ms=5, tcp_rcvtimeo_ms=200)
        srv = FakeRtlTcpServer(bytes(1 << 20))
        cli, ring = _client(srv)
        assert cli.chunk == 4096
        cli.start()
        deadline = time.time() + 3
        while time.time() < deadline and cli.chunk <= 4096:
            time.sleep(0.05)
        assert cli.chunk > 4096
        cli.close()
        ring.close()
        srv.close()
    finally:
        C._config = old


# ------------------------------------------------------------ per-role RT

def test_rt_role_priority_and_affinity_selection():
    """DSD_NEO_RT_PRIO_<ROLE> / DSD_NEO_CPU_<ROLE> override the
    process-wide knobs for that role only."""
    from dsdneo_tpu.runtime.rt_sched import apply_rt_policy
    saved = os.sched_getaffinity(0)
    try:
        env = {"DSD_NEO_CPU_AFFINITY": "", "DSD_NEO_CPU_DEMOD": "0"}
        rep = apply_rt_policy(environ=env, role="demod")
        assert rep["affinity_requested"] == {0}
        # the dongle role falls back to the (empty) process-wide list
        rep2 = apply_rt_policy(environ=env, role="dongle")
        assert rep2["affinity_requested"] == set()
    finally:
        os.sched_setaffinity(0, saved)


def test_rt_role_prio_fallback():
    """RT_PRIO_<ROLE> beats RT_PRIO; missing role name falls back."""
    from dsdneo_tpu.runtime.rt_sched import apply_rt_policy
    env = {"DSD_NEO_RT_SCHED": "1", "DSD_NEO_RT_PRIO": "7",
           "DSD_NEO_RT_PRIO_USB": "22"}
    rep = apply_rt_policy(environ=env, role="usb")
    assert rep["rt_requested"]          # applied or gracefully denied
    rep2 = apply_rt_policy(environ=env, role="demod")
    assert rep2["rt_requested"]


# ------------------------------------------------------- T3 CSV env input

def test_t3_calc_csv_env_runs_calculator(tmp_path, capsys, monkeypatch):
    """DSD_NEO_DMR_T3_CALC_CSV drives --calc-lcn without the flag."""
    from dsdneo_tpu import cli
    p = tmp_path / "freqs.csv"
    p.write_text("451.0000\n451.0125\n451.0250\n")
    monkeypatch.setenv("DSD_NEO_DMR_T3_CALC_CSV", str(p))
    rc = cli.main([])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.splitlines()[0] == "lcn,freq"
    assert any("451012500" in ln for ln in out.splitlines())
