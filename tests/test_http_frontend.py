"""HTTP remote frontend (app_control/http.py): snapshot/events/command
endpoints — the reference Qt/QML frontend's polling contract over HTTP."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow      # full-tier only (docs/testing.md)


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=5) as r:
        return r.status, r.read()


def test_http_frontend_endpoints():
    from dsdneo_tpu.app_control import CommandQueue, MetricsHub
    from dsdneo_tpu.app_control.commands import AppCommand
    from dsdneo_tpu.app_control.http import HttpFrontend

    hub = MetricsHub()
    q = CommandQueue()
    f = HttpFrontend(hub, q, port=0).start()
    try:
        hub.publish(freq_hz=851.0125e6, snr_db=17.5, blocks=42,
                    eye_symbols=np.asarray([1.0, -3.0], np.float32))
        f.push_event("Sync: +P25p1 | NAC/CC: 140")
        f.push_event("Group Voice Channel Grant")

        st, body = _get(f.port, "/snapshot")
        assert st == 200
        s = json.loads(body)
        assert s["freq_hz"] == 851.0125e6 and s["snr_db"] == 17.5
        assert s["blocks"] == 42 and s["eye_symbols"] == [1.0, -3.0]
        assert "p25p1_fec_ok" in s["health"]

        st, body = _get(f.port, "/events?n=1")
        assert st == 200
        assert json.loads(body)["events"] == ["Group Voice Channel Grant"]

        st, body = _get(f.port, "/")
        assert st == 200 and b"dsd-neo-tpu" in body

        # POST /command → queue
        req = urllib.request.Request(
            f"http://127.0.0.1:{f.port}/command",
            data=json.dumps({"cmd": "tune",
                             "payload": 852.5e6}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert r.status == 200
            assert json.loads(r.read())["queued"] is True
        items = q.drain()
        assert len(items) == 1
        assert items[0].cmd is AppCommand.TUNE
        assert items[0].payload == 852.5e6

        # bad command → 400, nothing queued
        req = urllib.request.Request(
            f"http://127.0.0.1:{f.port}/command",
            data=b'{"cmd": "warp-core"}', method="POST")
        try:
            urllib.request.urlopen(req, timeout=5)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert len(q.drain()) == 0

        try:
            _get(f.port, "/nope")
            raise AssertionError("expected HTTP 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        f.stop()


def test_http_event_ring_bounded():
    from dsdneo_tpu.app_control import CommandQueue, MetricsHub
    from dsdneo_tpu.app_control.http import HttpFrontend
    f = HttpFrontend(MetricsHub(), CommandQueue(), port=0)
    for i in range(700):
        f.push_event(f"line {i}", keep=500)
    assert len(f._events) == 500 and f._events[-1] == "line 699"


def test_cli_accepts_http_frontend():
    from dsdneo_tpu.cli import build_parser
    a = build_parser().parse_args(["-f1", "--iq-replay", "x",
                                   "--frontend", "http",
                                   "--http-port", "9000"])
    assert a.frontend == "http" and a.http_port == 9000


def test_http_calls_and_grid_endpoints():
    """Dashboard data endpoints: /calls segments pushed DecodeEvents
    into call rows (stream seconds); /grid serves the fleet
    channel-grid provider; / carries the graphical dashboard."""
    from dsdneo_tpu.app_control import CommandQueue, MetricsHub
    from dsdneo_tpu.app_control.http import HttpFrontend
    from dsdneo_tpu.protocol.base import DecodeEvent

    grid = [{"id": 0, "state": "voice", "tg": 101, "freq_hz": 851e6},
            {"id": 1, "state": "cc", "tg": 0, "freq_hz": 852e6}]
    f = HttpFrontend(MetricsHub(), CommandQueue(), port=0,
                     grid_provider=lambda: grid).start()
    try:
        f.push_decode_event(DecodeEvent(
            "Group Voice Channel Grant", "p25p1", pos=4800,
            fields={"grant": 1, "tg": 101, "src": 777, "slot": 0}))
        f.push_decode_event(DecodeEvent(
            "Call End", "p25p1", pos=4800 * 5,
            fields={"release": 1, "slot": 0}))

        st, body = _get(f.port, "/calls")
        assert st == 200
        calls = json.loads(body)["calls"]
        assert len(calls) == 1
        c = calls[0]
        assert c["tg"] == 101 and c["src"] == 777
        assert c["kind"] == "GROUP_VOICE" and c["protocol"] == "p25p1"
        # stream seconds: grant at 4800 sym / 4800 sym/s = 1 s,
        # release 4 s later
        assert abs(c["t_s"] - 1.0) < 0.01
        assert abs(c["dur_s"] - 4.0) < 0.01

        st, body = _get(f.port, "/grid")
        assert st == 200
        assert json.loads(body)["channels"] == grid

        # the event line ring sees structured pushes too
        st, body = _get(f.port, "/events?n=1")
        assert json.loads(body)["events"] == ["Call End"]

        st, body = _get(f.port, "/")
        assert st == 200
        page = body.decode()
        for needle in ("canvas", "/calls", "/grid", "gridbox",
                       "spectrum", "eye"):
            assert needle in page
    finally:
        f.stop()


def test_fleet_http_console_cli():
    """--fleet --frontend http serves grid/events and exits on
    --duration (the Qt/QML-equivalent fleet console path)."""
    import subprocess
    import sys as _sys
    import time as _t

    fx = "/root/reference/tests/fixtures/iq/p25p1_c4fm_cc.iq.json"
    proc = subprocess.Popen(
        [_sys.executable, "-m", "dsdneo_tpu", "--frontend", "http",
         "--http-port", "18766", "--fleet", "p25p1:cc:2",
         "--iq-replay", fx, "--duration", "25", "-o", "null"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        deadline = _t.time() + 70
        grid = events = None
        while _t.time() < deadline:
            _t.sleep(1.0)
            try:
                st, body = _get(18766, "/grid")
                g = json.loads(body)["channels"]
                grid = g if g else grid
                st, body = _get(18766, "/events?n=5")
                e = json.loads(body)["events"]
                events = e if e else events
                if grid and events:
                    break
            except OSError:
                continue        # server not up yet (or already done)
        assert grid is not None and len(grid) == 2
        assert events and any("NAC/CC: 140" in e for e in events)
    finally:
        try:
            out, err = proc.communicate(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, err = proc.communicate()
    assert "http frontend:" in err and "fleet:" in err


def test_stream_http_dashboard_cli():
    """--stream --frontend http publishes snapshots (SNR, spectrum,
    eye) and events while the replay streams."""
    import subprocess
    import sys as _sys
    import time as _t

    fx = "/root/reference/tests/fixtures/iq/p25p1_c4fm_cc.iq.json"
    proc = subprocess.Popen(
        [_sys.executable, "-m", "dsdneo_tpu", "-f1", "--stream", "0.25",
         "--frontend", "http", "--http-port", "18768",
         "--iq-replay-rate", "2", "--iq-loop", "2",
         "--iq-replay", fx, "-o", "null"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        deadline = _t.time() + 40
        snap = None
        while _t.time() < deadline:
            _t.sleep(0.5)
            try:
                st, body = _get(18768, "/snapshot")
                snap = json.loads(body)
                if snap["blocks"] >= 2 and snap["eye_symbols"]:
                    break
            except OSError:
                continue
        assert snap is not None and snap["stream_active"]
        assert snap["symbol_rate_hz"] == 4800
        assert len(snap["spectrum_db"]) > 0
        assert len(snap["eye_symbols"]) > 0
        st, body = _get(18768, "/events?n=3")
        assert json.loads(body)["events"]
    finally:
        try:
            out, err = proc.communicate(timeout=40)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, err = proc.communicate()
    assert "http frontend:" in err


def test_http_calls_mixed_symbol_rates():
    """/calls converts each event with the symbol clock it was pushed
    under (mixed-rate fleet groups)."""
    from dsdneo_tpu.app_control import CommandQueue, MetricsHub
    from dsdneo_tpu.app_control.http import HttpFrontend
    from dsdneo_tpu.protocol.base import DecodeEvent

    f = HttpFrontend(MetricsHub(), CommandQueue(), port=0).start()
    try:
        # nxdn48 clock: 2400 sym/s → pos 2400 = 1 s; slot 1 isolates it
        f.push_decode_event(DecodeEvent(
            "grant", "nxdn48", pos=2400,
            fields={"grant": 1, "tg": 7, "slot": 1}), fs_sym=2400.0)
        # default clock (4800): pos 4800 = 1 s on slot 0
        f.push_decode_event(DecodeEvent(
            "grant", "p25p1", pos=4800,
            fields={"grant": 1, "tg": 9, "slot": 0}))
        st, body = _get(f.port, "/calls")
        calls = {c["tg"]: c for c in json.loads(body)["calls"]}
        assert abs(calls[7]["t_s"] - 1.0) < 0.01
        assert abs(calls[9]["t_s"] - 1.0) < 0.01

        # robustness: bad n → 400, non-dict command body → 400
        import urllib.error
        try:
            _get(f.port, "/events?n=abc")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{f.port}/command",
            data=b'"tune"', method="POST")
        try:
            urllib.request.urlopen(req, timeout=5)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        f.stop()
