"""HTTP remote frontend (app_control/http.py): snapshot/events/command
endpoints — the reference Qt/QML frontend's polling contract over HTTP."""

import json
import urllib.error
import urllib.request

import numpy as np


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
