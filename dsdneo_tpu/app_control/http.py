"""HTTP remote frontend over app_control (reference Qt/QML frontend
equivalent).

The reference ships a Qt Quick/QML frontend whose view-models poll
app_control snapshots and enqueue commands (src/ui/qt/,
docs/code_map.md:240-252).  The TPU rebuild has no Android/Qt surface;
the idiomatic remote frontend here is an HTTP endpoint speaking the
same two primitives — poll `MetricsHub.snapshot()`, enqueue into
`CommandQueue` — so any browser or scripting client can be the UI:

  GET  /            minimal self-refreshing HTML status view
  GET  /snapshot    FrontendMetrics as JSON (generation, freq, SNR,
                    ring fill/drops, decode health, eye/spectrum)
  GET  /events?n=K  last K decode event lines
  POST /command     {"cmd": "tune", "payload": 851000000.0} → queue

Runs on a daemon thread; bind is loopback-only by default (the
reference's UDP control server makes the same choice, udp_control.cpp).
"""

from __future__ import annotations

import json
import threading
from dataclasses import asdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from dsdneo_tpu.app_control.commands import AppCommand, CommandQueue
from dsdneo_tpu.app_control.snapshot import MetricsHub

_PAGE = """<!doctype html><html><head><title>dsd-neo-tpu</title>
<style>body{font-family:monospace;background:#111;color:#ddd;margin:2em}
td{padding:0 .8em 0 0}h1{font-size:1.1em}#ev{white-space:pre;color:#9c9}
</style></head><body><h1>dsd-neo-tpu live</h1>
<table id="t"></table><div id="ev"></div>
<script>
async function tick(){
 try{
  const s=await (await fetch('/snapshot')).json();
  const rows=[['generation',s.generation],['freq_hz',s.freq_hz],
   ['snr_db',(s.snr_db??0).toFixed(1)],['cfo_hz',(s.cfo_hz??0).toFixed(0)],
   ['blocks',s.blocks],['retunes',s.retunes],
   ['ring fill/drops',s.ring_fill+' / '+s.ring_drops],
   ['fec ok/err',(s.health.p25p1_fec_ok+s.health.dmr_fec_ok+s.health.generic_crc_ok)
     +' / '+(s.health.p25p1_fec_err+s.health.dmr_fec_err+s.health.generic_crc_err)]];
  document.getElementById('t').innerHTML=
   rows.map(r=>'<tr><td>'+r[0]+'</td><td>'+r[1]+'</td></tr>').join('');
  const e=await (await fetch('/events?n=20')).json();
  document.getElementById('ev').textContent=e.events.join('\\n');
 }catch(err){}
 setTimeout(tick,1000);}
tick();
</script></body></html>"""


class HttpFrontend:
    """Serve snapshots/events and accept commands for one engine."""

    def __init__(self, hub: MetricsHub, commands: CommandQueue,
                 events=None, host: str = "127.0.0.1", port: int = 0):
        self.hub = hub
        self.commands = commands
        self._events = events if events is not None else []
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):        # quiet server
                pass

            def _reply(self, code: int, body: bytes,
                       ctype: str = "application/json") -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    self._reply(200, _PAGE.encode(), "text/html")
                elif u.path == "/snapshot":
                    self._reply(200, outer.snapshot_json().encode())
                elif u.path == "/events":
                    q = parse_qs(u.query)
                    n = int(q.get("n", ["50"])[0])
                    with outer._lock:
                        ev = list(outer._events)[-n:]
                    self._reply(200, json.dumps({"events": ev}).encode())
                else:
                    self._reply(404, b'{"error": "not found"}')

            def do_POST(self):
                if urlparse(self.path).path != "/command":
                    self._reply(404, b'{"error": "not found"}')
                    return
                n = int(self.headers.get("Content-Length", "0") or 0)
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                    cmd = AppCommand(req["cmd"])
                except (ValueError, KeyError):
                    self._reply(400, b'{"error": "bad command"}')
                    return
                ok = outer.commands.put(cmd, req.get("payload"))
                self._reply(200 if ok else 503,
                            json.dumps({"queued": ok}).encode())

        self._srv = ThreadingHTTPServer((host, port), Handler)
        self._srv.daemon_threads = True
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)

    def snapshot_json(self) -> str:
        s = self.hub.snapshot()
        d = asdict(s)
        for k, v in list(d.items()):
            if isinstance(v, np.ndarray):
                d[k] = np.asarray(v, dtype=np.float64).round(2).tolist()
        return json.dumps(d)

    def push_event(self, line: str, keep: int = 500) -> None:
        """Engine side: append a decode event line to the ring."""
        with self._lock:
            self._events.append(line)
            if len(self._events) > keep:
                del self._events[:len(self._events) - keep]

    def start(self) -> "HttpFrontend":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
