"""Browser-based interactive editor UI.

The reference editor is a native winit/wgpu/egui app (particle_editor/) — a
TPU host is headless, so the interactive surface here is a small stdlib HTTP
server around the same ``Editor`` core: the browser canvas shows the
velocity-heatmap rendering, the mouse applies the cursor force, and the
controls drive playback/scene actions. Everything the reference's panels do
is reachable: play/pause/speed/seek (bottom panel), lattice/clear/disconnect
(editor panel), live physics parameters (parameters panel), stats.

Run (engine in another terminal):
    python -m particle_simulator_tpu.editor.webview --http 127.0.0.1:8700
    python -m particle_simulator_tpu.engine.daemon --addr 127.0.0.1:53123
then open http://127.0.0.1:8700
"""

from __future__ import annotations

import argparse
import json
import struct
import sys
import threading
import time
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse

import numpy as np

from particle_simulator_tpu.editor.backend import Backend
from particle_simulator_tpu.editor.core import Editor
from particle_simulator_tpu.editor.render import render_frame

_PAGE = """<!DOCTYPE html>
<html><head><title>particle_simulator_tpu</title><style>
body { background: #101018; color: #cfd2e0; font-family: monospace; margin: 0; display: flex; }
#side { width: 300px; padding: 12px; }
#canvas { image-rendering: pixelated; cursor: crosshair; margin: 12px; border: 1px solid #333; }
button { background: #26263a; color: #cfd2e0; border: 1px solid #444; margin: 2px; padding: 4px 10px; cursor: pointer; }
input[type=range] { width: 100%; }
label { display: block; margin-top: 8px; font-size: 12px; }
#stats { white-space: pre; font-size: 11px; margin-top: 12px; color: #8f93a8; }
</style></head><body>
<div id="side">
  <h3>particle simulator (TPU)</h3>
  <div>
    <button onclick="ctl('toggle_play')">play/pause</button>
    <button onclick="ctl('seek_live')">live</button>
    <button onclick="ctl('lattice')">lattice</button>
    <button onclick="ctl('clear')">clear</button>
    <button onclick="ctl('disconnect')">disconnect</button>
  </div>
  <label>play speed (log s/s) <input type="range" id="speed" min="-15" max="0" step="0.1" value="-11.3"
    oninput="ctl('speed', {value: Math.pow(10, this.value)})"></label>
  <label>seek <input type="range" id="seek" min="0" max="1000" value="1000"
    oninput="ctl('seek_frac', {value: this.value / 1000})"></label>
  <label>cursor size <input type="range" id="csize" min="0.01" max="0.5" step="0.01" value="0.05"
    oninput="param('cursor_size', parseFloat(this.value))"></label>
  <label>dt (fs) <input type="range" id="dt" min="1" max="100" step="1" value="50"
    oninput="param('step_dt', this.value * 1e-15)"></label>
  <label>steps/frame <input type="range" id="spf" min="1" max="500" step="1" value="100"
    oninput="param('steps_per_frame', parseInt(this.value))"></label>
  <label>sigma (A) <input type="range" min="1" max="10" step="0.05" value="3.609"
    oninput="param('sigma0', this.value * 1e-10)"></label>
  <label>epsilon (K·kB) <input type="range" min="10" max="500" step="1" value="106"
    oninput="param('epsilon0', this.value * 1.380649e-23)"></label>
  <label>n (repulsive) <input type="range" min="7" max="20" step="0.1" value="14.08"
    oninput="param('n0', parseFloat(this.value))"></label>
  <label>m (attractive) <input type="range" min="3" max="7" step="0.1" value="6"
    oninput="param('m0', parseFloat(this.value))"></label>
  <label>data structure
    <select onchange="param('data_structure', parseInt(this.value))">
      <option value="1" selected>Matrix Buckets</option>
      <option value="0">Compact Array</option>
    </select></label>
  <label>device
    <select onchange="param('device', parseInt(this.value))">
      <option value="0" selected>TPU</option>
      <option value="1">CPU Thread Pool</option>
      <option value="2">CPU Main Thread</option>
    </select></label>
  <div id="stats"></div>
</div>
<canvas id="canvas" width="640" height="640"></canvas>
<script>
const canvas = document.getElementById('canvas');
const ctx = canvas.getContext('2d');
let down = false;
function post(url, body) { fetch(url, {method: 'POST', body: JSON.stringify(body || {})}); }
function ctl(action, extra) { post('/control', Object.assign({action}, extra)); }
function param(name, value) { post('/params', {[name]: value}); }
function cursor(e, isDown) {
  const r = canvas.getBoundingClientRect();
  post('/cursor', {x: (e.clientX - r.left) / r.width, y: 1 - (e.clientY - r.top) / r.height, down: isDown});
}
canvas.onmousedown = e => { down = true; cursor(e, true); };
canvas.onmouseup = e => { down = false; cursor(e, false); };
canvas.onmousemove = e => { if (down) cursor(e, true); };
canvas.onmouseleave = e => { if (down) { down = false; cursor(e, false); } };
const img = new Image();
let ghost = null;
function draw() {
  ctx.drawImage(img, 0, 0, canvas.width, canvas.height);
  if (ghost && ghost.x >= 0) {  // (-1,-1) = no cursor
    ctx.strokeStyle = 'rgba(255,255,255,0.5)';
    ctx.beginPath();
    ctx.arc(ghost.x * canvas.width, (1 - ghost.y) * canvas.height,
            ghost.size / 2 * canvas.width, 0, 2 * Math.PI);
    ctx.stroke();
  }
}
img.onload = draw;
function refresh() { img.src = '/frame.png?' + Date.now(); }
setInterval(refresh, 66);
setInterval(async () => {
  const s = await (await fetch('/stats')).json();
  ghost = s.engine_cursor || null;
  document.getElementById('stats').textContent = JSON.stringify(s, null, 1);
}, 500);
refresh();
</script></body></html>"""


class WebEditor:
    """Editor core + ticking thread + render cache, shared by HTTP handlers."""

    # Loopback by default: the engine-facing port accepts raw, unauthenticated
    # scene frames — binding all interfaces must be an explicit opt-in (--addr).
    def __init__(self, backend_addr=("127.0.0.1", 53123), size: int = 512):
        self.editor = Editor(Backend(addr=backend_addr))
        self.size = size
        self.lock = threading.Lock()
        self._stop = False
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        last = time.monotonic()
        was_connected = False
        while not self._stop:
            now = time.monotonic()
            with self.lock:
                self.editor.tick(now - last)
                # engine (re)connected after a scene was drawn: re-send it so
                # a late-starting engine picks up the current scene
                connected = self.editor.backend.is_connected
                if connected and not was_connected and self.editor.last_scene is not None:
                    self.editor.backend.write(self.editor.last_scene)
                was_connected = connected
            last = now
            time.sleep(0.01)

    def frame_png(self) -> bytes:
        with self.lock:
            got = self.editor.timeline.frame(self.editor.play_time)
            play_time = self.editor.play_time
        if got is None:
            img = np.full((self.size, self.size, 3), 16, np.uint8)
        else:
            frame, exact = got
            img = render_frame(
                frame, self.size, self.size, sim_time=play_time, frame_time=exact
            )
        return _png_bytes(img)

    def control(self, req: dict) -> None:
        e = self.editor
        action = req.get("action")
        with self.lock:
            if action == "toggle_play":
                e.toggle_play()
            elif action == "seek_live":
                e.seek_live()
            elif action == "lattice":
                e.send_lattice(50, 50, distance_factor=1.1)
            elif action == "clear":
                e.clear_scene()
            elif action == "disconnect":
                e.disconnect()
            elif action == "speed":
                e.play_speed = float(req.get("value", e.play_speed))
            elif action == "seek_frac":
                e.seek(float(req.get("value", 1.0)) * e.timeline.sim_len())

    def params(self, req: dict) -> None:
        """Full parameters-panel surface (editor.rs:828-1411): scalars, the
        per-species Mie sliders (``sigma0``..``m1``), and the enum selectors."""
        with self.lock:
            sp = self.editor.sim_params
            for name, value in req.items():
                if name in ("step_dt", "cursor_size", "box_width", "box_height"):
                    sp[name] = float(value)
                elif name in ("steps_per_frame", "data_structure", "device",
                              "gpu_threads_per_block_log2"):
                    sp[name] = int(value)
                elif len(name) > 1 and name[:-1] in ("sigma", "epsilon", "n", "m") \
                        and name[-1] in "01":
                    sp["particles"][int(name[-1])][name[:-1]] = float(value)

    def cursor(self, req: dict) -> None:
        with self.lock:
            self.editor.cursor_move(
                float(req.get("x", -1)), float(req.get("y", -1)), bool(req.get("down"))
            )

    def stats(self) -> dict:
        with self.lock:
            st = self.editor.stats()
            # ghost of the engine's active cursor (editor.rs:423-431): the
            # engine echoes cursor_pos in every outbound frame's metadata
            frame = self.editor.current_frame()
            if frame is not None:
                cx, cy = (float(v) for v in frame.metadata.cursor_pos)
                st["engine_cursor"] = {"x": cx, "y": cy, "size": float(frame.metadata.cursor_size)}
            return st

    def close(self):
        self._stop = True
        self.editor.backend.close()


def _png_bytes(img: np.ndarray) -> bytes:
    h, w, _ = img.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 3))
        + chunk(b"IEND", b"")
    )


def make_server(http_addr, web: WebEditor) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/":
                self._send(200, _PAGE.encode(), "text/html")
            elif path == "/frame.png":
                self._send(200, web.frame_png(), "image/png")
            elif path == "/stats":
                self._send(200, json.dumps(web.stats()).encode(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                req = {}
            path = urlparse(self.path).path
            if path == "/control":
                web.control(req)
            elif path == "/params":
                web.params(req)
            elif path == "/cursor":
                web.cursor(req)
            self._send(200, b"{}", "application/json")

    return ThreadingHTTPServer(http_addr, Handler)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--http", default="127.0.0.1:8700", help="UI listen address")
    ap.add_argument(
        "--addr",
        default="127.0.0.1:53123",
        help="engine TCP listen address (pass 0.0.0.0:PORT to accept remote engines)",
    )
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args(argv)

    h, p = args.http.rsplit(":", 1)
    eh, ep = args.addr.rsplit(":", 1)
    web = WebEditor(backend_addr=(eh, int(ep)), size=args.size)
    server = make_server((h, int(p)), web)
    print(f"editor UI: http://{h}:{p}  (engine port {ep})", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        web.close()
        server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
