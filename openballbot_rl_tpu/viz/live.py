"""Live policy viewer: browser MJPEG stream + terminal telemetry.

The reference debugs policies through an on-screen MuJoCo GUI viewer
(ballbot_env.py:347-357, visualize_model.py:30-370). A TPU host is headless,
so the interactive equivalent here is an HTTP MJPEG stream: frames rendered
by the analytic raytracer (viz/scene.py) are pushed to `LiveViewer`, and any
browser pointed at http://host:port shows the rollout live while it runs —
no GL, no extra dependencies (stdlib http.server + PIL JPEG encode).

Used by `ballbot-live` (cli/live_view.py); also importable for ad-hoc
streaming from notebooks or training loops (e.g. push an eval frame every
iteration to watch a policy evolve during training).
"""
from __future__ import annotations

import io
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_INDEX_HTML = b"""<!doctype html>
<html><head><title>openballbot-rl-tpu live</title>
<style>body{background:#111;color:#ddd;font-family:monospace;text-align:center}
img{image-rendering:pixelated;width:640px;margin-top:1em;border:1px solid #444}
.keys{color:#888;font-size:0.9em}
</style></head>
<body><h3>openballbot-rl-tpu &mdash; live rollout</h3>
<img src="/stream"><p id="s"></p>
<p class="keys">[space] pause/resume &nbsp; [r] reset episode &nbsp;
[p] perturb &nbsp; [q] quit</p>
<script>setInterval(async()=>{const r=await fetch('/telemetry');
document.getElementById('s').textContent=await r.text();},500);
document.addEventListener('keydown',e=>{
  if([' ','r','p','q'].includes(e.key)){e.preventDefault();
    fetch('/cmd?k='+encodeURIComponent(e.key));}});
</script>
</body></html>"""


class LiveViewer:
    """Threaded MJPEG server. push() frames from the rollout loop; every
    connected browser sees them at the rate they arrive."""

    def __init__(self, host: str = "127.0.0.1", port: int = 8765,
                 quality: int = 85):
        self._lock = threading.Condition()
        self._jpeg: Optional[bytes] = None
        self._seq = 0
        self._telemetry = ""
        self._quality = int(quality)
        self._commands: list = []       # keys from the browser, FIFO
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr spam
                pass

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_INDEX_HTML)
                elif self.path == "/telemetry":
                    body = viewer._telemetry.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain")
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path.startswith("/cmd"):
                    # interactive control channel (reference viewer parity:
                    # pause/reset the env detects mid-episode,
                    # ballbot_env.py:347-357); the rollout loop drains the
                    # queue via poll_commands()
                    from urllib.parse import parse_qs, urlparse

                    q = parse_qs(urlparse(self.path).query)
                    k = (q.get("k") or [""])[0]
                    if k:
                        with viewer._lock:
                            viewer._commands.append(k)
                    self.send_response(204)
                    self.end_headers()
                elif self.path == "/frame.jpg":
                    frame = viewer._latest(timeout=5.0)
                    if frame is None:
                        self.send_response(503)
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(frame)
                elif self.path == "/stream":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=frame")
                    self.end_headers()
                    last_seq = -1
                    try:
                        while True:
                            frame, last_seq = viewer._next(last_seq)
                            if frame is None:
                                return
                            self.wfile.write(b"--frame\r\n"
                                             b"Content-Type: image/jpeg\r\n"
                                             b"\r\n")
                            self.wfile.write(frame)
                            self.wfile.write(b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        return
                else:
                    self.send_response(404)
                    self.end_headers()

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()

    # ---------- producer side ----------
    def push(self, frame: np.ndarray, telemetry: str = "") -> None:
        """frame: (H, W, 3) uint8 (or float in [0,1])."""
        from PIL import Image

        if frame.dtype != np.uint8:
            frame = (np.clip(frame, 0.0, 1.0) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="JPEG",
                                    quality=self._quality)
        with self._lock:
            self._jpeg = buf.getvalue()
            self._seq += 1
            if telemetry:
                self._telemetry = telemetry
            self._lock.notify_all()

    def poll_commands(self) -> list:
        """Drain pending browser key commands (producer side)."""
        with self._lock:
            cmds, self._commands = self._commands, []
        return cmds

    def close(self) -> None:
        with self._lock:
            self._seq = -1          # signal stream handlers to exit
            self._lock.notify_all()
        self._server.shutdown()
        self._server.server_close()

    # ---------- consumer side (handlers) ----------
    def _latest(self, timeout: float = 5.0) -> Optional[bytes]:
        with self._lock:
            if self._jpeg is None:
                self._lock.wait(timeout)
            return self._jpeg

    def _next(self, last_seq: int, timeout: float = 10.0):
        deadline = time.time() + timeout
        with self._lock:
            while self._seq == last_seq or self._jpeg is None:
                if self._seq == -1 or time.time() > deadline:
                    return None, last_seq
                self._lock.wait(min(1.0, deadline - time.time()))
            if self._seq == -1:
                return None, last_seq
            return self._jpeg, self._seq


def ansi_frame(frame: np.ndarray, width: int = 72) -> str:
    """Terminal fallback: downsample a frame to ANSI half-block art (two
    pixels per character cell via the upper-half-block glyph)."""
    if frame.dtype != np.uint8:
        frame = (np.clip(frame, 0.0, 1.0) * 255).astype(np.uint8)
    h, w = frame.shape[:2]
    new_w = width
    new_h = max(2, int(h * (new_w / w) * 0.5) * 2)   # even row count
    ys = (np.linspace(0, h - 1, new_h)).astype(int)
    xs = (np.linspace(0, w - 1, new_w)).astype(int)
    small = frame[ys][:, xs]
    lines = []
    for r in range(0, new_h, 2):
        top, bot = small[r], small[r + 1]
        cells = [f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m"
                 f"\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
                 for t, b in zip(top, bot)]
        lines.append("".join(cells) + "\x1b[0m")
    return "\n".join(lines)
