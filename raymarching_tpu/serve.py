"""Minimal render server: HTTP endpoint over the fast render path.

Serving story for production deployment (no reference equivalent — the
reference is a one-shot binary).  Stdlib-only (http.server), one worker
per process; the jit cache makes repeated renders of the same
(resolution, scene-structure) combination hot after the first request.

    python -m raymarching_tpu.serve [--port 8000] [--backend auto]

API:
  GET  /healthz                  -> {"status": "ok", "backend": ...}
  POST /render                   -> PNG bytes
       body: the scene text (objects.txt grammar)
       query params: width, height, ssaa, iterations, gamma,
                     shadows=0|1, format=png|ppm
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

# Resource guards: one request may not demand an arbitrarily large compile
# or working set (each novel resolution tuple triggers a fresh jit compile,
# and the frame buffer is rays x state).  Out-of-range asks get a 422;
# oversized scene bodies a 413.
MAX_WIDTH = 4096
MAX_HEIGHT = 4096
MAX_SSAA = 4
MAX_ITERATIONS = 10_000
MAX_BODY_BYTES = 1 << 20          # 1 MiB of scene text (~25k lines)
DEFAULT_RAY_CHUNK = 65536


def _make_handler(backend: str):
    from .api import render_tables_jit, resolve_backend
    from .config import RenderConfig
    from .io.image import to_uint8
    from .io.png import encode_png
    from .scene.compile import compile_scene
    from .scene.parser import parse_scene

    resolved = resolve_backend(backend)

    class Handler(BaseHTTPRequestHandler):
        server_version = "raymarching_tpu"

        def log_message(self, fmt, *args):
            print("[serve]", fmt % args, file=sys.stderr)

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urllib.parse.urlparse(self.path).path == "/healthz":
                self._json(200, {"status": "ok", "backend": resolved})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            url = urllib.parse.urlparse(self.path)
            if url.path != "/render":
                self._json(404, {"error": "unknown path"})
                return
            q = dict(urllib.parse.parse_qsl(url.query))
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > MAX_BODY_BYTES:
                    self._json(413, {"error": "scene body too large "
                                              f"(max {MAX_BODY_BYTES} B)"})
                    return
                text = self.rfile.read(length).decode()
                limits = [("width", int(q.get("width", 512)), 1, MAX_WIDTH),
                          ("height", int(q.get("height", 384)), 1,
                           MAX_HEIGHT),
                          ("ssaa", int(q.get("ssaa", 1)), 1, MAX_SSAA),
                          ("iterations", int(q.get("iterations", 1000)), 1,
                           MAX_ITERATIONS)]
                for name, val, lo, hi in limits:
                    if not lo <= val <= hi:
                        self._json(422, {"error": f"{name}={val} out of "
                                                  f"range [{lo}, {hi}]"})
                        return
                scene = parse_scene(text)
                plan, tables = compile_scene(scene)
                cfg = RenderConfig(
                    width=limits[0][1], height=limits[1][1],
                    ssaa=limits[2][1], iterations=limits[3][1],
                    gamma=float(q.get("gamma", 1.0)),
                    shadows=q.get("shadows", "1") != "0",
                    normal_mode="fd", ray_chunk=DEFAULT_RAY_CHUNK)
                img = np.asarray(render_tables_jit(plan, tables, cfg,
                                                   resolved))
                data = to_uint8(img, cfg.gamma)
            except ValueError as e:
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — report, don't crash
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return

            if q.get("format", "png") == "ppm":
                h, w, _ = data.shape
                body = b"P6\n%d %d\n255\n" % (w, h) + data[..., :3].tobytes()
                ctype = "image/x-portable-pixmap"
            else:
                body = encode_png(data)
                ctype = "image/png"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="raymarching_tpu.serve")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args(argv)

    server = ThreadingHTTPServer((args.host, args.port),
                                 _make_handler(args.backend))
    print(f"raymarching_tpu serving on http://{args.host}:{args.port} "
          f"(backend={args.backend})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
