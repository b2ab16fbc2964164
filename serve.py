#!/usr/bin/env python
"""Interactive viewer server: orbit camera -> rendered frames over HTTP.

TPU-native replacement for the reference's OpenGL viewer
(``cuda/render_to_screen.cpp`` — freeglut + CUDA-GL interop orbit camera):
a headless HTTP server that renders requested camera poses on the TPU and
streams JPEG frames. Drive it from a browser:

    GET /                     — minimal orbit UI (drag to rotate)
    GET /frame?theta=..&phi=..&radius=..&size=..  — one rendered JPEG

Usage:
    python serve.py --cfg_file configs/nerf/lego.yaml \
        test_dataset.data_root ... [--port 8765] [--size 200]
"""
from __future__ import annotations

import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html><html><body style="margin:0;background:#222">
<img id=v style="display:block;margin:auto;image-rendering:pixelated;width:600px">
<script>
let th=0.5, ph=0.3, busy=false;
async function update(){
  if (busy) return; busy=true;
  const r = await fetch(`/frame?theta=${th}&phi=${ph}`);
  document.getElementById('v').src = URL.createObjectURL(await r.blob());
  busy=false;
}
let drag=null;
window.onmousedown=e=>drag=[e.clientX,e.clientY];
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{ if(!drag) return;
  th += (e.clientX-drag[0])*0.01; ph += (e.clientY-drag[1])*0.01;
  ph = Math.max(-1.4, Math.min(1.4, ph)); drag=[e.clientX,e.clientY]; update(); };
update();
</script></body></html>"""


def look_at_pose(theta: float, phi: float, radius: float) -> np.ndarray:
    """Orbit camera around the origin (NeRF convention: view along -Z)."""
    pos = radius * np.array([
        np.cos(phi) * np.sin(theta), np.cos(phi) * np.cos(theta), np.sin(phi)
    ])
    z = pos / np.linalg.norm(pos)
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(up, z)
    x /= max(np.linalg.norm(x), 1e-8)
    y = np.cross(z, x)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = x, y, z, pos
    return pose


class RenderService:
    """Holds params + renders poses; one render at a time (single chip)."""

    def __init__(self, cfg, size: int = 200):
        import jax
        import jax.numpy as jnp

        from nerf_tpu.render import occupancy as occ
        from nerf_tpu.render.renderer import RenderOptions, render_image
        from nerf_tpu.train.loop import make_density_fn
        from run import _load_eval_params

        self.size = size
        self.opts = RenderOptions.from_cfg(cfg)
        self.params = _load_eval_params(cfg, self.opts)
        self.grid = None
        if self.opts.enable_ess:
            self.grid = occ.populate_from_density(
                occ.init_grid(jax.random.PRNGKey(1)),
                make_density_fn(self.params["coarse"], self.opts))
        f = 1.39 * size
        self.K = jnp.asarray(
            [[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]], jnp.float32)
        self._render_image = render_image
        self._jnp = jnp
        self._jax = jax
        self._lock = threading.Lock()

    def render_jpeg(self, theta: float, phi: float, radius: float) -> bytes:
        import cv2

        pose = self._jnp.asarray(look_at_pose(theta, phi, radius))
        with self._lock:
            out = self._render_image(
                self.params, pose, self.K, self._jax.random.PRNGKey(0),
                self.size, self.size, self.opts, grid=self.grid)
            rgb = np.asarray(out.get("rgb_map", out["rgb_map_0"]))
        img = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", img[..., ::-1],
                               [cv2.IMWRITE_JPEG_QUALITY, 90])
        return buf.tobytes()


def make_handler(service: RenderService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if url.path == "/frame":
                q = parse_qs(url.query)

                def get(name, default):
                    return float(q.get(name, [default])[0])

                try:
                    body = service.render_jpeg(
                        get("theta", 0.5), get("phi", 0.3), get("radius", 4.0))
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                except Exception as e:
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(404)
            self.end_headers()

    return Handler


def main(argv=None):
    from nerf_tpu.config import parse_args

    argv = list(sys.argv[1:] if argv is None else argv)
    port = 8765
    size = 200
    if "--port" in argv:
        i = argv.index("--port")
        port = int(argv[i + 1])
        del argv[i : i + 2]
    if "--size" in argv:
        i = argv.index("--size")
        size = int(argv[i + 1])
        del argv[i : i + 2]
    cfg, _ = parse_args(argv)
    service = RenderService(cfg, size=size)
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
    print(f"serving on http://0.0.0.0:{port}/ (size {size})")
    server.serve_forever()


if __name__ == "__main__":
    main()
