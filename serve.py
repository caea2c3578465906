#!/usr/bin/env python3
"""HTTP frame-rendering server over an exported StableHLO artifact.

Completes the serving path (VERDICT r1 next-round #10): the artifact written
by tools/export_serving.py (the whole jitted keypoints -> frame pipeline with
weights baked in) is deserialized once and served over plain HTTP — stdlib
only, no model code needed at serve time beyond jax itself.

    python tools/export_serving.py --out model.jaxexport --batch 4 <flags>
    python serve.py --model model.jaxexport --port 8765

API:
  GET  /healthz          -> {"status": "ok", "batch": B, "joints": [B,18,3],
                             "frame": [B,S,S,3]}
  POST /render           body {"joints": [[[x, y, conf] * 18] * N]}, N <= B
                         -> {"frames": ["<base64 PNG>", ...]} (N entries)

The compiled program has a fixed batch B; short requests are padded and the
padding sliced off the response. Requests are serialized through one device
queue (a lock) — throughput scaling is by process/chip count, matching the
data-parallel serving mesh in infer/test_driver.py.
"""

import argparse
import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _Model:
    """Deserialized artifact + (optionally) its weight sidecar.

    With a `<model>.params` sidecar (export_serving.py default), the
    weights are loaded once, device_put once, and passed by reference on
    every call — the artifact itself stays small. Without a sidecar the
    artifact is self-contained (--bake_weights)."""

    def __init__(self, path: str):
        import os

        import numpy as np
        from jax import export as jexport
        with open(path, "rb") as f:
            self.exported = jexport.deserialize(bytearray(f.read()))
        self.params = None
        sidecar = path + ".params"
        if os.path.isfile(sidecar):
            import jax
            import flax.serialization as fser
            with open(sidecar, "rb") as f:
                restored = fser.msgpack_restore(f.read())
            self.params = jax.device_put(restored)   # resident once
            print(f"[serve] weights sidecar loaded: {sidecar}", flush=True)
        # joints input is the last positional argument
        self.in_shape = tuple(self.exported.in_avals[-1].shape)  # (B, 18, 3)
        self.batch = self.in_shape[0]
        self.out_shape = tuple(self.exported.out_avals[0].shape)
        self.lock = threading.Lock()
        self.np = np

    def render(self, joints):
        """(N,18,3) ndarray, N <= batch -> (N,S,S,3).

        uint8 [0,255] for export_serving's default on-device-quantized
        artifacts, float [-1,1] for --raw_float ones."""
        np = self.np
        n = joints.shape[0]
        if n > self.batch:
            raise ValueError(f"request batch {n} > compiled batch {self.batch}")
        padded = np.zeros(self.in_shape, np.float32)
        padded[:n] = joints
        if n < self.batch:
            padded[n:] = joints[-1]
        with self.lock:
            if self.params is not None:
                out = self.exported.call(self.params, padded)
            else:
                out = self.exported.call(padded)
        return np.asarray(out)[:n]


def _png_b64(frame) -> str:
    import cv2
    import numpy as np
    if frame.dtype == np.uint8:          # quantized on device already
        img = frame
    else:
        img = ((np.clip(frame, -1, 1) + 1) * 127.5).astype(np.uint8)
    ok, buf = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    return base64.b64encode(buf.tobytes()).decode("ascii")


def make_handler(model: _Model):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):   # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "batch": model.batch,
                                 "joints": list(model.in_shape),
                                 "frame": list(model.out_shape)})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/render":
                return self._json(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                joints = model.np.asarray(req["joints"], model.np.float32)
                if joints.ndim != 3 or joints.shape[1:] != (18, 3):
                    raise ValueError(
                        f"joints must be (N,18,3), got {joints.shape}")
                frames = model.render(joints)
                self._json(200, {"frames": [_png_b64(f) for f in frames]})
            except Exception as e:   # surface errors to the client
                self._json(400, {"error": str(e)})

    return Handler


def serve(model_path: str, host: str = "127.0.0.1", port: int = 8765):
    model = _Model(model_path)
    httpd = ThreadingHTTPServer((host, port), make_handler(model))
    print(f"[serve] {model_path}: batch {model.batch}, frame "
          f"{model.out_shape} on http://{host}:{httpd.server_address[1]}",
          flush=True)
    return httpd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help=".jaxexport artifact")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    a = p.parse_args()
    from neural_human_video_rendering_tpu.runtime import setup_jax
    setup_jax()  # compile cache + JAX_PLATFORMS honor before first jax use
    serve(a.model, a.host, a.port).serve_forever()


if __name__ == "__main__":
    main()
