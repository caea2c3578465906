"""serve.py round trip: export a tiny artifact, serve it over HTTP in-process,
render via POST, and compare the decoded PNG against a direct call."""

import base64
import dataclasses
import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.mark.slow
def test_serve_roundtrip(tiny_opt, tmp_path):
    import cv2
    from tools.export_serving import build_exported, save_artifact
    import serve as srv

    opt = dataclasses.replace(tiny_opt, name="srv",
                              checkpoints_dir=str(tmp_path))
    exported, joints, _ = build_exported(opt, batch=2, bake_weights=True)
    model_path = str(tmp_path / "m.jaxexport")
    # production layout: small program + weight sidecar
    save_artifact(opt, 2, model_path, bake_weights=False)

    httpd = srv.serve(model_path, port=0)    # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["batch"] == 2

        # single-frame request (exercises padding + slicing)
        req = json.dumps({"joints": np.asarray(joints)[:1].tolist()}).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/render", data=req,
                headers={"Content-Type": "application/json"}),
                timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["frames"]) == 1
        png = base64.b64decode(out["frames"][0])
        img = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
        served = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) \
            / 127.5 - 1.0
        direct = np.asarray(exported.call(np.asarray(joints)))[0]
        assert served.shape == direct.shape
        np.testing.assert_allclose(served, np.clip(direct, -1, 1),
                                   atol=1.5 / 127.5)

        # malformed request -> clean 400
        bad = json.dumps({"joints": [[1, 2]]}).encode()
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/render", data=bad,
                headers={"Content-Type": "application/json"}), timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
