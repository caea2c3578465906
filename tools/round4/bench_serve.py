#!/usr/bin/env python3
"""HTTP serving throughput ladder (docs/PERFORMANCE.md "HTTP serving").

Starts serve.py on a given .jaxexport artifact, waits for /healthz, then
measures end-to-end frames/sec at each requested concurrency level
(ThreadPool of identical POST /render calls, batch = the artifact's
compiled batch). Serial dispatch inside the server overlaps with
device->host transfer and PNG encode, so concurrency > 1 pipelines
(round-2 ladder: 16.2 -> 27.8 FPS at 4 concurrent).

Writes one JSON: {"artifact", "batch", "ladder": {"1": fps, "4": fps},
"n_requests"} and prints it. The server subprocess is killed by PID.
"""
import argparse
import concurrent.futures as cf
import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--port", type=int, default=8791)
    ap.add_argument("--requests", type=int, default=12,
                    help="timed requests per concurrency level")
    ap.add_argument("--concurrency", default="1,4")
    ap.add_argument("--keypoints", default="/root/reference/keypoints",
                    help="dir of OpenPose JSONs to drive with")
    ap.add_argument("--out", default="")
    ns = ap.parse_args()

    sys.path.insert(0, REPO)
    from neural_human_video_rendering_tpu.data.keypoints import load_pose_dir

    srv = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"), "--model", ns.model,
         "--port", str(ns.port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    base = f"http://127.0.0.1:{ns.port}"
    try:
        health = None
        for _ in range(1200):   # artifact load + device_put can take minutes
            if srv.poll() is not None:
                out = srv.stdout.read()
                raise SystemExit(f"server died during startup:\n{out}")
            try:
                with urllib.request.urlopen(base + "/healthz", timeout=5) as r:
                    health = json.loads(r.read())
                break
            except Exception:
                time.sleep(1)
        if health is None:
            raise SystemExit("server never became healthy")
        batch = health["batch"]
        print(f"[bench_serve] healthy: batch {batch} frame {health['frame']}",
              flush=True)

        _names, joints = load_pose_dir(ns.keypoints)
        joints = joints[:batch].copy()
        # fit the driving pose onto the artifact's canvas: off-canvas joints
        # would zero the warp coverage and overstate FPS via block-skip
        S = health["frame"][1]
        span = max(joints[..., 0].max(), joints[..., 1].max(), 1.0)
        joints[..., :2] *= 0.9 * S / span
        payload = {"joints": [j.tolist() for j in joints]}
        _post(base + "/render", payload)   # warm the compiled call path

        ladder = {}
        for conc in [int(c) for c in ns.concurrency.split(",")]:
            t0 = time.time()
            with cf.ThreadPoolExecutor(max_workers=conc) as ex:
                futs = [ex.submit(_post, base + "/render", payload)
                        for _ in range(ns.requests)]
                for f in futs:
                    resp = f.result()
                    assert "frames" in resp, resp
            dt = time.time() - t0
            ladder[str(conc)] = round(batch * ns.requests / dt, 2)
            print(f"[bench_serve] concurrency {conc}: "
                  f"{ladder[str(conc)]} FPS", flush=True)

        result = {"artifact": os.path.basename(ns.model), "batch": batch,
                  "ladder": ladder, "n_requests": ns.requests}
        print(json.dumps(result))
        if ns.out:
            with open(ns.out, "w") as f:
                json.dump(result, f, indent=1)
    finally:
        srv.kill()
        srv.wait()


if __name__ == "__main__":
    main()
