#!/usr/bin/env python3
"""Fabricate a "source person" keypoint set for the transfer-parity check.

Re-expresses every OpenPose JSON in --src as a different person on a
different canvas by an affine map (x,y) -> scale*(x,y) + shift, keeping
confidences. graph_posenorm.py + test.py --pose_tgt_path must then recover
the inverse transform exactly (docs/QUALITY.md "Cross-person pose
transfer"); round 2 did this fabrication ad hoc in-session — this checks
the recipe in (VERDICT r3 next #5: durable, reproducible evidence).

Default matches the round-2 experiment: scale 1.3, shift (30, 120),
canvas 900x700 (so the expected recovered inverse is scale 1/1.3,
translation -(30,120)/1.3).
"""
import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="dir of OpenPose JSONs")
    ap.add_argument("--out", required=True)
    ap.add_argument("--scale", type=float, default=1.3)
    ap.add_argument("--shift", type=float, nargs=2, default=(30.0, 120.0))
    ns = ap.parse_args()
    os.makedirs(ns.out, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(ns.src)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(ns.src, name)) as f:
            data = json.load(f)
        for person in data.get("people", []):
            for key, val in person.items():
                if not key.endswith("_keypoints_2d") or not val:
                    continue
                out = list(val)
                for i in range(0, len(out) - 2, 3):
                    if out[i] or out[i + 1]:   # keep absent joints at 0
                        out[i] = out[i] * ns.scale + ns.shift[0]
                        out[i + 1] = out[i + 1] * ns.scale + ns.shift[1]
                person[key] = out
        with open(os.path.join(ns.out, name), "w") as f:
            json.dump(data, f)
        n += 1
    print(f"[fabricate_source] {n} JSONs -> {ns.out} "
          f"(scale {ns.scale}, shift {ns.shift})")


if __name__ == "__main__":
    main()
