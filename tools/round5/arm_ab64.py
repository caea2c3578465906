#!/usr/bin/env python3
"""Generic 64px two-arm A/B gate: base vs base+<flags> on the same corpus.

Generalizes tools/round5/ms_uv_ab64.py (whose train/score machinery it
imports) so any experimental config lever gets the same cheap measured
gate before — or instead of — a 512px arm. Written for the --limb_coords
closeout (VERDICT r4 next #6: the flag was wired in round 3 and never
measured at any scale after its 64px insurance run died with the round-3
box; "measure or demote — don't carry a third unmeasured knob").

Usage:
  python tools/round5/arm_ab64.py --name limb_coords \
      --arm_flags "--limb_coords" --arm_kw '{"limb_coords": true}' \
      --out docs/quality/limb_coords_64px.json

--arm_flags are appended to both pre_train.py and train.py for the lever
arm; --arm_kw is the matching Options override for the scoring forward
(levers that change input channels, like limb_coords, change param shapes
— the score-side Options must agree with what was trained).
"""

import argparse
import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "ms_uv_ab64", os.path.join(HERE, "ms_uv_ab64.py"))
ab = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ab)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="summary json path")
    p.add_argument("--name", required=True, help="lever arm name")
    p.add_argument("--arm_flags", default="",
                   help="space-separated CLI flags for the lever arm")
    p.add_argument("--arm_kw", default="{}",
                   help="JSON Options overrides for scoring the lever arm")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--tile", type=int, default=32)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--pre_epochs", type=int, default=4)
    p.add_argument("--how_many", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--work", default=None)
    a = p.parse_args()
    a.work = a.work or f"/tmp/r5run/ab64_{a.name}"

    os.makedirs(a.work, exist_ok=True)
    log = os.path.join(a.work, "run.log")
    data = os.path.join(a.work, "data")
    if not os.path.isdir(os.path.join(data, "frames")):
        ab.run([sys.executable, "tools/make_demo_data.py", "--out", data,
                "--size", str(a.size), "--tile", str(a.tile)], log)

    arms = {"base": ([], {}),
            a.name: (a.arm_flags.split(), json.loads(a.arm_kw))}
    summary = {"config": {"size": a.size, "epochs": a.epochs,
                          "pre_epochs": a.pre_epochs, "seed": a.seed,
                          "arm_flags": a.arm_flags, "sizes": ab.SIZES}}
    for arm, (extra, kw) in arms.items():
        ckpt = os.path.join(a.work, f"ckpt_{arm}")
        if not os.path.exists(os.path.join(ckpt, "e2e",
                                           "latest_net_G.msgpack")):
            ab.train_arm(a, data, ckpt, log, extra)
        summary[arm] = ab.score(a, data, ckpt, kw)
        print(f"[{arm}] {json.dumps(summary[arm])}", flush=True)
    summary["delta_PSNR"] = (summary[a.name]["render_PSNR"]
                             - summary["base"]["render_PSNR"])
    summary["delta_uv_L1"] = (summary[a.name]["uv_L1_at_gt_part"]
                              - summary["base"]["uv_L1_at_gt_part"])
    os.makedirs(os.path.dirname(os.path.abspath(a.out)), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"summary -> {a.out}")


if __name__ == "__main__":
    main()
