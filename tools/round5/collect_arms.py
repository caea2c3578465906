#!/usr/bin/env python3
"""Aggregate the round-5 512px arm ladder into one evidence JSON.

Reads, for each arm run by tools/round5/queue.sh:
  - checkpoints/r5/e2e_<arm>/metrics.jsonl  (per-epoch val curve)
  - /tmp/r5run/arm_e2e_<arm>.json           (held-out render parity)
and emits {arm: {final_val, best_val, render, delta_vs_r4_base}} plus the
round-4 base comparator (the arms share corpus, sizing, seed and the
6+100-epoch schedule with the r4 ladder, docs/quality/r4_arms_512px.json —
flag/flagext/flagext2 run the longer 120/160/220 flagship schedule and are
labeled so). Publish at docs/quality/r5_arms_512px.json.
"""
import argparse
import glob
import json
import os

SCHEDULES = {"flag": "flagship 6+120", "flagext": "flagship ->160",
             "flagext2": "flagship ->220", "cuvrext": "cuvr ->220"}


def val_curve(run_dir):
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.isfile(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if "val_PSNR" in rec:
                out.append((rec.get("epoch"), rec["val_PSNR"],
                            rec.get("val_SSIM")))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/r5")
    ap.add_argument("--results", default="/tmp/r5run")
    ap.add_argument("--r4", default="docs/quality/r4_arms_512px.json")
    ap.add_argument("--out", default="")
    ns = ap.parse_args()

    report = {}
    for d in sorted(glob.glob(os.path.join(ns.ckpt, "e2e_*"))):
        arm = os.path.basename(d)[len("e2e_"):]
        curve = val_curve(d)
        entry = {}
        if curve:
            entry["final_val_PSNR"], entry["final_val_SSIM"] = \
                curve[-1][1], curve[-1][2]
            best = max(curve, key=lambda c: c[1])
            entry["best_val_PSNR"], entry["best_val_epoch"] = best[1], best[0]
            entry["epochs_run"] = len(curve)
        if arm in SCHEDULES:
            entry["schedule"] = SCHEDULES[arm]
        rj = os.path.join(ns.results, f"arm_e2e_{arm}.json")
        if os.path.isfile(rj):
            with open(rj) as f:
                entry["holdout_render"] = json.load(f)
        if entry:
            report[arm] = entry

    base_psnr = None
    if os.path.isfile(ns.r4):
        with open(ns.r4) as f:
            r4 = json.load(f)
        base = (r4.get("base", {}).get("holdout_render", {}) or {})
        base_psnr = base.get("psnr")
        if base_psnr is not None:
            report["_r4_base_comparator"] = {
                "holdout_render": base,
                "note": "round-4 base arm (same corpus/sizing/seed; "
                        "6+100-epoch schedule)"}
    if base_psnr:
        for arm, entry in report.items():
            p = entry.get("holdout_render", {}).get("psnr")
            if p is not None and not arm.startswith("_"):
                entry["delta_PSNR_vs_r4_base"] = round(p - base_psnr, 3)

    txt = json.dumps(report, indent=1, sort_keys=True)
    print(txt)
    if ns.out:
        with open(ns.out, "w") as f:
            f.write(txt + "\n")


if __name__ == "__main__":
    main()
