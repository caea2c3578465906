#!/usr/bin/env python3
"""Aggregate the round-4 512px arm ladder into one evidence JSON.

Reads, for each arm run by tools/round4/queue_arms.sh / queue2_followups.sh:
  - checkpoints/r4/e2e_<arm>/metrics.jsonl  (per-epoch val curve)
  - /tmp/r4/arm_<arm>.json                  (held-out render parity)
and emits {arm: {final_val, best_val, render, delta_vs_base}} sorted by
held-out PSNR. The published copy lives at docs/quality/r4_arms_512px.json.
"""
import argparse
import glob
import json
import os


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
    ap.add_argument("--ckpt", default="checkpoints/r4")
    ap.add_argument("--results", default="/tmp/r4")
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
        rj = os.path.join(ns.results, f"arm_{arm}.json")
        if os.path.isfile(rj):
            with open(rj) as f:
                entry["holdout_render"] = json.load(f)
        if entry:
            report[arm] = entry
    # extra renders that are re-scorings of an existing arm (base_raw = the
    # EMA A/B raw-weights track; base_bf16warp = warp-precision neutrality)
    for rj in sorted(glob.glob(os.path.join(ns.results, "arm_*.json"))):
        arm = os.path.basename(rj)[len("arm_"):-len(".json")]
        if arm not in report:
            with open(rj) as f:
                report[arm] = {"holdout_render": json.load(f)}

    base_psnr = (report.get("base", {}).get("holdout_render", {}) or
                 {}).get("psnr")
    if base_psnr:
        for arm, entry in report.items():
            p = entry.get("holdout_render", {}).get("psnr")
            if p is not None and arm != "base":
                entry["delta_PSNR_vs_base"] = round(p - base_psnr, 3)

    txt = json.dumps(report, indent=1, sort_keys=True)
    print(txt)
    if ns.out:
        with open(ns.out, "w") as f:
            f.write(txt + "\n")


if __name__ == "__main__":
    main()
