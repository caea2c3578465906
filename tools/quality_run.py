#!/usr/bin/env python3
"""Quality-trajectory evidence run (VERDICT r1 next-round #3).

End-to-end: fabricate the demo corpus from the 100 reference keypoint JSONs
(data/synthetic_video.py — frames exactly reproducible by the model's own
rendering equation), run stage-1 UV pretrain -> stage-2 GAN training with a
held-out --data_ratio split and per-epoch PSNR/SSIM eval, then drive the
trained checkpoint through test.py (self-reenactment) and score the renders
against ground truth with evaluate.py. Everything goes through the real CLI
entry points — the same path a user of the reference launchers takes.

Outputs:
  {out}/data ...... fabricated corpus        {out}/ckpt ...... checkpoints
  {out}/renders ... test.py frames + gallery
  {out}/quality_run.json ... per-epoch val curve + final parity metrics

Typical (TPU, ~15 min):  python tools/quality_run.py --out /tmp/quality
Smoke (CPU, ~3 min):     python tools/quality_run.py --out /tmp/q --size 64 \
                             --tile 32 --epochs 4 --pre_epochs 2 --small
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SMALL_FLAGS = ["--ngf", "16", "--ngf_global", "16", "--ndf", "16",
               "--n_blocks_translate", "2", "--n_downsample_translate", "2",
               "--n_blocks_global", "2", "--n_downsample_global", "1",
               "--n_blocks_bg", "1", "--n_downsample_bg", "1",
               "--dtype", "float32"]

# reference-launcher sizing (pretrain_start.sh / start.sh)
FULL_FLAGS = ["--ngf", "64", "--n_blocks_translate", "9",
              "--n_downsample_translate", "4",
              "--ngf_global", "48", "--n_blocks_global", "10",
              "--n_downsample_global", "2",
              "--n_blocks_bg", "2", "--n_downsample_bg", "2"]


def run(cmd, log_path):
    print("+", " ".join(cmd), flush=True)
    with open(log_path, "a") as log:
        log.write("\n+ " + " ".join(cmd) + "\n")
        log.flush()
        r = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                           cwd=REPO)
    if r.returncode != 0:
        print(open(log_path).read()[-4000:])
        raise SystemExit(f"FAILED ({r.returncode}): {' '.join(cmd)}")


def read_val_curve(run_dir):
    path = os.path.join(run_dir, "metrics.jsonl")
    curve = []
    if os.path.isfile(path):
        for line in open(path):
            rec = json.loads(line)
            if "val_PSNR" in rec:
                curve.append({"epoch": rec["epoch"],
                              "val_PSNR": rec["val_PSNR"],
                              "val_SSIM": rec["val_SSIM"]})
    return curve


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--tile", type=int, default=64)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--pre_epochs", type=int, default=6)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--small", action="store_true",
                   help="tiny model (CPU smoke) instead of reference sizing")
    p.add_argument("--repeat", type=int, default=1)
    p.add_argument("--extra", default="",
                   help="extra model flags appended to every stage "
                        "(e.g. '--limb_coords' for a 64px lever A/B)")
    a = p.parse_args()

    os.makedirs(a.out, exist_ok=True)
    log = os.path.join(a.out, "run.log")
    data = os.path.join(a.out, "data")
    ckpt = os.path.join(a.out, "ckpt")
    renders = os.path.join(a.out, "renders")
    size_flags = (SMALL_FLAGS if a.small else FULL_FLAGS) + [
        "--loadSize", str(a.size), "--tex_tile", str(a.tile)]
    if a.extra:
        import shlex
        size_flags += shlex.split(a.extra)
    py = sys.executable

    # 1. corpus from the reference demo keypoints
    run([py, "tools/make_demo_data.py", "--out", data, "--size", str(a.size),
         "--tile", str(a.tile), "--repeat", str(a.repeat)], log)

    # 2. stage 1: UV pretrain (pretrainTrans.sh shape: pose+mask+densepose)
    run([py, "pre_train.py", "--name", "uv", "--checkpoints_dir", ckpt,
         "--batchSize", "6", "--pose_path", f"{data}/openpose_json",
         "--mask_path", f"{data}/mask", "--densepose_path", f"{data}/densepose",
         "--no_flip", "--resize_or_crop", "resize",
         "--niter", str(a.pre_epochs), "--no_decay",
         "--save_epoch_freq", "2", "--print_freq", "10"] + size_flags, log)

    # 3. stage 2: end-to-end (pretrain_start.sh shape, all losses)
    run([py, "train.py", "--name", "e2e", "--checkpoints_dir", ckpt,
         "--batchSize", str(a.batch),
         "--pose_path", f"{data}/openpose_json",
         "--mask_path", f"{data}/mask", "--img_path", f"{data}/frames",
         "--densepose_path", f"{data}/densepose",
         "--bg_path", f"{data}/bg.jpg", "--texture_path", f"{data}/texture.png",
         "--flow_path", f"{data}/flow", "--flow_inv_path", f"{data}/flow_inv",
         "--no_flip", "--resize_or_crop", "resize",
         "--load_pretrain_TransG", f"{ckpt}/uv",
         "--which_epoch_TransG", "latest",
         "--lambda_L2", "500", "--lambda_UV", "1000", "--lambda_Prob", "10",
         "--lambda_Temp", "500", "--use_densepose_loss", "--no_vgg_loss",
         "--data_ratio", "0.9", "--niter", str(a.epochs), "--no_decay",
         "--save_epoch_freq", "10", "--print_freq", "20",
         "--display_freq", "100"] + size_flags, log)

    # 4. inference: drive the SAME keypoints through the trained checkpoint
    run([py, "test.py", "--name", "e2e", "--checkpoints_dir", ckpt,
         "--pose_path", f"{data}/openpose_json",
         "--bg_path", f"{data}/bg.jpg", "--texture_path", f"{data}/texture.png",
         "--results_dir", renders, "--which_epoch", "latest",
         "--target_shape", f"{a.size},{a.size}",
         "--phase", "test"] + size_flags, log)

    # 5. parity score: renders vs ground-truth frames
    metrics_path = os.path.join(a.out, "parity.json")
    run([py, "evaluate.py", "--results_dir", f"{renders}/images",
         "--gt_dir", f"{data}/frames", "--loadSize", str(a.size),
         "--no_vgg", "--metric", "temporal", "--out", metrics_path], log)

    curve = read_val_curve(os.path.join(ckpt, "e2e"))
    parity = json.load(open(metrics_path))
    n_total = len(os.listdir(f"{data}/frames"))
    n_train = int(round(n_total * 0.9))
    summary = {
        "config": {"size": a.size, "tile": a.tile, "epochs": a.epochs,
                   "pre_epochs": a.pre_epochs, "batch": a.batch,
                   "model": "small" if a.small else "reference-sizing",
                   "frames": n_total, "train_frames": n_train},
        "val_curve": curve,
        "final_parity_all_frames": parity,
    }
    out_json = os.path.join(a.out, "quality_run.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"val_curve_points": len(curve),
                      "first": curve[0] if curve else None,
                      "last": curve[-1] if curve else None,
                      "parity": parity}, indent=1))
    print(f"summary -> {out_json}")


if __name__ == "__main__":
    main()
