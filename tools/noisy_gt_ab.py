#!/usr/bin/env python3
"""Noisy pseudo-GT robustness A/B (VERDICT r2 missing #2 / next-round #2).

The reference's core pitch is that training refines PAST its noisy inputs:
the mask beyond the segmentation output (reference README.md:60), the
background beyond the inpainting estimate (README.md:15-18,52), DensePose
IUV being pseudo-supervision throughout. This harness makes that claim
measurable on the fabricated corpus:

  arm A (clean): train stage-1 + stage-2 on noise-free pseudo-GT;
  arm B (noisy): IDENTICAL frames, but mask / densepose / bg.jpg corrupted
                 at --corrupt strength (data/corruption.py simulates each
                 preprocessing tool's failure modes).

Both arms are scored on the held-out split against the TRUE frames, and the
noisy arm's REFINEMENT is scored against the supervision it trained on:

  * mask IoU:   predicted soft mask vs true silhouette, compared to the
                corrupted supervision's own IoU — refinement beats its GT?
  * bg PSNR:    BGNet's refined background vs the true background, compared
                to the corrupted inpainting estimate it started from;
  * render PSNR/SSIM: noisy-GT training should approach clean-GT quality.

Typical (TPU, ~45 min): python tools/noisy_gt_ab.py --out /tmp/noisyab
Smoke (CPU, ~10 min):   python tools/noisy_gt_ab.py --out /tmp/nab \
                            --small --size 64 --tile 32 --epochs 4 \
                            --pre_epochs 2 --how_many 6
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from neural_human_video_rendering_tpu.runtime import setup_jax  # noqa: E402

setup_jax()  # honor JAX_PLATFORMS before any in-process jax use

SIZES_SMALL = dict(ngf=16, ngf_global=16, ndf=16,
                   n_blocks_translate=2, n_downsample_translate=2,
                   n_blocks_global=2, n_downsample_global=1,
                   n_blocks_bg=1, n_downsample_bg=1, dtype="float32")
# reference-launcher sizing (pretrain_start.sh / start.sh)
SIZES_FULL = dict(ngf=64, n_blocks_translate=9, n_downsample_translate=4,
                  ngf_global=48, n_blocks_global=10, n_downsample_global=2,
                  n_blocks_bg=2, n_downsample_bg=2)


def flags(d):
    out = []
    for k, v in d.items():
        out += [f"--{k}", str(v)]
    return out


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


def train_arm(a, data, ckpt, log, size_kw):
    """Stage-1 UV pretrain + stage-2 e2e on one corpus dir."""
    py = sys.executable
    size_flags = flags(size_kw) + ["--loadSize", str(a.size),
                                   "--tex_tile", str(a.tile)]
    run([py, "pre_train.py", "--name", "uv", "--checkpoints_dir", ckpt,
         "--batchSize", "6", "--pose_path", f"{data}/openpose_json",
         "--mask_path", f"{data}/mask",
         "--densepose_path", f"{data}/densepose",
         "--no_flip", "--resize_or_crop", "resize",
         # same split as stage 2: without it the UV pretrain would see the
         # frames refinement_metrics scores as held-out (the data_ratio
         # default is 1.0 — the leak class quality_profile's assert pins)
         "--data_ratio", "0.9",
         "--niter", str(a.pre_epochs), "--no_decay", "--seed", str(a.seed),
         "--save_epoch_freq", "2", "--print_freq", "20"] + size_flags, log)
    run([py, "train.py", "--name", "e2e", "--checkpoints_dir", ckpt,
         "--batchSize", str(a.batch),
         "--pose_path", f"{data}/openpose_json",
         "--mask_path", f"{data}/mask", "--img_path", f"{data}/frames",
         "--densepose_path", f"{data}/densepose",
         "--bg_path", f"{data}/bg.jpg",
         "--texture_path", f"{data}/texture.png",
         "--flow_path", f"{data}/flow", "--flow_inv_path", f"{data}/flow_inv",
         "--no_flip", "--resize_or_crop", "resize",
         "--load_pretrain_TransG", f"{ckpt}/uv",
         "--which_epoch_TransG", "latest",
         "--lambda_L2", "500", "--lambda_UV", "1000", "--lambda_Prob", "10",
         "--lambda_Temp", "500", "--use_densepose_loss", "--no_vgg_loss",
         "--data_ratio", "0.9", "--niter", str(a.epochs), "--no_decay",
         "--seed", str(a.seed),
         "--save_epoch_freq", "10", "--print_freq", "50",
         "--display_freq", "10000"] + size_flags, log)


def _opt_for(a, data, ckpt, size_kw):
    from neural_human_video_rendering_tpu.config import Options
    return Options(loadSize=a.size, tex_tile=a.tile, batchSize=1,
                   pose_path=f"{data}/openpose_json",
                   mask_path=f"{data}/mask", img_path=f"{data}/frames",
                   densepose_path=f"{data}/densepose",
                   bg_path=f"{data}/bg.jpg",
                   texture_path=f"{data}/texture.png",
                   no_flip=True, serial_batches=True, data_ratio=0.9,
                   checkpoints_dir=ckpt, name="e2e", nThreads=1,
                   # keep the TRAINING warp path (default True): forcing the
                   # jnp grid_sample spec here made the 512px scoring pass
                   # sit >17 min compiling its much larger gather graph
                   # while every training compile took ~5 min; the Pallas
                   # kernel interprets on CPU, so CPU scoring still works
                   **size_kw)


def refinement_metrics(a, arm_data, clean_data, ckpt, size_kw, n_eval):
    """Held-out forward through the trained checkpoint: render quality vs
    TRUE frames + refined mask/bg vs the truth AND vs the (possibly
    corrupted) supervision the arm trained on."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.train.state import create_train_state
    from neural_human_video_rendering_tpu.train.steps import make_forward_fn
    from neural_human_video_rendering_tpu.utils import checkpoint as ck
    from neural_human_video_rendering_tpu.utils import metrics as M

    opt = _opt_for(a, arm_data, ckpt, size_kw)
    opt_truth = _opt_for(a, clean_data, ckpt, size_kw)
    ds = dsm.FrameDataset(opt, "test")              # trained-on supervision
    ds_truth = dsm.FrameDataset(opt_truth, "test")  # noise-free truth
    n = min(len(ds), n_eval)
    assert n > 0

    tex = dsm.load_texture_atlas(opt.texture_path, opt.tex_tile,
                                 opt.tex_rows, opt.tex_cols)
    bg = dsm.load_image(opt.bg_path, opt.train_size)
    bundle = create_train_state(opt, jax.random.PRNGKey(0), tex, bg,
                                with_discriminator=False)
    state = bundle["state"]
    g_params = ck.load_net(opt.run_dir, "G", "latest", state.g_params)
    fwd = make_forward_fn(opt, bundle["renderer"])

    true_bg = dsm.load_image(opt_truth.bg_path, opt.train_size)
    sup_bg = np.asarray(state.bg)

    def iou(p, t):
        p, t = p > 0.5, t > 0.5
        inter = float(np.sum(p & t))
        union = float(np.sum(p | t))
        return inter / union if union else 1.0

    psnr_v, ssim_v, iou_pred, iou_sup = [], [], [], []
    bg_ref = None
    for i in range(n):
        s, st = ds[i], ds_truth[i]
        outs = fwd(g_params, (state.static_tex, state.bg, state.tex_mask),
                   jnp.asarray(s["joints"][None]), None, None)
        real = jnp.asarray(st["image"][None])
        psnr_v.append(float(M.psnr(outs["fake"], real)))
        ssim_v.append(float(M.ssim(outs["fake"], real)))
        pred_mask = np.asarray(outs["mask"][0, ..., 0])
        true_mask = st["mask"][..., 0] if st["mask"].ndim == 3 else st["mask"]
        sup_mask = s["mask"][..., 0] if s["mask"].ndim == 3 else s["mask"]
        iou_pred.append(iou(pred_mask, true_mask))
        iou_sup.append(iou(sup_mask, true_mask))
        if bg_ref is None:
            bg_ref = np.asarray(outs["bg_refined"][0])

    def _psnr(x, y):
        return float(M.psnr(jnp.asarray(x)[None], jnp.asarray(y)[None]))

    return {
        "held_out_frames": n,
        "render_PSNR": float(np.mean(psnr_v)),
        "render_SSIM": float(np.mean(ssim_v)),
        "mask_IoU_refined_vs_true": float(np.mean(iou_pred)),
        "mask_IoU_supervision_vs_true": float(np.mean(iou_sup)),
        "bg_PSNR_refined_vs_true": _psnr(bg_ref, true_bg),
        "bg_PSNR_supervision_vs_true": _psnr(sup_bg, true_bg),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--tile", type=int, default=64)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--pre_epochs", type=int, default=4)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--corrupt", type=float, default=0.6)
    p.add_argument("--how_many", type=int, default=10,
                   help="held-out frames to score")
    p.add_argument("--small", action="store_true")
    p.add_argument("--seed", type=int, default=0,
                   help="training init seed for both arms (seed-noise "
                        "replicas of the A/B — round-4 anomaly check)")
    p.add_argument("--skip_train", action="store_true",
                   help="re-score existing checkpoints only")
    a = p.parse_args()

    os.makedirs(a.out, exist_ok=True)
    log = os.path.join(a.out, "run.log")
    size_kw = SIZES_SMALL if a.small else SIZES_FULL
    py = sys.executable

    arms = {"clean": os.path.join(a.out, "clean"),
            "noisy": os.path.join(a.out, "noisy")}
    for arm, data in arms.items():
        if os.path.isdir(os.path.join(data, "frames")):
            continue  # deterministic corpus already built (e.g. resume)
        cmd = [py, "tools/make_demo_data.py", "--out", data,
               "--size", str(a.size), "--tile", str(a.tile)]
        if arm == "noisy":
            cmd += ["--corrupt", str(a.corrupt)]
        run(cmd, log)

    summary = {"config": {"size": a.size, "tile": a.tile,
                          "epochs": a.epochs, "pre_epochs": a.pre_epochs,
                          "corrupt": a.corrupt,
                          "model": "small" if a.small else
                          "reference-sizing"}}
    if not a.skip_train:
        # Train both arms FIRST (each arm self-skips when its stage-2
        # checkpoint exists, so a killed run resumes at the right arm),
        # then hand scoring to a fresh --skip_train subprocess. Scoring
        # must NOT run in this parent: refinement_metrics initializes a
        # live device session here, and on the single-session axon relay
        # any LATER training subprocess then hangs at backend init until
        # this parent dies (observed wedging the round-5 512px run between
        # the clean score and the noisy arm's pretrain).
        for arm, data in arms.items():
            ckpt = os.path.join(a.out, f"ckpt_{arm}")
            if not os.path.exists(os.path.join(ckpt, "e2e",
                                               "latest_net_G.msgpack")):
                train_arm(a, data, ckpt, log, size_kw)
        cmd = [py, os.path.abspath(__file__), "--out", a.out,
               "--size", str(a.size), "--tile", str(a.tile),
               "--epochs", str(a.epochs), "--pre_epochs", str(a.pre_epochs),
               "--batch", str(a.batch), "--corrupt", str(a.corrupt),
               "--how_many", str(a.how_many), "--seed", str(a.seed),
               "--skip_train"]
        if a.small:
            cmd.append("--small")
        run(cmd, log)
        return
    for arm, data in arms.items():
        ckpt = os.path.join(a.out, f"ckpt_{arm}")
        summary[arm] = refinement_metrics(a, data, arms["clean"], ckpt,
                                          size_kw, a.how_many)
        print(f"[{arm}] {json.dumps(summary[arm])}", flush=True)

    out_json = os.path.join(a.out, "noisy_gt_ab.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"summary -> {out_json}")


if __name__ == "__main__":
    main()
