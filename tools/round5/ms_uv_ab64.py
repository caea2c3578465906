#!/usr/bin/env python3
"""64px A/B gate for --ms_uv multi-scale deep UV supervision (round-5 lever).

Two arms on the SAME clean fabricated corpus, same seed, same schedule:
  base:  stage-1 + stage-2 as-is
  msuv:  identical plus --ms_uv 2 (aux IUV heads at S/4 and S/2)
Scored on held-out render PSNR/SSIM + the UV/CE validation losses the lever
directly optimizes. Cheap gate (VERDICT r4 next #4: "A/B at 64px first,
scale the winner"); the 512px arm runs regardless but this anchors the
mechanism's sign at low cost.

Usage: python tools/round5/ms_uv_ab64.py --out docs/quality/ms_uv_64px.json
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from neural_human_video_rendering_tpu.runtime import setup_jax  # noqa: E402

setup_jax()

# 64px sizing with a 3-level encoder so ms_uv=2 gets two distinct-resolution
# taps (S/4, S/2) — the same ladder shape the 512px reference sizing has
SIZES = dict(ngf=16, ngf_global=16, ndf=16,
             n_blocks_translate=4, n_downsample_translate=3,
             n_blocks_global=2, n_downsample_global=1,
             n_blocks_bg=1, n_downsample_bg=1, dtype="float32")


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
        r = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT, cwd=REPO)
    if r.returncode != 0:
        print(open(log_path).read()[-4000:])
        raise SystemExit(f"FAILED ({r.returncode}): {' '.join(cmd)}")


def train_arm(a, data, ckpt, log, extra):
    py = sys.executable
    size_flags = flags(SIZES) + ["--loadSize", str(a.size),
                                 "--tex_tile", str(a.tile)]
    run([py, "pre_train.py", "--name", "uv", "--checkpoints_dir", ckpt,
         "--batchSize", "6", "--pose_path", f"{data}/openpose_json",
         "--mask_path", f"{data}/mask",
         "--densepose_path", f"{data}/densepose",
         "--no_flip", "--resize_or_crop", "resize", "--data_ratio", "0.9",
         "--niter", str(a.pre_epochs), "--no_decay", "--seed", str(a.seed),
         "--save_epoch_freq", "2", "--print_freq", "50"]
        + size_flags + extra, log)
    run([py, "train.py", "--name", "e2e", "--checkpoints_dir", ckpt,
         "--batchSize", "2",
         "--pose_path", f"{data}/openpose_json",
         "--mask_path", f"{data}/mask", "--img_path", f"{data}/frames",
         "--densepose_path", f"{data}/densepose",
         "--bg_path", f"{data}/bg.jpg", "--texture_path", f"{data}/texture.png",
         "--flow_path", f"{data}/flow", "--flow_inv_path", f"{data}/flow_inv",
         "--no_flip", "--resize_or_crop", "resize",
         "--load_pretrain_TransG", f"{ckpt}/uv", "--which_epoch_TransG", "latest",
         "--lambda_L2", "500", "--lambda_UV", "1000", "--lambda_Prob", "10",
         "--lambda_Temp", "500", "--use_densepose_loss", "--no_vgg_loss",
         "--data_ratio", "0.9", "--niter", str(a.epochs), "--no_decay",
         "--seed", str(a.seed),
         "--save_epoch_freq", str(a.epochs), "--print_freq", "100",
         "--display_freq", "100000"] + size_flags + extra, log)


def score(a, data, ckpt, extra_kw):
    """Held-out render PSNR/SSIM + masked UV L1 / part accuracy."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_human_video_rendering_tpu import losses as L
    from neural_human_video_rendering_tpu.config import Options
    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.train.state import create_train_state
    from neural_human_video_rendering_tpu.train.steps import make_forward_fn
    from neural_human_video_rendering_tpu.utils import checkpoint as ck
    from neural_human_video_rendering_tpu.utils import metrics as M

    opt = Options(loadSize=a.size, tex_tile=a.tile, batchSize=1,
                  pose_path=f"{data}/openpose_json", mask_path=f"{data}/mask",
                  img_path=f"{data}/frames",
                  densepose_path=f"{data}/densepose",
                  bg_path=f"{data}/bg.jpg",
                  texture_path=f"{data}/texture.png",
                  no_flip=True, serial_batches=True, data_ratio=0.9,
                  checkpoints_dir=ckpt, name="e2e", nThreads=1,
                  use_pallas_warp=False, **SIZES, **extra_kw)
    ds = dsm.FrameDataset(opt, "test")
    n = min(len(ds), a.how_many)
    tex = dsm.load_texture_atlas(opt.texture_path, opt.tex_tile,
                                 opt.tex_rows, opt.tex_cols)
    bg = dsm.load_image(opt.bg_path, opt.train_size)
    bundle = create_train_state(opt, jax.random.PRNGKey(0), tex, bg,
                                with_discriminator=False)
    state = bundle["state"]
    g_params = ck.load_net(opt.run_dir, "G", "latest", state.g_params)
    fwd = make_forward_fn(opt, bundle["renderer"])

    psnr_v, ssim_v, uv_v, acc_v = [], [], [], []
    for i in range(n):
        s = ds[i]
        outs = fwd(g_params, (state.static_tex, state.bg, state.tex_mask),
                   jnp.asarray(s["joints"][None]), None, None)
        real = jnp.asarray(s["image"][None])
        psnr_v.append(float(M.psnr(outs["fake"], real)))
        ssim_v.append(float(M.ssim(outs["fake"], real)))
        parts = jnp.asarray(s["dp_parts"][None])
        uv_v.append(float(L.uv_loss(outs["uv"],
                                    jnp.asarray(s["dp_uv"][None]), parts)))
        pred = jnp.argmax(outs["probs"], -1)
        fg = parts > 0
        acc = jnp.sum((pred == parts) & fg) / jnp.maximum(jnp.sum(fg), 1)
        acc_v.append(float(acc))
    import numpy as np
    return {"held_out_frames": n,
            "render_PSNR": float(np.mean(psnr_v)),
            "render_SSIM": float(np.mean(ssim_v)),
            "uv_L1_at_gt_part": float(np.mean(uv_v)),
            "part_accuracy_fg": float(np.mean(acc_v))}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="summary json path")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--tile", type=int, default=32)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--pre_epochs", type=int, default=4)
    p.add_argument("--how_many", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--work", default="/tmp/r5run/ms64")
    a = p.parse_args()

    os.makedirs(a.work, exist_ok=True)
    log = os.path.join(a.work, "run.log")
    data = os.path.join(a.work, "data")
    run([sys.executable, "tools/make_demo_data.py", "--out", data,
         "--size", str(a.size), "--tile", str(a.tile)], log)

    arms = {"base": [], "msuv": ["--ms_uv", "2", "--lambda_MS", "0.3"]}
    summary = {"config": {"size": a.size, "epochs": a.epochs,
                          "pre_epochs": a.pre_epochs, "seed": a.seed,
                          "sizes": SIZES}}
    for arm, extra in arms.items():
        ckpt = os.path.join(a.work, f"ckpt_{arm}")
        if not os.path.exists(os.path.join(ckpt, "e2e",
                                           "latest_net_G.msgpack")):
            train_arm(a, data, ckpt, log, extra)
        kw = {"ms_uv": 2} if arm == "msuv" else {}
        summary[arm] = score(a, data, ckpt, kw)
        print(f"[{arm}] {json.dumps(summary[arm])}", flush=True)
    summary["delta_PSNR"] = (summary["msuv"]["render_PSNR"]
                             - summary["base"]["render_PSNR"])
    summary["delta_uv_L1"] = (summary["msuv"]["uv_L1_at_gt_part"]
                              - summary["base"]["uv_L1_at_gt_part"])
    os.makedirs(os.path.dirname(os.path.abspath(a.out)), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"summary -> {a.out}")


if __name__ == "__main__":
    main()
