#!/usr/bin/env python3
"""Quality decomposition profiler (VERDICT r2 next-round #3).

The fabricated corpus admits machine-precision reconstruction, yet the
100-epoch run plateaus ~30 dB held-out. This tool attributes the residual
error per subsystem the way tools/profile_step.py attributes step time:
evaluate a trained checkpoint on held-out frames under ablations that
substitute one subsystem's output with ground truth at a time, and report
the PSNR/SSIM of every variant:

  full          the model as trained (baseline)
  transg_gt     GT IUV (probs+UV) injected; TexG texture, BGNet bg kept
                -> the gap to `full` is TransG's contribution to the error
  texg_static   dynamic texture replaced by the static atlas
                -> gap tells whether TexG helps or hurts
  mask_gt       predicted soft mask replaced by the true silhouette
  bg_gt         refined background replaced by the true background
  all_gt_file   GT everything from the corpus FILES (codec-quantized IUV,
                true atlas/mask/bg) -> the supervision's own ceiling
  all_gt_exact  GT everything from exact rasterization (no codec
                quantization) -> the model CLASS ceiling: bilinear warp of
                a tile-T atlas vs the corpus's nearest-neighbor render

plus a no-model tile sweep (`--ceiling_tiles`) of all_gt_exact, isolating
how much of the plateau is texture tile resolution (tex_tile 64 vs 128).

Works against any run trained by tools/quality_run.py:

  python tools/quality_profile.py --data /tmp/quality/data \
      --run_dir /tmp/quality/ckpt/e2e_tempreal --how_many 6 \
      --out /tmp/qprof.json -- --loadSize 512 --tex_tile 64 <model flags>

(model flags after `--` go to the standard TestOptions parser, so pass the
exact sizing flags the checkpoint was trained with).
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from neural_human_video_rendering_tpu.runtime import setup_jax  # noqa: E402

setup_jax()  # honor JAX_PLATFORMS before any in-process jax use


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="corpus dir (make_demo_data)")
    ap.add_argument("--run_dir", required=True, help="trained run dir")
    ap.add_argument("--which_epoch", default="latest")
    ap.add_argument("--how_many", type=int, default=8)
    ap.add_argument("--data_ratio", type=float, default=0.9,
                    help="train/holdout split — MUST match the training "
                         "run's --data_ratio or the 'held-out' frames are "
                         "training frames (default 0.9, the launcher value)")
    ap.add_argument("--ceiling_tiles", default="32,64,128")
    ap.add_argument("--out", default="")
    my, rest = ap.parse_known_args()
    if rest and rest[0] == "--":
        rest = rest[1:]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_human_video_rendering_tpu.config import TestOptions
    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.data import synthetic_video as sv
    from neural_human_video_rendering_tpu.ops.pallas_warp import texture_warp
    from neural_human_video_rendering_tpu.train.state import create_train_state
    from neural_human_video_rendering_tpu.train.steps import build_pose_input
    from neural_human_video_rendering_tpu.utils import checkpoint as ck
    from neural_human_video_rendering_tpu.utils import metrics as M

    opt = TestOptions().parse(rest, save=False)
    d = my.data
    opt.pose_path = f"{d}/openpose_json"
    opt.img_path = f"{d}/frames"
    opt.mask_path = f"{d}/mask"
    opt.densepose_path = f"{d}/densepose"
    opt.bg_path = f"{d}/bg.jpg"
    opt.texture_path = f"{d}/texture.png"
    opt.no_flip, opt.serial_batches, opt.batchSize = True, True, 1
    opt.use_densepose_loss = True          # make the dataset emit dp_parts/uv
    opt.data_ratio = my.data_ratio
    S, P = opt.train_size, opt.n_parts

    ds = dsm.FrameDataset(opt, "test")     # held-out --data_ratio split
    assert 0 < len(ds) < len(dsm.list_images(opt.img_path)), (
        "test split selected the whole corpus — data_ratio mismatch "
        "(round-3 post-mortem: an unset data_ratio silently evaluated "
        "TRAINING frames as 'held-out')")
    n = min(len(ds), my.how_many)
    tex = dsm.load_texture_atlas(opt.texture_path, opt.tex_tile,
                                 opt.tex_rows, opt.tex_cols)
    bg = dsm.load_image(opt.bg_path, S)
    bundle = create_train_state(opt, jax.random.PRNGKey(0), tex, bg,
                                with_discriminator=False)
    state = bundle["state"]
    g_params = ck.load_net(my.run_dir, "G", my.which_epoch, state.g_params)
    renderer = bundle["renderer"]
    print(f"[profile] {n} held-out frames @ {S}px, ckpt {my.run_dir} "
          f"@ {my.which_epoch}", flush=True)

    def compose(mask, fg, bgimg):
        return mask * fg + (1.0 - mask) * bgimg

    def warp(texture, uv2, onehot):
        """GT injection: one (B,H,W,2) UV for every part + one-hot probs."""
        uv_tiled = jnp.broadcast_to(uv2[:, :, :, None, :],
                                    uv2.shape[:3] + (P, 2))
        return texture_warp(texture, uv_tiled, onehot,
                            use_pallas=opt.use_pallas_warp, k=opt.warp_topk,
                            eps=opt.warp_eps)

    @jax.jit
    def variants(g_params, joints, gt_parts, gt_uv, true_bg, true_atlas):
        pose = build_pose_input(opt, joints, None, None)
        outs = renderer.apply({"params": g_params}, pose,
                              jnp.asarray(bg)[None],
                              jnp.asarray(tex)[None], state.tex_mask)
        onehot = jax.nn.one_hot(gt_parts, P + 1, dtype=jnp.float32)
        gt_mask = 1.0 - onehot[..., :1]
        out = {"full": outs["fake"]}
        fg_gt = warp(outs["texture"], gt_uv, onehot)
        out["transg_gt"] = compose(gt_mask, fg_gt, outs["bg_refined"])
        B = outs["fake"].shape[0]
        static = jnp.broadcast_to(jnp.asarray(tex)[None],
                                  (B,) + tex.shape)
        fg_static = texture_warp(static, outs["uv"], outs["probs"],
                                 use_pallas=opt.use_pallas_warp,
                                 k=opt.warp_topk, eps=opt.warp_eps)
        out["texg_static"] = compose(outs["mask"], fg_static,
                                     outs["bg_refined"])
        out["mask_gt"] = compose(gt_mask, outs["fg"], outs["bg_refined"])
        out["bg_gt"] = compose(outs["mask"], outs["fg"], true_bg)
        out["all_gt_file"] = compose(gt_mask, warp(true_atlas, gt_uv, onehot),
                                     true_bg)
        return out

    @jax.jit
    def score(a, b):
        return M.psnr(a, b), M.ssim(a, b)

    sums: dict = {}
    exact_cache = []        # (onehot_e, mask_e, uv_e) per frame — reused
    for i in range(n):      # by the tile-ceiling sweep (tile-independent)
        s = ds[i]
        joints = jnp.asarray(s["joints"][None])
        gt_parts = jnp.asarray(s["dp_parts"][None].astype(np.int32))
        gt_uv = jnp.asarray(s["dp_uv"][None])
        real = jnp.asarray(s["image"][None])
        outs = variants(g_params, joints, gt_parts, gt_uv,
                        jnp.asarray(bg)[None], jnp.asarray(tex)[None])
        # exact (codec-free) GT from the corpus construction itself
        # (host-side rasterization; uses the raw canvas keypoints)
        parts_e, uv_e, _ = sv.rasterize_iuv(np.asarray(s["joints"]), S)
        onehot_e = jax.nn.one_hot(jnp.asarray(parts_e[None]), P + 1,
                                  dtype=jnp.float32)
        mask_e = 1.0 - onehot_e[..., :1]
        exact_cache.append((onehot_e, mask_e, jnp.asarray(uv_e[None]), real))
        fg_e = warp(jnp.asarray(tex)[None], jnp.asarray(uv_e[None]), onehot_e)
        outs = dict(outs)
        outs["all_gt_exact"] = compose(mask_e, fg_e, jnp.asarray(bg)[None])
        for k, v in outs.items():
            p, ss_ = score(v, real)
            acc = sums.setdefault(k, [0.0, 0.0])
            acc[0] += float(p)
            acc[1] += float(ss_)
        print(f"[profile] frame {i + 1}/{n} done", flush=True)

    table = {k: {"PSNR": v[0] / n, "SSIM": v[1] / n}
             for k, v in sums.items()}

    # no-model tile-resolution ceiling: bilinear warp of a tile-T TRUE
    # atlas vs the corpus's nearest-neighbor tile-64 render
    tiles = {}
    for T in [int(t) for t in my.ceiling_tiles.split(",") if t]:
        atlas_T = jnp.asarray(sv.part_texture_atlas(tile=T))[None]
        acc = [0.0, 0.0]
        for onehot_e, mask_e, uv_e, real in exact_cache:
            fg = warp(atlas_T, uv_e, onehot_e)
            fake = compose(mask_e, fg, jnp.asarray(bg)[None])
            p, ss_ = score(fake, real)
            acc[0] += float(p)
            acc[1] += float(ss_)
        tiles[T] = {"PSNR": acc[0] / n, "SSIM": acc[1] / n}

    result = {"config": {"data": my.data, "run_dir": my.run_dir,
                         "which_epoch": my.which_epoch, "frames": n,
                         "size": S, "tex_tile": opt.tex_tile},
              "variants": table, "tile_ceiling": tiles}
    print(json.dumps(result, indent=1))
    if my.out:
        os.makedirs(os.path.dirname(my.out) or ".", exist_ok=True)
        with open(my.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"-> {my.out}")


if __name__ == "__main__":
    main()
