#!/usr/bin/env python3
"""Anatomy of the noisy-GT A/B anomalies (VERDICT r3 weak #5 / next #4).

Round 3's 64px A/B left two counterintuitive results unexplained:
  (a) the NOISY arm's refined mask beats the CLEAN arm's (0.784 vs 0.746
      IoU) — despite the clean arm training on perfect masks;
  (b) the noisy arm matches PSNR but pays 0.035 SSIM — where, structurally?
And implicit in the same table: the clean arm's refined background scores
25.9 dB against the 106 dB supervision it was GIVEN (the refinement makes
a perfect input worse), while the noisy arm IMPROVES its input 28.1->30.1.

This tool dissects a finished tools/noisy_gt_ab.py output dir:

 1. background drift per saved epoch: BGNet's refined bg vs the true bg,
    decomposed into the person-OCCLUDED region (union of true masks — no
    direct supervision there, the composite only shows the bg elsewhere)
    vs the VISIBLE region. Hypothesis: clean-arm error is occluded-region
    drift that grows with training (no gradient anchors the residual).
 2. mask quality per saved epoch, on TRAIN vs HELD-OUT frames + soft-mask
    sharpness mean|2p-1|. Hypothesis: clean supervision yields crisper
    masks that overfit placement; on unseen poses a misplaced crisp edge
    costs more IoU than a soft one (train-vs-holdout gap tells).
 3. SSIM map decomposition on held-out renders at the latest epoch:
    person interior (eroded true mask) / boundary band / background.
    Hypothesis: the noisy arm's SSIM cost concentrates in the person
    interior (texture misregistration from the noisy-IUV-derived atlas).

Usage: python tools/round4/noisyab_anatomy.py --ab /tmp/nab --small \
           --size 64 --tile 32 --out docs/quality/noisyab_anatomy_64px.json
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from neural_human_video_rendering_tpu.runtime import setup_jax  # noqa: E402

setup_jax()  # honor JAX_PLATFORMS before any in-process jax use

from tools.noisy_gt_ab import SIZES_FULL, SIZES_SMALL, _opt_for  # noqa: E402


def ssim_map(a, b):
    """Per-pixel SSIM map (H-10, W-10) for single images in [-1,1]."""
    import jax
    import jax.numpy as jnp

    from neural_human_video_rendering_tpu.utils.metrics import \
        _gaussian_kernel
    a = (jnp.asarray(a)[None].astype(jnp.float32) + 1) / 2
    b = (jnp.asarray(b)[None].astype(jnp.float32) + 1) / 2
    C = a.shape[-1]
    kern = jnp.tile(_gaussian_kernel()[..., None, None], (1, 1, 1, C))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C, precision=jax.lax.Precision.HIGHEST)

    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a ** 2
    var_b = filt(b * b) - mu_b ** 2
    cov = filt(a * b) - mu_a * mu_b
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    import numpy as np
    return np.asarray(s[0].mean(axis=-1))


def region_psnr(x, y, region):
    import numpy as np
    d = (np.asarray(x, np.float32) - np.asarray(y, np.float32)) ** 2
    if d.ndim == 3:
        region = region[..., None]
    mse = float((d * region).sum() / max(region.sum() * d.shape[-1], 1))
    return 10.0 * np.log10(4.0 / max(mse, 1e-10))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ab", required=True, help="noisy_gt_ab.py --out dir")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--n_eval", type=int, default=10)
    ap.add_argument("--out", default="")
    ns = ap.parse_args()

    import numpy as np
    import scipy.ndimage as ndi

    import jax
    import jax.numpy as jnp

    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.train.state import create_train_state
    from neural_human_video_rendering_tpu.train.steps import make_forward_fn
    from neural_human_video_rendering_tpu.utils import checkpoint as ck

    class A:   # the slice of noisy_gt_ab's argparse namespace _opt_for uses
        size, tile = ns.size, ns.tile
    size_kw = SIZES_SMALL if ns.small else SIZES_FULL

    clean_data = os.path.join(ns.ab, "clean")
    true_bg = dsm.load_image(os.path.join(clean_data, "bg.jpg"), ns.size)

    report = {}
    for arm in ("clean", "noisy"):
        arm_data = os.path.join(ns.ab, arm)
        ckpt = os.path.join(ns.ab, f"ckpt_{arm}")
        opt = _opt_for(A, arm_data, ckpt, size_kw)
        opt_truth = _opt_for(A, clean_data, ckpt, size_kw)
        ds_tr = dsm.FrameDataset(opt_truth, "train")    # truth-scored
        ds_te = dsm.FrameDataset(opt_truth, "test")
        run_dir = opt.run_dir

        tex = dsm.load_texture_atlas(opt.texture_path, opt.tex_tile,
                                     opt.tex_rows, opt.tex_cols)
        bg = dsm.load_image(opt.bg_path, opt.train_size)
        bundle = create_train_state(opt, jax.random.PRNGKey(0), tex, bg,
                                    with_discriminator=False)
        state = bundle["state"]
        fwd = make_forward_fn(opt, bundle["renderer"])
        assets = (state.static_tex, state.bg, state.tex_mask)

        # person-occluded region: union of TRUE train masks (where the
        # composite never shows the background)
        occl = np.zeros((ns.size, ns.size), bool)
        for i in range(len(ds_tr)):
            m = ds_tr[i]["mask"]
            occl |= (m[..., 0] if m.ndim == 3 else m) > 0.5
        occl_f = occl.astype(np.float32)
        vis_f = 1.0 - occl_f

        epochs = sorted({f.split("_")[0] for f in os.listdir(run_dir)
                         if f.endswith("_net_G.msgpack")},
                        key=lambda e: (e == "latest", e.zfill(4)))

        def iou(p, t):
            p, t = p > 0.5, t > 0.5
            u = float(np.sum(p | t))
            return float(np.sum(p & t)) / u if u else 1.0

        arm_rep = {"epochs": {}}
        for ep in epochs:
            g = ck.load_net(run_dir, "G", ep, state.g_params)
            j0 = jnp.asarray(ds_tr[0]["joints"][None])
            outs = fwd(g, assets, j0, None, None)
            bgr = np.asarray(outs["bg_refined"][0])
            rep = {
                "bg_PSNR_occluded": region_psnr(bgr, true_bg, occl_f),
                "bg_PSNR_visible": region_psnr(bgr, true_bg, vis_f),
            }
            for split, ds in (("train", ds_tr), ("holdout", ds_te)):
                ious, sharp = [], []
                for i in range(min(len(ds), ns.n_eval)):
                    s = ds[i]
                    o = fwd(g, assets, jnp.asarray(s["joints"][None]),
                            None, None)
                    pm = np.asarray(o["mask"][0, ..., 0])
                    tm = s["mask"][..., 0] if s["mask"].ndim == 3 else s["mask"]
                    ious.append(iou(pm, tm))
                    sharp.append(float(np.mean(np.abs(2 * pm - 1))))
                rep[f"mask_IoU_{split}"] = float(np.mean(ious))
                rep[f"mask_sharpness_{split}"] = float(np.mean(sharp))
            arm_rep["epochs"][ep] = rep
            print(f"[{arm}] epoch {ep}: {json.dumps(rep)}", flush=True)

        # 3. SSIM decomposition at latest, held-out split
        g = ck.load_net(run_dir, "G", "latest", state.g_params)
        zones = {"interior": [], "edge": [], "background": []}
        psnr_zones = {"interior": [], "edge": [], "background": []}
        for i in range(min(len(ds_te), ns.n_eval)):
            s = ds_te[i]
            o = fwd(g, assets, jnp.asarray(s["joints"][None]), None, None)
            fake = np.asarray(o["fake"][0])
            real = s["image"]
            smap = ssim_map(fake, real)
            tm = (s["mask"][..., 0] if s["mask"].ndim == 3
                  else s["mask"]) > 0.5
            inner = ndi.binary_erosion(tm, iterations=2)
            outer = ndi.binary_dilation(tm, iterations=2)
            crop = (slice(5, -5), slice(5, -5))
            for zone, zm in (("interior", inner), ("edge", outer & ~inner),
                             ("background", ~outer)):
                zc = zm[crop]
                if zc.sum():
                    zones[zone].append(float(smap[zc].mean()))
                psnr_zones[zone].append(
                    region_psnr(fake, real, zm.astype(np.float32)))
        arm_rep["ssim_zones_latest"] = {k: float(np.mean(v))
                                        for k, v in zones.items()}
        arm_rep["psnr_zones_latest"] = {k: float(np.mean(v))
                                        for k, v in psnr_zones.items()}
        print(f"[{arm}] zones: {json.dumps(arm_rep['ssim_zones_latest'])}",
              flush=True)
        report[arm] = arm_rep

    if ns.out:
        with open(ns.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"-> {ns.out}")
    else:
        print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
