#!/usr/bin/env python3
"""Precompute per-part appearance codes for --instance_feat inference.

pix2pixHD's encode_features step (networks.define_E lineage,
README.md:101): run the trained encoder E over the training corpus, pool
its features per region, and k-means the resulting vectors into
n_clusters appearance codes per region class. At inference,
--load_features <out.npz> --cluster_idx k renders with cluster k's codes
instead of encoding a (nonexistent) real frame. In this pipeline the
region map is the DensePose 24-part body-part map (see
models/generators.FeatEncoder).

Usage:
    python tools/encode_features.py --name e2e --checkpoints_dir ... \
        --img_path ... --densepose_path ... --instance_feat \
        --out features.npz [--n_clusters 10] [<model flags>]

Output npz: centers (n_clusters, P+1, feat_num).
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def kmeans(x, k, iters=25, seed=0):
    """Plain numpy k-means (n, d) -> (k, d); handles n < k by padding."""
    import numpy as np
    rng = np.random.RandomState(seed)
    n = len(x)
    if n == 0:
        return np.zeros((k, x.shape[1] if x.ndim == 2 else 1), np.float32)
    if n <= k:
        reps = np.concatenate([x] * (-(-k // n)))[:k]
        return reps.astype(np.float32)
    centers = x[rng.choice(n, k, replace=False)]
    for _ in range(iters):
        d = ((x[:, None] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            sel = x[assign == j]
            if len(sel):
                centers[j] = sel.mean(0)
    return centers.astype(np.float32)


def main():
    from neural_human_video_rendering_tpu.runtime import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neural_human_video_rendering_tpu.config import TrainOptions
    from neural_human_video_rendering_tpu.data.dataset import (FrameDataset,
                                                               collate)
    from neural_human_video_rendering_tpu.models.generators import FeatEncoder
    from neural_human_video_rendering_tpu.train.drivers import _assets
    from neural_human_video_rendering_tpu.train.state import create_train_state
    from neural_human_video_rendering_tpu.utils import checkpoint as ckpt

    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--out", default="features.npz")
    ap.add_argument("--n_clusters", type=int, default=10)
    ap.add_argument("--max_frames", type=int, default=500)
    ns, rest = ap.parse_known_args()
    opt = TrainOptions().parse(rest, save=False)
    assert opt.instance_feat or opt.label_feat, \
        "pass --instance_feat (or --label_feat) so the model has encoder E"

    ds = FrameDataset(opt)
    tex, bg = _assets(opt, ds)
    bundle = create_train_state(opt, jax.random.PRNGKey(0), tex, bg,
                                with_discriminator=False)
    g_params = ckpt.load_net(opt.run_dir, "G", opt.which_epoch,
                             bundle["state"].g_params)
    enc = FeatEncoder(opt.feat_num, opt.nef, opt.n_downsample_E,
                      pad_mode=opt.pad_mode, upsample_mode=opt.upsample_mode)

    from neural_human_video_rendering_tpu.models.generators import region_mean

    @jax.jit
    def encode(img, parts):
        fmap = enc.apply({"params": g_params["FeatE"]}, img)   # (1,H,W,F)
        onehot = jax.nn.one_hot(parts, opt.n_parts + 1)        # (1,H,W,P+1)
        # SAME pooling math as the renderer's part_pool (shared helper)
        mean = region_mean(fmap, onehot)[0]                    # (P+1,F)
        present = jnp.einsum("bhwc->c", onehot) > 0
        return mean, present

    vecs = [[] for _ in range(opt.n_parts + 1)]
    take = min(len(ds), ns.max_frames)
    for i in range(take):
        b = collate([ds[i]])
        mean, present = encode(jnp.asarray(b["image"]),
                               jnp.asarray(b["dp_parts"]))
        mean, present = np.asarray(mean), np.asarray(present)
        for c in range(opt.n_parts + 1):
            if present[c]:
                vecs[c].append(mean[c])
    print(f"[feat] encoded {take} frames", flush=True)

    centers = np.zeros((ns.n_clusters, opt.n_parts + 1, opt.feat_num),
                       np.float32)
    for c in range(opt.n_parts + 1):
        if vecs[c]:
            centers[:, c] = kmeans(np.stack(vecs[c]), ns.n_clusters)
    np.savez(ns.out, centers=centers)
    print(f"[feat] wrote {ns.out}: centers {centers.shape}", flush=True)


if __name__ == "__main__":
    main()
