"""Fabricate a reference-contract dataset directory tree for tests.

Produces the per-video layout the reference README documents
(/root/reference/README.md:39-64): frames, openpose_json (or openpose_img),
densepose IUV images, masks, pairwise flow/.flo files (N-1 of them),
LaplaceProj frames, bg.jpg, texture.jpg — all tiny, deterministic, and
index-consistent so launcher-compat tests can point real flag lines at it.
"""

import json
import os

import cv2
import numpy as np

from neural_human_video_rendering_tpu.data import densepose as dp


def _pose_body25(rng, size):
    body = np.zeros((25, 3), np.float32)
    body[:, 0] = rng.uniform(5, size - 5, 25)
    body[:, 1] = rng.uniform(5, size - 5, 25)
    body[:, 2] = 1.0
    return body


def make_corpus(root, n=6, size=48, canvas=None, pose="json",
                laplace_ch=0, flow=True, densepose=True, mask=True,
                images=True, seed=0):
    """Build the tree under `root`; returns a dict of the paths created.

    canvas=(H, W) overrides the square `size` for the on-disk native
    resolution (keypoints are written in that pixel space).
    """
    H, W = canvas if canvas is not None else (size, size)
    rng = np.random.default_rng(seed)
    paths = {}

    def d(name):
        p = os.path.join(root, name)
        os.makedirs(p, exist_ok=True)
        paths[name] = p
        return p

    if pose == "json":
        pd = d("openpose_json")
        for i in range(n):
            body = _pose_body25(rng, min(H, W))
            with open(os.path.join(pd, f"frame{i:05d}_keypoints.json"), "w") as f:
                json.dump({"people": [{"pose_keypoints_2d":
                                       body.reshape(-1).tolist()}]}, f)
    elif pose == "img":
        pd = d("openpose_img")
        for i in range(n):
            img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
            cv2.imwrite(os.path.join(pd, f"frame{i:05d}.png"), img)

    if images:
        idir = d("frames")
        for i in range(n):
            img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
            cv2.imwrite(os.path.join(idir, f"frame{i:05d}.png"), img)

    if mask:
        mdir = d("mask")
        for i in range(n):
            m = (rng.uniform(0, 1, (H, W)) > 0.5).astype(np.uint8) * 255
            cv2.imwrite(os.path.join(mdir, f"frame{i:05d}.png"), m)

    if densepose:
        ddir = d("densepose")
        for i in range(n):
            parts = rng.integers(0, 25, (H, W)).astype(np.int32)
            uv = rng.uniform(0, 1, (H, W, 2)).astype(np.float32)
            uv[parts == 0] = 0
            enc = dp.encode_iuv(parts, uv)
            cv2.imwrite(os.path.join(ddir, f"frame{i:05d}.png"),
                        cv2.cvtColor(enc, cv2.COLOR_RGB2BGR))

    if flow:
        for name in ("flow", "flow_inv"):
            fdir = d(name)
            for i in range(n - 1):        # FlowNet2: N-1 pairwise files
                fl = rng.normal(0, 2, (H, W, 2)).astype(np.float32)
                with open(os.path.join(fdir, f"frame{i:05d}.flo"), "wb") as f:
                    f.write(np.float32(202021.25).tobytes())
                    f.write(np.int32(W).tobytes())
                    f.write(np.int32(H).tobytes())
                    f.write(fl.tobytes())

    if laplace_ch:
        ldir = d("LaplaceProj")
        for i in range(n):
            arr = rng.uniform(-1, 1, (H, W, laplace_ch)).astype(np.float32)
            np.save(os.path.join(ldir, f"frame{i:05d}.npy"), arr)

    bg = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
    paths["bg.jpg"] = os.path.join(root, "bg.jpg")
    cv2.imwrite(paths["bg.jpg"], bg)
    tex = (rng.uniform(0, 255, (4 * 16, 6 * 16, 3))).astype(np.uint8)
    paths["texture.jpg"] = os.path.join(root, "texture.jpg")
    cv2.imwrite(paths["texture.jpg"], tex)
    return paths
