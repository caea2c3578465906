"""Inference / pose-transfer driver (test.py equivalent, SURVEY.md §3.1).

Reference control flow reproduced (test_start/start.sh:6-28): load target
assets (bg.jpg, texture.jpg), align the driving keypoints to the target
person using --pose_tgt_path corpus statistics, load the epoch checkpoint,
then run the jitted pose -> IUV -> texture-warp -> composite forward per
frame batch and write frames + an HTML gallery to --results_dir.

TPU-native difference: frames run in fixed-size batches through one compiled
forward (no per-frame Python in the hot loop); JSON parsing and PNG encode
stay on host threads.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import dataset as dsm
from ..data import keypoints as kp
from ..data import laplace as lp
from ..data import pose_align
from ..train.state import create_train_state
from ..train.steps import make_forward_fn
from ..utils import checkpoint as ckpt
from ..utils.html import HTMLGallery
from ..utils.image import save_image


def _target_canvas(opt) -> Optional[tuple]:
    """(H, W) pixel canvas the (aligned) keypoints live on: --target_shape
    beats the align_meta.json sidecar written by graph_posenorm beats
    nothing (caller falls back to corpus extent)."""
    hw = opt.parse_shape(opt.target_shape)
    if hw is not None:
        return hw
    for d in (opt.pose_path, opt.pose_tgt_path):
        meta = os.path.join(d, "align_meta.json") if d else ""
        if meta and os.path.isfile(meta):
            import json
            with open(meta) as f:
                ts = json.load(f).get("target_shape")
            if ts:
                return int(ts[0]), int(ts[1])
    return None


def map_driving_joints(opt, joints: np.ndarray,
                       canvas: Optional[tuple]) -> np.ndarray:
    """Map target-canvas pixel keypoints onto the square model canvas with
    the SAME geometry training used (dataset.canvas_geom: anisotropic for
    resize modes, aspect-preserving + vertical letterbox offset for
    scale_width*, loadSize canvas + deterministic center-crop offset for
    *_crop modes — matching the eval-phase crop). Falls back to a
    corpus-extent squeeze when no canvas is known."""
    from ..data import dataset as dsm
    S = opt.train_size
    if canvas is not None:
        Ht, Wt = max(float(canvas[0]), 1.0), max(float(canvas[1]), 1.0)
        sx, sy, oy = dsm.canvas_geom(opt.resize_or_crop, Wt, Ht,
                                     opt.loadSize)
        oc = (opt.loadSize - S) // 2 if S < opt.loadSize else 0
        joints = joints.copy()
        has = joints[..., 2] > 0
        joints[..., 0] = np.where(has, joints[..., 0] * sx - oc,
                                  joints[..., 0])
        joints[..., 1] = np.where(has, joints[..., 1] * sy + oy - oc,
                                  joints[..., 1])
        return joints
    extent = max(float(np.max(joints[..., :2])), 1.0)
    if extent > S:
        joints = joints.copy()
        joints[..., :2] *= S / extent
    return joints


def run_inference(opt, batch_size: Optional[int] = None,
                  max_frames: Optional[int] = None) -> int:
    """Render the driving sequence; returns number of frames written."""
    # model canvas: train_size (= fineSize under crop modes) — the shapes
    # create_train_state/build_pose_input were built with (ADVICE r1 #3)
    S = opt.train_size
    if batch_size is None:
        batch_size = max(1, opt.infer_batch)

    # driving poses: keypoint JSONs (rasterized on device) OR a directory of
    # pre-rendered pose images (the openpose_img contract FrameDataset also
    # honors, dataset.py:217-223) — a model trained on pose images must be
    # driven with pose images, not a differently-rendered skeleton
    pose_img_names: list = []
    pose_ds = None
    names, joints = kp.load_pose_dir(opt.pose_path)
    if not names:
        pose_img_names = dsm.list_images(opt.pose_path)
        if not pose_img_names:
            raise FileNotFoundError(
                f"--pose_path {opt.pose_path!r} contains neither keypoint "
                "JSONs nor pose images")
        names = pose_img_names
        joints = np.zeros((len(names), kp.N_COCO18, 3), np.float32)
        # load through FrameDataset so the driving images get EXACTLY the
        # training geometry — loadSize canvas, scale_width* letterboxing,
        # deterministic eval center-crop under crop modes. A plain square
        # resize here mis-framed crop/scale_width-trained models.
        import dataclasses
        opt_p = dataclasses.replace(
            opt, img_path="", mask_path="", densepose_path="",
            flow_path="", flow_inv_path="", lapalce_path="",
            data_ratio=1.0, no_flip=True)
        pose_ds = dsm.FrameDataset(opt_p, "test")
        if opt.pose_tgt_path:
            print("[align] WARNING: --pose_tgt_path ignored — pose-image "
                  "driving cannot be retargeted (alignment needs keypoints)",
                  flush=True)
        print(f"[pose] driving with {len(names)} pre-rendered pose images",
              flush=True)
    if not pose_img_names:      # alignment applies to keypoints only
        if opt.pose_tgt_path and os.path.isdir(opt.pose_tgt_path):
            s, t = pose_align.fit_scale_translation(
                opt.pose_tgt_path, opt.pose_path,
                target_shape=_target_canvas(opt),
                source_shape=opt.parse_shape(opt.source_shape))
            joints = joints.copy()
            has = joints[..., 2] > 0
            joints[..., 0] = np.where(has, s * joints[..., 0] + t[0], joints[..., 0])
            joints[..., 1] = np.where(has, s * joints[..., 1] + t[1], joints[..., 1])
            print(f"[align] scale {s:.3f}, translation {t}", flush=True)
        canvas = _target_canvas(opt)
        if canvas is None and opt.pose_tgt_path and os.path.isdir(opt.pose_tgt_path):
            _, hi = pose_align.corpus_extent(opt.pose_tgt_path)
            if np.all(np.isfinite(hi)):
                canvas = (float(hi[1]), float(hi[0]))   # (H, W) from extent
        joints = map_driving_joints(opt, joints, canvas)

    n = len(names) if max_frames is None else min(len(names), max_frames)
    n = min(n, opt.how_many)

    # target assets + params
    tex = (dsm.load_texture_atlas(opt.texture_path, opt.tex_tile,
                                  opt.tex_rows, opt.tex_cols)
           if opt.texture_path and os.path.isfile(opt.texture_path)
           else np.zeros((opt.n_parts, opt.tex_tile, opt.tex_tile, 3), np.float32))
    bg = (dsm.load_image(opt.bg_path, S)
          if opt.bg_path and os.path.isfile(opt.bg_path)
          else np.zeros((S, S, 3), np.float32))
    # --use_mask_texture: confine the TexG residual to filled atlas texels
    # exactly as training did (drivers._tex_mask) — without it a trained
    # residual leaks into hole texels sampled near part seams
    from ..train.drivers import _tex_mask
    bundle = create_train_state(opt, jax.random.PRNGKey(opt.seed), tex, bg,
                                tex_mask=_tex_mask(opt, tex),
                                with_discriminator=False)
    state = bundle["state"]
    g_params = state.g_params
    run_dir = opt.run_dir
    if os.path.isdir(run_dir) and ckpt.latest_epoch(run_dir, "G"):
        # prefer the EMA weights when the run trained with --ema_decay (the
        # G_ema files exist only then; they are the evaluated/served track);
        # --no_ema forces the raw weights (EMA-vs-raw A/B evals)
        label = ("G_ema" if (not opt.no_ema and os.path.isfile(
            ckpt._path(run_dir, opt.which_epoch, "G_ema"))) else "G")
        g_params = ckpt.load_net(run_dir, label, opt.which_epoch, g_params)
        print(f"[ckpt] loaded {label} epoch {opt.which_epoch} from {run_dir}",
              flush=True)
    else:
        print("[ckpt] no checkpoint found -> random-init demo render", flush=True)

    lap_files = (lp.list_frames(opt.lapalce_path)
                 if opt.lapalce_path and os.path.isdir(opt.lapalce_path) else [])

    # multi-device serving: shard the frame batch over a data mesh when more
    # than one device is visible (params/assets replicated, forward SPMD) —
    # per-pod FPS scales with chip count, same compiled program
    mesh = None
    n_dev = jax.local_device_count()
    if n_dev > 1:
        from ..parallel.mesh import batch_sharding, make_mesh, replicate
        if batch_size % n_dev:
            batch_size = n_dev * max(1, -(-batch_size // n_dev))
        mesh = make_mesh(n_dev)
        g_params = replicate(mesh, g_params)
        print(f"[mesh] inference sharded over {n_dev} devices "
              f"(batch {batch_size})", flush=True)

    def put_batch(x):
        return jax.device_put(x, batch_sharding(mesh)) if mesh is not None else x

    cluster_feats = None
    if bundle["renderer"].use_feat:
        if opt.load_features:
            if not os.path.isfile(opt.load_features):
                raise FileNotFoundError(
                    f"--load_features {opt.load_features!r} does not exist "
                    "(run tools/encode_features.py to build it)")
            import numpy as _np
            centers = _np.load(opt.load_features)["centers"]
            if not 0 <= opt.cluster_idx < len(centers):
                raise ValueError(
                    f"--cluster_idx {opt.cluster_idx} out of range: "
                    f"{opt.load_features} has {len(centers)} clusters")
            cluster_feats = centers[opt.cluster_idx]
            print(f"[feat] cluster {opt.cluster_idx} codes from "
                  f"{opt.load_features}", flush=True)
        else:
            print("[feat] --instance_feat/--label_feat without "
                  "--load_features: rendering with ZERO appearance codes "
                  "(run tools/encode_features.py to build codes)",
                  flush=True)
    fwd = make_forward_fn(opt, bundle["renderer"], cluster_feats)
    os.makedirs(opt.results_dir, exist_ok=True)
    gallery = HTMLGallery(opt.results_dir, f"{opt.name} @ {opt.which_epoch}")
    written = 0

    # three-way overlap: device forward of batch k+1 runs while batch k
    # transfers to host and a thread pool encodes batch k-1's PNGs (JAX
    # dispatch is async; np.asarray is the only sync point per batch)
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=4)
    pending: deque = deque()       # (sel, device outs)
    writes = []

    def drain_one():
        nonlocal written
        sel_d, outs_d = pending.popleft()
        fakes = np.asarray(outs_d["fake"])
        for j, i in enumerate(sel_d):
            fname = (f"{os.path.splitext(names[i])[0].replace('_keypoints','')}"
                     "_synthesized.jpg")
            writes.append(pool.submit(
                save_image, os.path.join(opt.results_dir, "images", fname),
                fakes[j]))
            gallery.add_images(names[i], [("synthesized", fname)])
            written += 1

    for start in range(0, n, batch_size):
        sel = list(range(start, min(start + batch_size, n)))
        # pad the tail so the compiled forward sees one batch shape
        padded = sel + [sel[-1]] * (batch_size - len(sel))
        jb = put_batch(jnp.asarray(joints[padded]))
        lap = None
        if opt.use_laplace and lap_files:
            lap = put_batch(jnp.asarray(np.stack([
                lp.load_laplace(os.path.join(opt.lapalce_path,
                                             lap_files[min(i, len(lap_files) - 1)]),
                                S, opt.laplace_nc) for i in padded])))
        pimg = None
        if pose_ds is not None:
            pimg = put_batch(jnp.asarray(np.stack([
                pose_ds[i]["pose_img"] for i in padded])))
        pending.append((sel, fwd(g_params, (state.static_tex, state.bg,
                                            state.tex_mask), jb, lap, pimg)))
        if len(pending) > 1:
            drain_one()
    while pending:
        drain_one()
    for w in writes:
        w.result()                  # surface any encode errors
    pool.shutdown()
    gallery.save()
    if opt.save_video and written:
        from ..utils.video import write_video
        vpath = os.path.join(opt.results_dir, "video.mp4")
        nv = write_video(os.path.join(opt.results_dir, "images"), vpath,
                         fps=opt.video_fps)
        print(f"[infer] wrote {nv}-frame video -> {vpath}", flush=True)
    print(f"[infer] wrote {written} frames -> {opt.results_dir}", flush=True)
    return written
