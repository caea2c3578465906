"""Stage drivers: the bodies behind train.py / pre_train.py / pre_train_tex.py.

Each follows its reference call stack (SURVEY.md §3.2-3.4): build dataset ->
build nets/state (with partial TransG restore for stage 2) -> jit step ->
epoch loop -> per-epoch checkpoints under {checkpoints_dir}/{name}/.

When the multi-modal data directories are absent (this environment has no
OpenPose/DensePose/FlowNet2 outputs), drivers fall back to the deterministic
SyntheticDataset so every stage stays runnable end-to-end — same shapes,
same step, same artifacts.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import dataset as dsm
from ..data.wire import pack_batch
from ..models.generators import TexG, TransG
from ..parallel.mesh import make_mesh, replicate
from ..utils import checkpoint as ckpt
from ..utils.visualizer import prune_metrics_after
from .loop import run_training
from .state import create_train_state, make_optimizer
from .steps import (make_pretrain_tex_step, make_pretrain_uv_step,
                    make_train_step)


def _dataset(opt, phase: str = "train"):
    """Real FrameDataset whenever ANY modality directory exists — the
    reference's pretrainTrans.sh passes pose/mask/densepose but no
    --img_path, and must still train on the real data (VERDICT r1 weak #3)."""
    modality_dirs = (opt.pose_path, opt.img_path, opt.densepose_path,
                     opt.mask_path)
    if any(p and os.path.isdir(p) for p in modality_dirs):
        return dsm.FrameDataset(opt, phase)
    print("[data] no real dataset dirs found -> SyntheticDataset", flush=True)
    return dsm.SyntheticDataset(opt, length=max(opt.batchSize * 4, 16),
                                seed=opt.seed)


def _assets(opt, ds):
    """(static_tex (P,T,T,3), bg (S,S,3)) from files or synthetic."""
    if opt.texture_path and os.path.isfile(opt.texture_path):
        tex = dsm.load_texture_atlas(opt.texture_path, opt.tex_tile,
                                     opt.tex_rows, opt.tex_cols)
    elif hasattr(ds, "texture_atlas"):
        tex = ds.texture_atlas()
    else:
        tex = np.zeros((opt.n_parts, opt.tex_tile, opt.tex_tile, 3), np.float32)
    if opt.bg_path and os.path.isfile(opt.bg_path):
        # state asset at the model resolution (crop-mode batches carry
        # per-sample bg crops; this full-view resize serves inference/visuals)
        bg = dsm.load_image(opt.bg_path, opt.train_size)
    elif hasattr(ds, "background"):
        bg = ds.background()
    else:
        bg = np.zeros((opt.train_size, opt.train_size, 3), np.float32)
    return tex, bg


def _tex_mask(opt, tex: np.ndarray) -> Optional[np.ndarray]:
    """(P,T,T,1) validity mask of atlas texels for --use_mask_texture
    (reference: test_start/start.sh:18): texels the unfold actually filled
    (non-background) are valid; the dynamic residual is confined to them."""
    if not opt.use_mask_texture:
        return None
    filled = (np.abs(tex + 1.0).sum(-1, keepdims=True) > 0.05).astype(np.float32)
    return filled


def _device_batch(batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items()}


def _maybe_mesh(opt):
    """Data-parallel mesh when >1 device is visible (SURVEY.md §2
    "Parallelism": batch sharded over a 1-D `data` axis, state replicated,
    gradient psum inserted by XLA). --mesh_shape caps the device count;
    batchSize must divide evenly or we stay single-device.

    Multi-host (jax.process_count() > 1): the mesh is GLOBAL — all devices
    of all processes — and batches are assembled from per-process dataset
    shards via make_array_from_process_local_data (mesh.shard_batch). The
    global batch is batchSize; each host loads batchSize/process_count
    samples (_local_batch_size). Divisibility is a hard error here: a host
    silently dropping to single-device would train an unsynced model
    (ADVICE r1 #1).
    """
    n_proc = jax.process_count()
    n = len(jax.devices()) if n_proc > 1 else jax.local_device_count()
    if opt.mesh_shape:
        n = min(int(opt.mesh_shape.split(",")[0]), n)
    if n_proc > 1:
        assert n % n_proc == 0, (
            f"mesh of {n} devices must cover {n_proc} processes evenly")
        assert opt.batchSize % n == 0, (
            f"multi-host run: global batchSize {opt.batchSize} must divide "
            f"over {n} devices")
        print(f"[mesh] MULTI-HOST data-parallel: {n} devices / {n_proc} "
              f"processes ({opt.batchSize // n} samples/device)", flush=True)
        return make_mesh(n)
    if n <= 1:
        return None
    if opt.batchSize % n != 0:
        print(f"[mesh] batchSize {opt.batchSize} not divisible by {n} "
              "devices -> single-device", flush=True)
        return None
    print(f"[mesh] data-parallel over {n} devices "
          f"({opt.batchSize // n} samples/device)", flush=True)
    return make_mesh(n)


def _local_batch_size(opt) -> int:
    """Per-process loader batch size: batchSize is the GLOBAL batch; each
    host contributes its process-local slice of it."""
    n_proc = jax.process_count()
    if n_proc <= 1:
        return opt.batchSize
    assert opt.batchSize % n_proc == 0, (
        f"global batchSize {opt.batchSize} must divide over {n_proc} hosts")
    return opt.batchSize // n_proc


# ----------------------------------------------------------------------
# stage 2: end-to-end person-specific training (train.py)
# ----------------------------------------------------------------------

def run_train(opt, epochs: Optional[int] = None, max_steps: Optional[int] = None):
    if opt.debug_nans:
        jax.config.update("jax_debug_nans", True)
    ds = _dataset(opt, "train")
    loader = dsm.BatchLoader(ds, _local_batch_size(opt),
                             shuffle=not opt.serial_batches,
                             seed=opt.seed, threads=opt.nThreads,
                             transform=pack_batch if opt.wire_pack else None)
    tex, bg = _assets(opt, ds)
    tex_mask = _tex_mask(opt, tex)
    bundle = create_train_state(opt, jax.random.PRNGKey(opt.seed), tex, bg,
                                tex_mask=tex_mask,
                                steps_per_epoch=len(loader))
    state = bundle["state"]

    run_dir = opt.run_dir
    start_epoch = 1
    resumed = False
    if opt.continue_train:
        # a run saved only via --save_latest_freq iteration saves has NO
        # numeric epoch files (e.g. --save_epoch_freq beyond its horizon) —
        # resume must also key off latest_net_G, not just numeric tags
        # (round-5 post-mortem: the numeric-only check silently restarted
        # a 106-epoch run from scratch)
        ep = ckpt.latest_epoch(run_dir, "G")
        if ep is not None or ckpt.has_latest(run_dir, "G"):
            state = state.replace(
                g_params=ckpt.load_net(run_dir, "G", "latest", state.g_params))
            if ckpt.has_latest(run_dir, "D") or ep is not None:
                state = state.replace(d_params=ckpt.load_net(
                    run_dir, "D", "latest", state.d_params))
            else:
                print("[ckpt] resume: latest_net_D missing (mid-kill save?);"
                      " keeping fresh D init", flush=True)
            if state.g_ema is not None:
                # restore the EMA track if this run saved one; otherwise
                # restart it from the resumed raw weights (e.g. EMA turned
                # on mid-run with --continue_train)
                if (ckpt.latest_epoch(run_dir, "G_ema") is not None
                        or ckpt.has_latest(run_dir, "G_ema")):
                    state = state.replace(g_ema=ckpt.load_net(
                        run_dir, "G_ema", "latest", state.g_ema))
                else:
                    state = state.replace(
                        g_ema=jax.tree.map(jnp.copy, state.g_params))
            state, saved_ep = ckpt.load_train_state(run_dir, state)
            if saved_ep is not None and saved_ep > 0:
                start_epoch = saved_ep + 1
            elif ep is not None:
                start_epoch = int(ep) + 1
            else:
                # iteration-only 'latest' save with no epoch anchor (saves
                # written before the anchor existed record epoch -1):
                # recover the position from the restored global step —
                # completed full epochs = step // steps_per_epoch
                start_epoch = int(state.step) // max(1, len(loader)) + 1
            resumed = True
            if jax.process_index() == 0:
                # epochs >= start_epoch are about to be re-run; their old
                # log lines belong to the continuation that died after
                # this save — drop them so the curve has unique epochs
                prune_metrics_after(run_dir, start_epoch - 1)
            print(f"[ckpt] resumed at epoch {start_epoch} "
                  f"(step {int(state.step)}, optimizer state "
                  f"{'restored' if saved_ep is not None else 'fresh'})",
                  flush=True)
        else:
            print(f"[ckpt] --continue_train: nothing to resume in {run_dir};"
                  " starting fresh", flush=True)
    if (not resumed) and opt.load_pretrain and os.path.isdir(opt.load_pretrain):
        # pix2pixHD --load_pretrain: warm-start the whole G (and D when
        # present) from another run's checkpoints, fresh optimizers
        g_params = ckpt.load_net(opt.load_pretrain, "G", opt.which_epoch,
                                 state.g_params)
        d_params = state.d_params
        if ckpt.latest_epoch(opt.load_pretrain, "D") is not None:
            d_params = ckpt.load_net(opt.load_pretrain, "D", opt.which_epoch,
                                     state.d_params)
        state = state.replace(g_params=g_params, d_params=d_params)
        print(f"[ckpt] warm-started G/D from {opt.load_pretrain} "
              f"@ {opt.which_epoch}", flush=True)
    elif (not resumed) and opt.load_pretrain_TransG:
        state = state.replace(g_params=ckpt.load_transg_into(
            state.g_params, opt.load_pretrain_TransG, opt.which_epoch_TransG))
        print(f"[ckpt] loaded pretrained TransG from "
              f"{opt.load_pretrain_TransG} @ {opt.which_epoch_TransG}", flush=True)

    mesh = _maybe_mesh(opt)
    if mesh is not None:
        state = replicate(mesh, state)

    step = make_train_step(opt, bundle["renderer"], bundle["disc"],
                           bundle["vgg_params"], bundle["g_tx"], bundle["d_tx"])

    def step_fn(st, batch):
        return step(st, _device_batch(batch))

    def save_fn(st, epoch, completed=None):
        ckpt.save_net(run_dir, "G", epoch, st.g_params)
        ckpt.save_net(run_dir, "D", epoch, st.d_params)
        ckpt.save_net(run_dir, "TransG", epoch, st.g_params["TransG"])
        if st.g_ema is not None:
            ckpt.save_net(run_dir, "G_ema", epoch, st.g_ema)
        # iteration saves (tag 'latest') anchor the state blob to the last
        # completed epoch so --continue_train resumes in place
        anchor = epoch if str(epoch).isdigit() else (
            completed if completed is not None else -1)
        ckpt.save_train_state(run_dir, st, anchor)
        print(f"[ckpt] saved epoch {epoch} -> {run_dir}", flush=True)

    fwd = None

    def visuals_fn(st, batch):
        nonlocal fwd
        from ..data.wire import unpack_batch
        from .steps import make_forward_fn
        batch = unpack_batch(batch)   # wire-packed batches -> f32 for display
        if fwd is None:
            fwd = make_forward_fn(opt, bundle["renderer"])
        outs = fwd(st.g_ema if st.g_ema is not None else st.g_params,
                   (st.static_tex, st.bg, st.tex_mask),
                   jnp.asarray(batch["joints"][:1]),
                   jnp.asarray(batch["laplace"][:1]) if "laplace" in batch else None,
                   jnp.asarray(batch["pose_img"][:1]) if "pose_img" in batch else None,
                   feat_image=jnp.asarray(batch["image"][:1])
                   if (opt.instance_feat or opt.label_feat)
                   and "image" in batch else None)
        vis = {"synthesized": np.asarray(outs["fake"][0]),
               "foreground": np.asarray(outs["fg"][0]),
               "mask": np.asarray(outs["mask"][0]) * 2 - 1,
               "bg_refined": np.asarray(outs["bg_refined"][0])}
        if "image" in batch:
            vis["real"] = batch["image"][0]
        return vis

    # held-out eval (PSNR/SSIM on the --data_ratio split; SURVEY.md §5)
    eval_fn = None
    if 0 < opt.data_ratio < 1:
        eval_ds = _dataset(opt, "test")
        if len(eval_ds) > 0 and not isinstance(eval_ds, dsm.SyntheticDataset):
            from ..utils.metrics import psnr, ssim
            from .steps import make_forward_fn
            eval_loader = dsm.BatchLoader(eval_ds, opt.batchSize,
                                          shuffle=False, drop_last=False)
            efwd = make_forward_fn(opt, bundle["renderer"])

            @jax.jit
            def _metrics(fake, real):
                # per-sample so a short tail batch (drop_last=False) gets
                # exact weighting; jitted because eager SSIM convs over the
                # remote relay cost ~20 s/eval
                return (psnr(fake, real, per_sample=True),
                        ssim(fake, real, per_sample=True))

            def eval_fn(st, epoch):
                ps, ss, n = 0.0, 0.0, 0
                for eb in eval_loader:
                    real = jnp.asarray(eb["image"])
                    # evaluate what inference will serve: the EMA track
                    # when one is being maintained (--ema_decay > 0)
                    outs = efwd(st.g_ema if st.g_ema is not None
                                else st.g_params,
                                (st.static_tex, st.bg, st.tex_mask),
                                jnp.asarray(eb["joints"]),
                                jnp.asarray(eb["laplace"])
                                if "laplace" in eb else None,
                                jnp.asarray(eb["pose_img"])
                                if "pose_img" in eb else None,
                                # encode the real frame under use_feat so
                                # metrics measure the trained configuration
                                feat_image=real
                                if opt.instance_feat or opt.label_feat
                                else None)
                    p, s = _metrics(outs["fake"], real)
                    ps += float(jnp.sum(p))
                    ss += float(jnp.sum(s))
                    n += int(p.shape[0])
                if n == 0:
                    return {}
                return {"val_PSNR": ps / n, "val_SSIM": ss / n}

    n_epochs = epochs if epochs is not None else (
        opt.niter if opt.no_decay else opt.niter + opt.niter_decay)
    state = run_training(opt, loader, step_fn, state, n_epochs, save_fn,
                         visuals_fn, eval_fn=eval_fn, start_epoch=start_epoch,
                         mesh=mesh)
    return state


# ----------------------------------------------------------------------
# stage 1: person-agnostic UV pretrain (pre_train.py)
# ----------------------------------------------------------------------

def run_pretrain_uv(opt, epochs: Optional[int] = None):
    ds = _dataset(opt, "train")
    loader = dsm.BatchLoader(ds, _local_batch_size(opt), seed=opt.seed,
                             threads=opt.nThreads,
                             transform=pack_batch if opt.wire_pack else None)
    dtype = jnp.bfloat16 if opt.dtype == "bfloat16" else jnp.float32
    transg = TransG(opt.n_parts, opt.ngf, opt.n_downsample_translate,
                    opt.n_blocks_translate, netG=opt.netG,
                    n_local_enhancers=opt.n_local_enhancers,
                    n_blocks_local=opt.n_blocks_local, stem_s2d=opt.stem_s2d,
                    head_s2d=opt.head_s2d, uv_refine=opt.uv_refine,
                    uv_refine_ngf=opt.uv_refine_ngf, ms_uv=opt.ms_uv,
                    pad_mode=opt.pad_mode,
                    upsample_mode=opt.upsample_mode, dtype=dtype)
    S = opt.train_size
    params = transg.init(jax.random.PRNGKey(opt.seed),
                         jnp.zeros((1, S, S, opt.pose_nc)))["params"]
    tx = make_optimizer(opt, len(loader))
    opt_state = tx.init(params)
    run_dir = opt.run_dir

    start_epoch = 1
    if opt.continue_train:
        ep = ckpt.latest_epoch(run_dir, "TransG")
        if ep is not None or ckpt.has_latest(run_dir, "TransG"):
            params = ckpt.load_net(run_dir, "TransG", "latest", params)
            if ep is None:
                # iteration-only 'latest' save: the sidecar anchor carries
                # the last completed epoch (0 for pre-anchor saves: warm
                # weights, schedule restarts — loudly)
                anchor = ckpt.load_epoch_anchor(run_dir)
                ep = anchor if anchor is not None else 0
                if anchor is None:
                    print("[ckpt] resume: latest-only save with no epoch "
                          "anchor; keeping weights, restarting schedule at 1",
                          flush=True)
            start_epoch = int(ep) + 1
            if jax.process_index() == 0:
                prune_metrics_after(run_dir, start_epoch - 1)
            print(f"[ckpt] resumed at epoch {start_epoch}", flush=True)

    mesh = _maybe_mesh(opt)
    carry0 = (params, opt_state)
    if mesh is not None:
        carry0 = replicate(mesh, carry0)

    step = make_pretrain_uv_step(opt, transg, tx)

    def step_fn(carry, batch):
        params, opt_state = carry
        params, opt_state, losses = step(params, opt_state,
                                         _device_batch(batch))
        return (params, opt_state), losses

    def save_fn(carry, epoch, completed=None):
        ckpt.save_net(run_dir, "TransG", epoch, carry[0])
        anchor = epoch if str(epoch).isdigit() else completed
        if anchor is not None:
            ckpt.save_epoch_anchor(run_dir, int(anchor))
        print(f"[ckpt] saved epoch {epoch} -> {run_dir}", flush=True)

    n_epochs = epochs if epochs is not None else opt.niter
    return run_training(opt, loader, step_fn, carry0, n_epochs,
                        save_fn, start_epoch=start_epoch, mesh=mesh)


# ----------------------------------------------------------------------
# optional stage: texture pretrain (pre_train_tex.py)
# ----------------------------------------------------------------------

class _TexDataset:
    """Wraps a base dataset, adding per-frame part-texture GT.

    Real data: part_texture_path dir of per-frame atlas images (reference:
    pre_train_tex.sh:8). Synthetic: GT = static atlas + deterministic wave.
    """

    def __init__(self, opt, base):
        self.opt = opt
        self.base = base
        self.files = (sorted(os.listdir(opt.part_texture_path))
                      if opt.part_texture_path and os.path.isdir(opt.part_texture_path)
                      else [])
        # optional pose-conditioned texture GT (reference: pre_train_tex.sh:9)
        self.pose_tex_files = (sorted(os.listdir(opt.pose_texture_path))
                               if opt.pose_texture_path and os.path.isdir(opt.pose_texture_path)
                               else [])
        self._static = (base.texture_atlas() if hasattr(base, "texture_atlas")
                        else np.zeros((opt.n_parts, opt.tex_tile, opt.tex_tile, 3),
                                      np.float32))

    def __len__(self):
        return len(self.base)

    @property
    def epoch(self):
        return getattr(self.base, "epoch", 0)

    @epoch.setter
    def epoch(self, value):
        # forward BatchLoader's per-epoch advance to the wrapped dataset so
        # its deterministic (seed, epoch, index) augmentation RNG varies
        # across epochs
        if hasattr(self.base, "epoch"):
            self.base.epoch = value

    def __getitem__(self, k):
        s = self.base[k]
        if self.files:
            path = os.path.join(self.opt.part_texture_path,
                                self.files[min(int(s["index"]), len(self.files) - 1)])
            s["part_texture"] = dsm.load_texture_atlas(
                path, self.opt.tex_tile, self.opt.tex_rows, self.opt.tex_cols)
            if self.pose_tex_files:
                p2 = os.path.join(self.opt.pose_texture_path,
                                  self.pose_tex_files[min(int(s["index"]),
                                                          len(self.pose_tex_files) - 1)])
                s["pose_texture"] = dsm.load_texture_atlas(
                    p2, self.opt.tex_tile, self.opt.tex_rows, self.opt.tex_cols)
        else:
            i = int(s["index"])
            s["part_texture"] = np.clip(
                self._static + 0.1 * np.sin(0.3 * i), -1, 1).astype(np.float32)
        return s


def run_pretrain_tex(opt, epochs: Optional[int] = None):
    base = _dataset(opt, "train")
    ds = _TexDataset(opt, base)
    loader = dsm.BatchLoader(ds, _local_batch_size(opt), seed=opt.seed,
                             threads=opt.nThreads,
                             transform=pack_batch if opt.wire_pack else None)
    tex, _ = _assets(opt, base)
    dtype = jnp.bfloat16 if opt.dtype == "bfloat16" else jnp.float32
    texg = TexG(opt.n_parts, opt.tex_tile, opt.ngf_global,
                opt.n_downsample_global, opt.n_blocks_global,
                netG=opt.netG, n_local_enhancers=opt.n_local_enhancers,
                n_blocks_local=opt.n_blocks_local,
                stem_s2d=opt.stem_s2d, head_s2d=opt.head_s2d,
                pad_mode=opt.pad_mode, upsample_mode=opt.upsample_mode,
                dtype=dtype)
    S = opt.train_size
    params = texg.init(jax.random.PRNGKey(opt.seed),
                       jnp.zeros((1, S, S, opt.pose_nc)))["params"]
    tx = make_optimizer(opt, len(loader))
    opt_state = tx.init(params)
    run_dir = opt.run_dir

    start_epoch = 1
    if opt.continue_train:
        ep = ckpt.latest_epoch(run_dir, "TexG")
        if ep is not None or ckpt.has_latest(run_dir, "TexG"):
            params = ckpt.load_net(run_dir, "TexG", "latest", params)
            if ep is None:
                anchor = ckpt.load_epoch_anchor(run_dir)
                ep = anchor if anchor is not None else 0
                if anchor is None:
                    print("[ckpt] resume: latest-only save with no epoch "
                          "anchor; keeping weights, restarting schedule at 1",
                          flush=True)
            start_epoch = int(ep) + 1
            if jax.process_index() == 0:
                prune_metrics_after(run_dir, start_epoch - 1)
            print(f"[ckpt] resumed at epoch {start_epoch}", flush=True)

    mesh = _maybe_mesh(opt)
    carry0 = (params, opt_state)
    if mesh is not None:
        carry0 = replicate(mesh, carry0)

    step = make_pretrain_tex_step(opt, texg, tx, tex, _tex_mask(opt, tex))

    def step_fn(carry, batch):
        params, opt_state = carry
        params, opt_state, losses = step(params, opt_state,
                                         _device_batch(batch))
        return (params, opt_state), losses

    def save_fn(carry, epoch, completed=None):
        ckpt.save_net(run_dir, "TexG", epoch, carry[0])
        anchor = epoch if str(epoch).isdigit() else completed
        if anchor is not None:
            ckpt.save_epoch_anchor(run_dir, int(anchor))
        print(f"[ckpt] saved epoch {epoch} -> {run_dir}", flush=True)

    n_epochs = epochs if epochs is not None else opt.niter
    return run_training(opt, loader, step_fn, carry0, n_epochs,
                        save_fn, start_epoch=start_epoch, mesh=mesh)
