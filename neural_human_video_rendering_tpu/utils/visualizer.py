"""Training observability (SURVEY.md §2 #22; util/visualizer.py equivalent).

Keeps the reference's exact artifact contract:
  * console loss lines every --print_freq iters with time-per-iter;
  * HTML image gallery at {checkpoints_dir}/{name}/web/index.html
    every --display_freq iters (reference: README.md:82);
  * TensorBoard scalars + images under {checkpoints_dir}/{name}/logs when
    --tf_log (reference: README.md:83) — via torch.utils.tensorboard if
    importable, else a JSONL fallback at logs/scalars.jsonl so headless
    environments still record curves.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Mapping

import numpy as np

from .html import HTMLGallery
from .image import save_image, to_uint8


def prune_metrics_after(run_dir: str, last_kept_epoch: int) -> int:
    """Drop metrics.jsonl records from epochs about to be re-run.

    A --continue_train resume restarts from the last SAVED epoch, which can
    be older than the last LOGGED epoch (the continuation that died after
    its save). Without pruning, the re-trained epochs append a second copy
    of every loss/val line and the curve stops being machine-readable
    (round-4 combouvr logged epochs 61-100 twice). Called at resume time,
    before the Visualizer reopens the file in append mode: keeps records
    with epoch <= last_kept_epoch (and any without an epoch field), drops
    the dead continuation's. Atomic rewrite; returns #records dropped.
    """
    mpath = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(mpath):
        return 0
    kept, dropped = [], 0
    with open(mpath) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                kept.append(line)       # not ours to judge — keep
                continue
            if rec.get("epoch", 0) <= last_kept_epoch:
                kept.append(line)
            else:
                dropped += 1
    if dropped:
        with open(mpath + ".tmp", "w") as f:
            f.writelines(kept)
        os.replace(mpath + ".tmp", mpath)
        print(f"[metrics] pruned {dropped} record(s) past epoch "
              f"{last_kept_epoch} (re-running them after resume)", flush=True)
    return dropped


def dedup_metrics(run_dir: str) -> int:
    """Retroactively apply resume-prune semantics to a whole metrics.jsonl.

    For runs whose restart happened with a pre-fix binary (no prune at
    resume time), the file holds interleaved series — e.g. the round-5
    flagship replay logged epochs 1-106, silently restarted, and logged
    1-120 again. Replay the rule prune_metrics_after enforces online:
    whenever a record's epoch is below the max already kept, an (implicit)
    restart superseded everything from that epoch on — drop those earlier
    records. Never run this on a LIVE run dir (the trainer holds the file
    open in append mode; the atomic replace would orphan its handle).
    Returns #records dropped.
    """
    mpath = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(mpath):
        return 0
    kept, dropped = [], 0
    max_kept = 0
    last_step = -1
    for line in open(mpath):
        try:
            rec = json.loads(line)
        except ValueError:
            kept.append((None, line))   # not ours to judge — keep
            continue
        ep = rec.get("epoch")
        if ep is None:
            kept.append((None, line))
            continue
        step = rec.get("step")
        # multiple records legitimately share an epoch (loss lines + val),
        # so a restart is an epoch DECREASE, or the same epoch re-entered
        # with its step counter reset
        if ep < max_kept or (ep == max_kept and step is not None
                             and step < last_step):
            n = len(kept)
            kept = [(e, l) for e, l in kept if e is None or e < ep]
            dropped += n - len(kept)
            max_kept = ep
        else:
            max_kept = max(max_kept, ep)
        if step is not None:
            last_step = step
        kept.append((ep, line))
    if dropped:
        with open(mpath + ".tmp", "w") as f:
            f.writelines(l for _, l in kept)
        os.replace(mpath + ".tmp", mpath)
        print(f"[metrics] dedup: dropped {dropped} superseded record(s) "
              f"from {mpath}", flush=True)
    return dropped


class Visualizer:
    def __init__(self, opt):
        self.opt = opt
        self.run_dir = opt.run_dir
        self.web_dir = os.path.join(self.run_dir, "web")
        self.log_dir = os.path.join(self.run_dir, "logs")
        os.makedirs(self.run_dir, exist_ok=True)
        self.gallery = None
        if not opt.no_html:
            self.gallery = HTMLGallery(self.web_dir, f"Experiment {opt.name}",
                                       refresh=30 if opt.isTrain else 0)
        self.tb = None
        self.jsonl = None
        if opt.tf_log:
            os.makedirs(self.log_dir, exist_ok=True)
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(self.log_dir)
            except Exception:
                self.jsonl = open(os.path.join(self.log_dir, "scalars.jsonl"), "a")
        # always-on machine-readable curve (beyond the reference): every
        # logged scalar lands in {run_dir}/metrics.jsonl so eval
        # trajectories are recoverable without TensorBoard
        mpath = os.path.join(self.run_dir, "metrics.jsonl")
        try:
            # a run dir forked with `cp -al` shares this inode with its
            # parent; appending through it would pollute the parent's
            # curve — break the hardlink by rewriting a private copy
            if os.path.exists(mpath) and os.stat(mpath).st_nlink > 1:
                with open(mpath, "rb") as src:
                    data = src.read()
                with open(mpath + ".tmp", "wb") as dst:
                    dst.write(data)
                os.replace(mpath + ".tmp", mpath)
        except OSError:
            pass
        self.metrics_jsonl = open(mpath, "a")
        self._t0 = time.time()
        self._last_print = self._t0

    # -- scalars ------------------------------------------------------
    def log_losses(self, epoch: int, it: int, losses: Mapping[str, float],
                   step: int) -> None:
        losses = {k: float(v) for k, v in losses.items()}
        now = time.time()
        dt = now - self._last_print
        self._last_print = now
        msg = " ".join(f"{k}: {v:.4f}" for k, v in sorted(losses.items()))
        print(f"(epoch: {epoch}, iters: {it}, time: {dt:.3f}) {msg}", flush=True)
        if self.tb is not None:
            for k, v in losses.items():
                self.tb.add_scalar(f"loss/{k}", v, step)
        elif self.jsonl is not None:
            self.jsonl.write(json.dumps({"step": step, **losses}) + "\n")
            self.jsonl.flush()
        self.metrics_jsonl.write(json.dumps(
            {"epoch": epoch, "it": it, "step": step, **losses}) + "\n")
        self.metrics_jsonl.flush()

    # -- images -------------------------------------------------------
    def display_results(self, visuals: Mapping[str, np.ndarray], epoch: int,
                        step: int) -> None:
        """visuals: name -> (H,W,C) float image in [-1,1] (mask in [0,1])."""
        if self.gallery is None:
            return
        files = []
        for name, img in visuals.items():
            fname = f"epoch{epoch:03d}_step{step}_{name}.jpg"
            save_image(os.path.join(self.gallery.img_dir, fname),
                       np.asarray(img))
            files.append((name, fname))
            if self.tb is not None:
                self.tb.add_image(f"img/{name}", to_uint8(np.asarray(img)),
                                  step, dataformats="HWC")
        self.gallery.add_images(f"epoch {epoch}, step {step}", files)
        self.gallery.save()

    def close(self) -> None:
        if self.tb is not None:
            self.tb.close()
        if self.jsonl is not None:
            self.jsonl.close()
        self.metrics_jsonl.close()
