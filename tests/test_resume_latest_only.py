"""Resume from iteration-only 'latest' saves (round-5 post-mortem).

A run whose --save_epoch_freq lies beyond its horizon (e.g. the flagship
replay: save_epoch_freq 120 on a 120-epoch schedule) checkpoints ONLY via
--save_latest_freq iteration saves — no numeric {epoch}_net_* files exist
until the very end. The old resume keyed exclusively on numeric tags
(ckpt.latest_epoch), so --continue_train silently no-oped and restarted
from scratch, discarding 106 epochs of the round-5 flagship replay.

The fix has three layers, all pinned here:
  1. resume also triggers on latest_net_* presence (ckpt.has_latest);
  2. iteration saves anchor the state blob / sidecar to the last COMPLETED
     epoch, so resume knows its schedule position;
  3. pre-fix saves (anchor epoch -1) fall back to deriving the position
     from the restored global step: completed epochs = step // steps_per_epoch.
"""

import dataclasses
import glob
import json
import os

import flax.serialization as fser
import pytest

from neural_human_video_rendering_tpu.utils import checkpoint as ckpt


def test_has_latest_and_anchor_roundtrip(tmp_path):
    run = str(tmp_path)
    assert not ckpt.has_latest(run, "G")
    ckpt.save_net(run, "G", "latest", {"w": [1.0, 2.0]})
    assert ckpt.has_latest(run, "G")
    assert ckpt.latest_epoch(run, "G") is None   # no numeric tag

    assert ckpt.load_epoch_anchor(run) is None
    ckpt.save_epoch_anchor(run, 7)
    assert ckpt.load_epoch_anchor(run) == 7
    # corrupt sidecar degrades to None, not a crash
    with open(os.path.join(run, "latest_anchor.json"), "w") as f:
        f.write("not json")
    assert ckpt.load_epoch_anchor(run) is None


def _strip_numeric_saves(run_dir):
    """Simulate a kill before any epoch-boundary save: remove every
    numeric-tagged net file, keeping only the iteration 'latest' set."""
    for f in glob.glob(os.path.join(run_dir, "*_net_*.msgpack")):
        tag = os.path.basename(f).split("_net_")[0]
        if tag.isdigit():
            os.remove(f)


def _epochs_logged(run_dir):
    """Distinct epochs with training-loss records, plus a uniqueness check
    over (epoch, it, step) — duplicates mean a resume re-ran logged work."""
    recs = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    keys = [(r.get("epoch"), r.get("it"), r.get("step")) for r in recs]
    assert len(keys) == len(set(keys)), "duplicate records after resume"
    # training-loss records carry it >= 0 (epoch-end val records use -1)
    return sorted({r["epoch"] for r in recs if r.get("it", -1) >= 0})


@pytest.mark.slow
def test_train_resume_from_latest_only_saves(tiny_opt, tmp_path):
    from neural_human_video_rendering_tpu.train.drivers import run_train

    base = dataclasses.replace(
        tiny_opt, checkpoints_dir=str(tmp_path), name="latestonly",
        niter=2, no_decay=True, save_epoch_freq=100, save_latest_freq=2,
        print_freq=1, display_freq=10 ** 9, no_html=True, no_vgg_loss=True,
        lambda_L2=10.0, data_ratio=1.0)
    run_train(base)
    run = base.run_dir
    _strip_numeric_saves(run)
    assert ckpt.latest_epoch(run, "G") is None
    assert ckpt.has_latest(run, "G")

    # --- anchor path: the final save recorded epoch 2 in latest_state ---
    res = dataclasses.replace(base, continue_train=True, niter=3)
    run_train(res)
    eps = _epochs_logged(run)
    assert eps == [1, 2, 3], f"resume restarted or duplicated epochs: {eps}"

    # --- step-derivation path: pre-fix saves recorded epoch -1 ---
    _strip_numeric_saves(run)
    spath = os.path.join(run, "latest_state.msgpack")
    raw = fser.msgpack_restore(open(spath, "rb").read())
    raw["epoch"] = -1
    with open(spath, "wb") as f:
        f.write(fser.msgpack_serialize(raw))
    res4 = dataclasses.replace(base, continue_train=True, niter=4)
    run_train(res4)
    eps = _epochs_logged(run)
    assert eps == [1, 2, 3, 4], (
        f"step-derived resume restarted or duplicated epochs: {eps}")


@pytest.mark.slow
def test_pretrain_resume_from_latest_only_saves(tiny_opt, tmp_path):
    from neural_human_video_rendering_tpu.train.drivers import run_pretrain_uv

    base = dataclasses.replace(
        tiny_opt, checkpoints_dir=str(tmp_path), name="pre_latestonly",
        niter=2, no_decay=True, save_epoch_freq=100, save_latest_freq=2,
        print_freq=1, display_freq=10 ** 9, no_html=True)
    run_pretrain_uv(base)
    run = base.run_dir
    _strip_numeric_saves(run)
    assert ckpt.latest_epoch(run, "TransG") is None
    assert ckpt.has_latest(run, "TransG")
    # iteration saves wrote the sidecar anchor (last completed epoch >= 1)
    assert ckpt.load_epoch_anchor(run) is not None

    res = dataclasses.replace(base, continue_train=True, niter=3)
    run_pretrain_uv(res)
    eps = _epochs_logged(run)
    assert eps == [1, 2, 3], f"resume restarted or duplicated epochs: {eps}"
