"""Resume-time metrics.jsonl dedup (VERDICT r4 next #8).

A --continue_train resume restarts from the last SAVED epoch, which can be
older than the last LOGGED epoch (round-4 combouvr died after epoch 100
with its latest save at 60, then re-logged 61-100 on resume). The fix:
prune_metrics_after drops records from epochs about to be re-run, called at
every resume site, so curves keep one record set per epoch.
"""

import dataclasses
import json
import os

from neural_human_video_rendering_tpu.utils.visualizer import (
    prune_metrics_after)


def _write_jsonl(path, recs):
    with open(path, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


def test_prune_drops_only_future_epochs(tmp_path):
    run = str(tmp_path)
    recs = ([{"epoch": e, "it": 0, "step": e, "G_total": 1.0}
             for e in range(1, 8)]
            + [{"note": "no epoch field survives"}])
    _write_jsonl(os.path.join(run, "metrics.jsonl"), recs)
    dropped = prune_metrics_after(run, 4)
    assert dropped == 3
    kept = [json.loads(l) for l in open(os.path.join(run, "metrics.jsonl"))]
    assert [r.get("epoch") for r in kept] == [1, 2, 3, 4, None]


def test_prune_noop_cases(tmp_path):
    run = str(tmp_path)
    assert prune_metrics_after(run, 5) == 0      # no file
    _write_jsonl(os.path.join(run, "metrics.jsonl"),
                 [{"epoch": 1}, {"epoch": 2}])
    before = open(os.path.join(run, "metrics.jsonl")).read()
    assert prune_metrics_after(run, 2) == 0      # nothing past the cut
    assert open(os.path.join(run, "metrics.jsonl")).read() == before


def test_prune_keeps_unparseable_lines(tmp_path):
    run = str(tmp_path)
    p = os.path.join(run, "metrics.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"epoch": 1}) + "\n")
        f.write("not json at all\n")
        f.write(json.dumps({"epoch": 2}) + "\n")
    assert prune_metrics_after(run, 1) == 1
    lines = open(p).read().splitlines()
    assert lines[1] == "not json at all" and len(lines) == 2


def test_train_resume_has_unique_epochs(tiny_opt, tmp_path):
    """Integration: kill-after-save scenario on the real stage-2 driver.
    Train 2 epochs, fake a dead continuation's epoch-3 log lines, resume
    with a 3-epoch schedule -> epoch 3 re-runs and appears ONCE."""
    from neural_human_video_rendering_tpu.train.drivers import run_train

    base = dataclasses.replace(
        tiny_opt, checkpoints_dir=str(tmp_path), name="dedup",
        niter=2, no_decay=True, save_epoch_freq=1, print_freq=1,
        display_freq=10 ** 9, no_html=True, no_vgg_loss=True,
        lambda_L2=10.0, data_ratio=1.0)
    run_train(base)
    mpath = os.path.join(base.run_dir, "metrics.jsonl")
    with open(mpath, "a") as f:   # the continuation that died un-saved
        f.write(json.dumps({"epoch": 3, "it": 0, "step": 9,
                            "G_total": 1.0}) + "\n")
        f.write(json.dumps({"epoch": 3, "it": -1, "step": 9,
                            "val_PSNR": 11.0}) + "\n")

    res = dataclasses.replace(base, continue_train=True, niter=3)
    run_train(res)
    recs = [json.loads(l) for l in open(mpath)]
    # both faked lines are gone (epoch 3 was re-run, its dead-continuation
    # records dropped at resume time)
    assert not any(r.get("epoch") == 3 and "val_PSNR" in r for r in recs)
    assert not any(r.get("epoch") == 3 and r.get("step") == 9 for r in recs)
    # every (epoch, it, step) combination appears exactly once
    keys = [(r.get("epoch"), r.get("it"), r.get("step")) for r in recs]
    assert len(keys) == len(set(keys))
    # and epoch 3 really trained: fresh records exist for it
    assert any(r.get("epoch") == 3 and "G_total" in r for r in recs)


# ---- retroactive whole-file dedup (round-5: restart with pre-fix binary) ----

from neural_human_video_rendering_tpu.utils.visualizer import dedup_metrics


def _loss(e, s):
    return {"epoch": e, "it": 0, "step": s, "G_total": 1.0}


def _val(e, s):
    return {"epoch": e, "it": -1, "step": s, "val_PSNR": 20.0 + e}


def test_dedup_full_restart_keeps_only_final_series(tmp_path):
    run = str(tmp_path)
    a = [r for e in range(1, 6) for r in (_loss(e, e * 3), _val(e, e * 3))]
    b = [r for e in range(1, 8) for r in (_loss(e, e * 3), _val(e, e * 3))]
    _write_jsonl(os.path.join(run, "metrics.jsonl"), a + b)
    assert dedup_metrics(run) == len(a)
    recs = [json.loads(l) for l in open(os.path.join(run, "metrics.jsonl"))]
    assert [r["epoch"] for r in recs if "val_PSNR" in r] == list(range(1, 8))
    keys = [(r["epoch"], r["it"], r["step"]) for r in recs]
    assert len(keys) == len(set(keys))


def test_dedup_resume_keeps_prefix_plus_continuation(tmp_path):
    run = str(tmp_path)
    a = [_val(e, e * 3) for e in range(1, 11)]       # died after save@5
    b = [_val(e, e * 3) for e in range(6, 13)]       # resumed from 5
    _write_jsonl(os.path.join(run, "metrics.jsonl"), a + b)
    assert dedup_metrics(run) == 5                    # stale 6..10 dropped
    recs = [json.loads(l) for l in open(os.path.join(run, "metrics.jsonl"))]
    assert [r["epoch"] for r in recs] == list(range(1, 13))


def test_dedup_clean_file_untouched(tmp_path):
    run = str(tmp_path)
    recs = [r for e in range(1, 5) for r in
            (_loss(e, e * 3 - 1), _loss(e, e * 3), _val(e, e * 3))]
    _write_jsonl(os.path.join(run, "metrics.jsonl"), recs)
    before = open(os.path.join(run, "metrics.jsonl")).read()
    assert dedup_metrics(run) == 0
    assert open(os.path.join(run, "metrics.jsonl")).read() == before


def test_dedup_same_epoch_restart_via_step_reset(tmp_path):
    run = str(tmp_path)
    a = [_loss(1, 1), _loss(1, 2), _loss(2, 3)]
    b = [_loss(2, 1), _loss(3, 2)]                    # re-ran epoch 2
    _write_jsonl(os.path.join(run, "metrics.jsonl"), a + b)
    assert dedup_metrics(run) == 1                    # stale epoch-2 line
    recs = [json.loads(l) for l in open(os.path.join(run, "metrics.jsonl"))]
    assert [(r["epoch"], r["step"]) for r in recs] == [
        (1, 1), (1, 2), (2, 1), (3, 2)]
