"""Observability artifacts (SURVEY.md §2 #22, §5): the exact reference
contract — console loss lines, web/index.html gallery, logs/ scalars when
--tf_log, opt.txt dump."""

import dataclasses
import json
import os

import numpy as np

from neural_human_video_rendering_tpu.utils.html import HTMLGallery
from neural_human_video_rendering_tpu.utils.visualizer import Visualizer


def _opt(tiny_opt, tmp_path, **kw):
    return dataclasses.replace(tiny_opt, checkpoints_dir=str(tmp_path),
                               name="vistest", **kw)


def test_gallery_artifact(tmp_path):
    g = HTMLGallery(str(tmp_path / "web"), "t <unsafe>")
    g.add_images("epoch 1", [("synthesized", "a.jpg"), ("real", "b.jpg")])
    path = g.save()
    assert path.endswith("web/index.html")
    page = open(path).read()
    assert "t &lt;unsafe&gt;" in page
    assert "images/a.jpg" in page and "images/b.jpg" in page
    assert os.path.isdir(os.path.join(str(tmp_path / "web"), "images"))


def test_visualizer_console_and_images(tiny_opt, tmp_path, capsys):
    opt = _opt(tiny_opt, tmp_path)
    v = Visualizer(opt)
    v.log_losses(epoch=1, it=10, losses={"G_total": 1.5, "D_total": 0.25}, step=10)
    out = capsys.readouterr().out
    assert "epoch: 1" in out and "G_total: 1.5000" in out

    img = np.zeros((8, 8, 3), np.float32)
    v.display_results({"fake": img, "real": img}, epoch=1, step=10)
    v.close()
    index = os.path.join(opt.run_dir, "web", "index.html")
    assert os.path.isfile(index)
    assert "epoch001_step10_fake.jpg" in open(index).read()
    assert os.path.isfile(os.path.join(opt.run_dir, "web", "images",
                                       "epoch001_step10_fake.jpg"))


def test_tf_log_scalars(tiny_opt, tmp_path):
    opt = _opt(tiny_opt, tmp_path, tf_log=True)
    v = Visualizer(opt)
    v.log_losses(epoch=2, it=5, losses={"G_total": 3.0}, step=105)
    v.close()
    log_dir = os.path.join(opt.run_dir, "logs")
    assert os.path.isdir(log_dir)
    entries = os.listdir(log_dir)
    assert entries, "tf_log produced no artifacts"
    if "scalars.jsonl" in entries:   # JSONL fallback when tensorboard absent
        rec = json.loads(open(os.path.join(log_dir, "scalars.jsonl")).read().splitlines()[-1])
        assert rec == {"step": 105, "G_total": 3.0}


def test_opt_txt_dump(tiny_opt, tmp_path):
    opt = _opt(tiny_opt, tmp_path)
    opt.save()
    txt = open(os.path.join(opt.run_dir, "opt.txt")).read()
    assert txt.startswith("------------ Options -------------")
    assert "name: vistest" in txt and "loadSize: 32" in txt


def test_metrics_jsonl_always_written(tiny_opt, tmp_path):
    """Every logged scalar lands in {run_dir}/metrics.jsonl (the quality
    harness reads val curves from it) even without --tf_log."""
    import dataclasses
    import json
    import os
    from neural_human_video_rendering_tpu.utils.visualizer import Visualizer

    opt = dataclasses.replace(tiny_opt, name="mj",
                              checkpoints_dir=str(tmp_path))
    vis = Visualizer(opt)
    vis.log_losses(1, 5, {"G_total": 2.5}, step=10)
    vis.log_losses(2, -1, {"val_PSNR": 21.0, "val_SSIM": 0.5}, step=20)
    vis.close()
    recs = [json.loads(l) for l in
            open(os.path.join(opt.run_dir, "metrics.jsonl"))]
    assert recs[0] == {"epoch": 1, "it": 5, "step": 10, "G_total": 2.5}
    assert recs[1]["val_PSNR"] == 21.0 and recs[1]["epoch"] == 2
