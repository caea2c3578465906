"""End-to-end pipeline: stage-1 UV pretrain -> stage-2 training (restoring
the stage-1 TransG) -> inference from the stage-2 checkpoint -> quality
eval. One test proving every stage composes through real artifacts on disk
(the reference's full workflow, SURVEY.md §3.1-3.3)."""

import dataclasses
import json
import os

import numpy as np

from neural_human_video_rendering_tpu.infer.evaluate import evaluate_dirs
from neural_human_video_rendering_tpu.infer.test_driver import run_inference
from neural_human_video_rendering_tpu.train.drivers import (run_pretrain_uv,
                                                            run_train)


def _write_driving_keypoints(d, n=5, size=48):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(3)
    for i in range(n):
        body = np.zeros((25, 3), np.float32)
        body[:, 0] = rng.uniform(8, size - 8, 25)
        body[:, 1] = rng.uniform(8, size - 8, 25)
        body[:, 2] = 1.0
        with open(os.path.join(d, f"frame{i:05d}_keypoints.json"), "w") as f:
            json.dump({"people": [{"pose_keypoints_2d":
                                   body.reshape(-1).tolist()}]}, f)


def test_full_pipeline(tiny_opt, tmp_path):
    ck = str(tmp_path / "ckpt")
    common = dict(checkpoints_dir=ck, niter=1, no_decay=True,
                  save_epoch_freq=1, print_freq=100, display_freq=10 ** 9,
                  no_html=True)

    # stage 1: person-agnostic UV pretrain
    opt1 = dataclasses.replace(tiny_opt, name="uv", batchSize=2, **common)
    run_pretrain_uv(opt1)
    assert os.path.isfile(os.path.join(ck, "uv", "1_net_TransG.msgpack"))

    # stage 2: end-to-end, restoring the stage-1 TransG
    opt2 = dataclasses.replace(
        tiny_opt, name="e2e", batchSize=2, lambda_L2=500, lambda_UV=1000,
        lambda_Prob=10, lambda_Temp=500, use_densepose_loss=True,
        no_vgg_loss=True, load_pretrain_TransG=os.path.join(ck, "uv"),
        which_epoch_TransG="1", **common)
    run_train(opt2)
    for label in ("G", "D", "TransG"):
        assert os.path.isfile(os.path.join(ck, "e2e", f"1_net_{label}.msgpack"))

    # inference from the stage-2 checkpoint on a driving sequence
    pose_dir = str(tmp_path / "driving")
    _write_driving_keypoints(pose_dir, n=5, size=tiny_opt.loadSize)
    res = str(tmp_path / "out")
    opt3 = dataclasses.replace(
        tiny_opt, name="e2e", checkpoints_dir=ck, pose_path=pose_dir,
        results_dir=res, which_epoch="1", isTrain=False, no_html=False)
    written = run_inference(opt3, batch_size=2)
    assert written == 5
    imgs = os.listdir(os.path.join(res, "images"))
    assert len(imgs) == 5
    assert os.path.isfile(os.path.join(res, "index.html"))

    # eval CLI math over the rendered frames
    metrics = evaluate_dirs(os.path.join(res, "images"),
                            os.path.join(res, "images"),
                            size=tiny_opt.loadSize, batch_size=2,
                            use_vgg=False)
    assert metrics["frames"] == 5
    assert metrics["ssim"] > 0.99
