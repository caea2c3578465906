"""--resize_or_crop resize_and_crop / --fineSize: aligned random crops of
every modality (pix2pixHD crop modes; the reference launchers use plain
resize, train_start/pretrain_start.sh:24, so crop is capability-parity)."""

import dataclasses
import json
import os

import numpy as np
import pytest

from neural_human_video_rendering_tpu.data import dataset as dsm
from neural_human_video_rendering_tpu.utils.image import save_image


def _make_corpus(root, n=4, size=40):
    os.makedirs(f"{root}/img", exist_ok=True)
    os.makedirs(f"{root}/pose", exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        save_image(f"{root}/img/frame{i:05d}.png",
                   rng.uniform(-1, 1, (size, size, 3)).astype(np.float32))
        body = np.zeros((25, 3), np.float32)
        body[:, 0] = rng.uniform(5, size - 5, 25)
        body[:, 1] = rng.uniform(5, size - 5, 25)
        body[:, 2] = 1.0
        with open(f"{root}/pose/frame{i:05d}_keypoints.json", "w") as f:
            json.dump({"people": [{"pose_keypoints_2d":
                                   body.reshape(-1).tolist()}]}, f)
    save_image(f"{root}/bg.jpg",
               rng.uniform(-1, 1, (size, size, 3)).astype(np.float32))


def test_crop_alignment(tiny_opt, tmp_path, monkeypatch):
    root = str(tmp_path)
    _make_corpus(root, size=40)
    opt = dataclasses.replace(
        tiny_opt, loadSize=40, fineSize=32, resize_or_crop="resize_and_crop",
        img_path=f"{root}/img", pose_path=f"{root}/pose",
        bg_path=f"{root}/bg.jpg")
    assert opt.train_size == 32

    ds = dsm.FrameDataset(opt, "train")
    s = ds[1]
    assert s["image"].shape == (32, 32, 3)
    assert s["bg"].shape == (32, 32, 3)

    # crop offsets are a deterministic function of (seed, epoch, index):
    # replay the dataset's generator to know the window
    rng = np.random.default_rng((opt.seed, 0, 1))
    oy = int(rng.integers(0, 40 - 32 + 1))
    ox = int(rng.integers(0, 40 - 32 + 1))
    full = dsm.load_image(f"{root}/img/frame00001.png", 40)
    np.testing.assert_allclose(s["image"], full[oy:oy + 32, ox:ox + 32],
                               atol=1e-6)
    bg_full = dsm.load_image(f"{root}/bg.jpg", 40)
    np.testing.assert_allclose(s["bg"], bg_full[oy:oy + 32, ox:ox + 32],
                               atol=1e-6)
    # same sample fetched again (any thread/order) -> identical crop
    np.testing.assert_array_equal(s["image"], ds[1]["image"])

    # joints shifted by the same offset
    ds_plain = dsm.FrameDataset(
        dataclasses.replace(opt, resize_or_crop="resize", fineSize=40), "train")
    j_plain = ds_plain[1]["joints"]
    np.testing.assert_allclose(s["joints"][:, 0], j_plain[:, 0] - ox, atol=1e-5)
    np.testing.assert_allclose(s["joints"][:, 1], j_plain[:, 1] - oy, atol=1e-5)

    # eval phase: deterministic CENTER crop (no augmentation noise in the
    # held-out metrics, ADVICE r1 #5)
    ds_eval = dsm.FrameDataset(dataclasses.replace(opt, data_ratio=0.5), "test")
    se = ds_eval[0]
    i_full = dsm.load_image(
        f"{root}/img/frame{int(se['index']):05d}.png", 40)
    np.testing.assert_allclose(se["image"], i_full[4:36, 4:36], atol=1e-6)


def test_train_step_with_crop_bg(tiny_opt, tmp_path):
    """Crop-mode batches carry per-sample bg; the full G+D step runs on it."""
    import jax
    from neural_human_video_rendering_tpu.train import steps as st
    from neural_human_video_rendering_tpu.train.state import create_train_state
    import jax.numpy as jnp

    root = str(tmp_path)
    _make_corpus(root, size=40)
    opt = dataclasses.replace(
        tiny_opt, loadSize=40, fineSize=32, resize_or_crop="resize_and_crop",
        img_path=f"{root}/img", pose_path=f"{root}/pose",
        bg_path=f"{root}/bg.jpg", lambda_L2=500, no_vgg_loss=True)
    ds = dsm.FrameDataset(opt, "train")
    batch = {k: jnp.asarray(v)
             for k, v in dsm.collate([ds[0], ds[1]]).items()}
    assert batch["bg"].shape == (2, 32, 32, 3)

    tex = np.zeros((opt.n_parts, opt.tex_tile, opt.tex_tile, 3), np.float32)
    bg = np.zeros((opt.train_size, opt.train_size, 3), np.float32)
    bundle = create_train_state(opt, jax.random.PRNGKey(0), tex, bg)
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    _, metrics = step(bundle["state"], batch)
    assert np.isfinite(float(metrics["G_total"]))
