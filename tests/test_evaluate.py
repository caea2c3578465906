"""Quality-parity eval (evaluate.py): pairing, metric values, CLI output."""

import json
import os

import numpy as np
import pytest

from neural_human_video_rendering_tpu.infer import evaluate as ev
from neural_human_video_rendering_tpu.utils.image import save_image


def _write_frames(d, names, rng, noise=0.0):
    os.makedirs(d, exist_ok=True)
    imgs = {}
    for i, n in enumerate(names):
        img = rng.uniform(-0.8, 0.8, (32, 32, 3)).astype(np.float32)
        imgs[n] = img
        save_image(os.path.join(d, n), np.clip(img + noise * rng.standard_normal(img.shape), -1, 1))
    return imgs


def test_pair_frames_by_number(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    rng = np.random.default_rng(0)
    _write_frames(a, ["frame00002_synthesized.jpg", "frame00001_synthesized.jpg"], rng)
    _write_frames(b, ["frame00001.png", "frame00002.png", "frame00009.png"], rng)
    pairs = ev.pair_frames(a, b)
    assert pairs == [("frame00001_synthesized.jpg", "frame00001.png"),
                     ("frame00002_synthesized.jpg", "frame00002.png")]


def test_identical_dirs_perfect_scores(tmp_path):
    a = str(tmp_path / "a")
    rng = np.random.default_rng(1)
    _write_frames(a, [f"frame{i:05d}.png" for i in range(3)], rng)
    res = ev.evaluate_dirs(a, a, size=32, batch_size=2, use_vgg=False)
    assert res["frames"] == 3
    assert res["psnr"] > 45.0          # identical up to uint8 quantization
    assert res["ssim"] > 0.99


def test_noisy_copy_scores_lower_and_cli(tmp_path, capsys):
    a, b = str(tmp_path / "clean"), str(tmp_path / "noisy")
    rng = np.random.default_rng(2)
    names = [f"frame{i:05d}.png" for i in range(4)]
    _write_frames(a, names, rng)
    rng2 = np.random.default_rng(2)   # same base images, plus noise
    _write_frames(b, names, rng2, noise=0.2)
    clean = ev.evaluate_dirs(a, a, size=32, batch_size=4, use_vgg=False)
    noisy = ev.evaluate_dirs(b, a, size=32, batch_size=4, use_vgg=True)
    assert noisy["psnr"] < clean["psnr"]
    assert noisy["ssim"] < clean["ssim"]
    assert noisy["vgg_dist"] > 0.0

    out = str(tmp_path / "m.json")
    ev.main(["--results_dir", b, "--gt_dir", a, "--loadSize", "32",
             "--batch_size", "4", "--no_vgg", "--out", out])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["frames"] == 4
    assert json.load(open(out))["psnr"] == pytest.approx(parsed["psnr"])
