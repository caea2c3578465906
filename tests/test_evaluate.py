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


# ------------------------------------------------- temporal flicker metric

def _write_video(d, base, motion=0.0, flicker=0.0, n=6, seed=5):
    """Frames = base pattern shifted by `motion` px/frame, plus an
    alternating global brightness offset of `flicker`."""
    os.makedirs(d, exist_ok=True)
    names = [f"frame{i:05d}.png" for i in range(n)]
    for i, name in enumerate(names):
        img = np.roll(base, int(round(i * motion)), axis=1)
        img = img + (flicker if i % 2 else -flicker)
        save_image(os.path.join(d, name), np.clip(img, -1, 1))
    return names


def test_temporal_identical_dirs_ratio_one(tmp_path):
    rng = np.random.default_rng(7)
    base = rng.uniform(-0.6, 0.6, (32, 32, 3)).astype(np.float32)
    d = str(tmp_path / "v")
    _write_video(d, base, motion=1.0)
    res = ev.evaluate_dirs(d, d, size=32, batch_size=4, use_vgg=False,
                           use_temporal=True)
    assert res["flicker_ratio"] == pytest.approx(1.0)
    assert res["temporal_l1"] == pytest.approx(res["temporal_l1_gt"])
    assert res["temporal_l1"] > 0       # the sequence does move


def test_temporal_flicker_detected_and_smoothing_detected(tmp_path):
    # smooth base: 1px motion of white noise would already saturate the
    # temporal L1 and hide the flicker signal
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 32
    base = (0.6 * np.stack([np.sin(4 * xx), np.cos(3 * yy),
                            np.sin(2 * (xx + yy))], -1)).astype(np.float32)
    gt = str(tmp_path / "gt")
    _write_video(gt, base, motion=1.0)
    flick = str(tmp_path / "flick")     # same motion + alternating offset
    _write_video(flick, base, motion=1.0, flicker=0.15)
    frozen = str(tmp_path / "frozen")   # no motion at all
    _write_video(frozen, base, motion=0.0)
    r_f = ev.evaluate_dirs(flick, gt, size=32, batch_size=4, use_vgg=False,
                           use_temporal=True)
    r_s = ev.evaluate_dirs(frozen, gt, size=32, batch_size=4, use_vgg=False,
                           use_temporal=True)
    assert r_f["flicker_ratio"] > 1.5, r_f
    assert r_s["flicker_ratio"] < 0.3, r_s


def test_temporal_cli(tmp_path, capsys):
    rng = np.random.default_rng(9)
    base = rng.uniform(-0.6, 0.6, (32, 32, 3)).astype(np.float32)
    a = str(tmp_path / "a")
    _write_video(a, base, motion=1.0)
    res = ev.main(["--results_dir", a, "--gt_dir", a, "--loadSize", "32",
                   "--no_vgg", "--metric", "temporal"])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "flicker_ratio" in line and "temporal_l1" in res
