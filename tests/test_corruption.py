"""Pseudo-GT corruption (data/corruption.py + write_corpus(corrupt=...)):
the noisy-supervision regime for the refinement A/B (tools/noisy_gt_ab.py).
"""

import os

import numpy as np
import pytest

from neural_human_video_rendering_tpu.data import corruption as cr
from neural_human_video_rendering_tpu.data import synthetic_video as sv


@pytest.fixture(scope="module")
def scene():
    S = 96
    joints = sv.load_reference_joints("/root/reference/keypoints", S)[0]
    parts, uv, _ = sv.rasterize_iuv(joints, S)
    mask = (parts > 0).astype(np.float32)
    return S, parts, uv, mask


def _iou(a, b):
    a, b = a > 0.5, b > 0.5
    return np.sum(a & b) / max(np.sum(a | b), 1)


def test_mask_corruption_degrades_and_is_deterministic(scene):
    S, parts, uv, mask = scene
    c1 = cr.corrupt_mask(mask, seed=0, frame=3, strength=0.6)
    c2 = cr.corrupt_mask(mask, seed=0, frame=3, strength=0.6)
    np.testing.assert_array_equal(c1, c2)
    assert _iou(c1, mask) < 0.98                 # actually corrupted
    assert _iou(c1, mask) > 0.3                  # still recognizably the person
    other = cr.corrupt_mask(mask, seed=0, frame=4, strength=0.6)
    assert not np.array_equal(c1, other)         # varies per frame


def test_mask_corruption_monotone_in_strength(scene):
    S, parts, uv, mask = scene
    ious = [np.mean([_iou(cr.corrupt_mask(mask, 0, f, s), mask)
                     for f in range(6)])
            for s in (0.2, 0.6, 1.0)]
    assert ious[0] > ious[-1], ious
    assert cr.corrupt_mask(mask, 0, 0, 0.0) is mask


def test_iuv_corruption(scene):
    S, parts, uv, mask = scene
    pc, uc = cr.corrupt_iuv(parts, uv, seed=1, frame=2, strength=0.6)
    assert pc.shape == parts.shape and uc.shape == uv.shape
    assert (pc != parts).mean() > 0.001          # parts moved/eroded
    body = (pc > 0) & (parts > 0)
    assert np.abs(uc[body] - uv[body]).mean() > 1e-4   # UV quantized/jittered
    assert np.abs(uc[body] - uv[body]).mean() < 0.2    # but still close
    assert np.all(uc[pc == 0] == 0)              # background convention kept
    # valid part ids only
    assert pc.min() >= 0 and pc.max() <= 24


def test_bg_corruption_smears_occupied_region(scene):
    S, parts, uv, mask = scene
    bg = sv.background_image(S)
    occ = cr.occupancy(mask * 10, 10)
    out = cr.corrupt_bg(bg, occ, seed=0, strength=0.6)
    assert out.shape == bg.shape and out.dtype == np.float32
    inside = np.abs(out - bg)[occ > 0].mean()
    assert inside > 0.02                         # inpaint smear visible
    assert np.abs(out).max() <= 1.0


def test_write_corpus_corrupt_keeps_frames_true(tmp_path):
    import cv2
    S = 64
    joints = sv.load_reference_joints("/root/reference/keypoints", S)[:4]
    clean_d, noisy_d = str(tmp_path / "c"), str(tmp_path / "n")
    sv.write_corpus(clean_d, joints, size=S, tile=16)
    sv.write_corpus(noisy_d, joints, size=S, tile=16, corrupt=0.6)
    for i in range(4):
        f = f"frame{i:05d}.png"
        a = cv2.imread(os.path.join(clean_d, "frames", f))
        b = cv2.imread(os.path.join(noisy_d, "frames", f))
        np.testing.assert_array_equal(a, b)      # frames are observations
        ma = cv2.imread(os.path.join(clean_d, "mask", f), 0)
        mb = cv2.imread(os.path.join(noisy_d, "mask", f), 0)
        assert not np.array_equal(ma, mb)        # pseudo-GT is corrupted
        da = cv2.imread(os.path.join(clean_d, "densepose", f))
        db = cv2.imread(os.path.join(noisy_d, "densepose", f))
        assert not np.array_equal(da, db)
    bga = cv2.imread(os.path.join(clean_d, "bg.jpg"))
    bgb = cv2.imread(os.path.join(noisy_d, "bg.jpg"))
    assert not np.array_equal(bga, bgb)


def test_corrupt_corpus_atlas_is_unfolded_from_noisy_iuv(tmp_path):
    """The corrupted corpus's texture.png must be DERIVED (unfold over the
    corrupted IUV + true frames, the reference's provenance), not the
    generating truth."""
    import cv2
    S = 64
    joints = sv.load_reference_joints("/root/reference/keypoints", S)[:6]
    clean_d, noisy_d = str(tmp_path / "c"), str(tmp_path / "n")
    sv.write_corpus(clean_d, joints, size=S, tile=16)
    sv.write_corpus(noisy_d, joints, size=S, tile=16, corrupt=0.6)
    a = cv2.imread(os.path.join(clean_d, "texture.png"))
    b = cv2.imread(os.path.join(noisy_d, "texture.png"))
    assert a.shape == b.shape                    # same 4x6 grid contract
    assert not np.array_equal(a, b)
    # ...but still correlated with the truth: the unfold recovers most of
    # the atlas despite the IUV noise (it averages over frames)
    diff = np.abs(a.astype(np.float32) - b.astype(np.float32)) / 255.0
    assert diff.mean() < 0.35, diff.mean()
