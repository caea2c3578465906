"""synthetic_video corpus: the fabricated frames must be EXACTLY the model's
rendering equation applied to the on-disk IUV + texture + bg (so trained
quality metrics measure optimization, not an unreachable target)."""

import numpy as np
import pytest

from neural_human_video_rendering_tpu.data import dataset as dsm
from neural_human_video_rendering_tpu.data import synthetic_video as sv


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ref_keypoints_dir=None):
    root = str(tmp_path_factory.mktemp("svid"))
    kdir = "/root/reference/keypoints"
    import os
    if not os.path.isdir(kdir):
        pytest.skip("reference keypoints unavailable")
    joints = sv.load_reference_joints(kdir, 64)[:6]
    paths = sv.write_corpus(root, joints, size=64, tile=32)
    return paths, joints


def test_limb_to_part_in_range():
    assert sv.LIMB_TO_PART.shape[0] == 17
    assert sv.LIMB_TO_PART.min() >= 1 and sv.LIMB_TO_PART.max() <= 24


def test_joints_fit_canvas(corpus):
    _, joints = corpus
    has = joints[..., 2] > 0.05
    assert joints[..., 0][has].min() >= 0 and joints[..., 0][has].max() < 64
    assert joints[..., 1][has].min() >= 0 and joints[..., 1][has].max() < 64


def test_oracle_reconstruction(corpus):
    """frame png == render(texture.png, densepose png, bg.jpg) within codec
    quantization."""
    paths, joints = corpus
    atlas = dsm.load_texture_atlas(paths["texture.jpg"], 32)
    bg = dsm.load_image(paths["bg.jpg"], 64)
    parts, uv = dsm.load_iuv(f"{paths['densepose']}/frame00002.png", 64)
    frame = dsm.load_image(f"{paths['frames']}/frame00002.png", 64)
    recon, mask = sv.render_frame(parts, uv, atlas, bg)
    err = np.abs(recon - frame)
    # 8-bit codecs on both sides: tolerate a few counts; exact structure
    assert np.median(err) < 0.03
    assert (err < 0.1).mean() > 0.97
    disk_mask = dsm.load_mask(f"{paths['mask']}/frame00002.png", 64)
    np.testing.assert_allclose(mask, disk_mask, atol=1e-6)


def test_frames_track_pose(corpus):
    """The person's mask centroid moves with the pose centroid."""
    paths, joints = corpus
    cents = []
    for i in range(6):
        m = dsm.load_mask(f"{paths['mask']}/frame{i:05d}.png", 64)[..., 0]
        ys, xs = np.nonzero(m > 0.5)
        cents.append([xs.mean(), ys.mean()])
    cents = np.array(cents)
    jc = np.array([j[j[:, 2] > 0, :2].mean(0) for j in joints])
    # centroid displacement correlates with joint-centroid displacement
    dc, dj = np.diff(cents, axis=0), np.diff(jc, axis=0)
    num = (dc * dj).sum()
    den = np.linalg.norm(dc) * np.linalg.norm(dj) + 1e-9
    assert num / den > 0.5


def test_flow_matches_motion(corpus):
    """flow[i-1] maps frame i pixels back toward frame i-1: warping
    frame i-1 by it must beat the no-motion baseline."""
    paths, _ = corpus
    a = dsm.load_image(f"{paths['frames']}/frame00002.png", 64)
    b = dsm.load_image(f"{paths['frames']}/frame00003.png", 64)
    fl = dsm.load_flow(f"{paths['flow']}/frame00002.flo", 64)
    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
    sx = np.clip((xs + fl[..., 0]).round().astype(int), 0, 63)
    sy = np.clip((ys + fl[..., 1]).round().astype(int), 0, 63)
    warped = a[sy, sx]
    m = dsm.load_mask(f"{paths['mask']}/frame00003.png", 64)[..., 0] > 0.5
    assert np.abs(warped - b)[m].mean() <= np.abs(a - b)[m].mean() + 1e-6


def test_bilinear_corpus_matches_model_warp_exactly():
    """sampling="bilinear" renders with the model's OWN sampling semantics:
    a GT-everything composite through texture_warp_reference reproduces the
    frame to float precision (the nearest default caps it ~45 dB —
    round-3 decomposition)."""
    import jax.numpy as jnp
    import numpy as np

    from neural_human_video_rendering_tpu.data import synthetic_video as sv
    from neural_human_video_rendering_tpu.ops.grid_sample import (
        texture_warp_reference)

    S, T = 64, 16
    joints = sv.load_reference_joints("/root/reference/keypoints", S)[0]
    parts, uv, _ = sv.rasterize_iuv(joints, S)
    atlas = sv.part_texture_atlas(tile=T)
    bg = sv.background_image(S)
    frame_bl, mask = sv.render_frame(parts, uv, atlas, bg, "bilinear")
    frame_nn, _ = sv.render_frame(parts, uv, atlas, bg, "nearest")

    onehot = np.eye(25, dtype=np.float32)[parts][None]          # (1,S,S,25)
    uv_tiled = np.broadcast_to(uv[None, :, :, None, :],
                               (1, S, S, 24, 2)).copy()
    fg = np.asarray(texture_warp_reference(
        jnp.asarray(atlas[None]), jnp.asarray(uv_tiled), jnp.asarray(onehot)))
    composite = mask * fg[0] + (1 - mask) * bg
    np.testing.assert_allclose(composite, frame_bl, atol=1e-5)
    # and the nearest default genuinely differs (the documented ceiling)
    assert np.abs(frame_nn - frame_bl).max() > 0.01
