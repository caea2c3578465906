"""Pose rasterizer tests (jit-able skeleton render + heatmaps)."""

import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.data import rasterize as ras


def _joints(S=64):
    j = np.zeros((18, 3), np.float32)
    j[:, 2] = 1.0
    # vertical "spine": neck (1) at top-center, nose (0) above it
    j[0] = [S / 2, S / 4, 1.0]
    j[1] = [S / 2, S / 2, 1.0]
    # spread other joints around
    for i in range(2, 18):
        j[i] = [(i * 7) % S, (i * 11) % S, 1.0]
    return j


def test_skeleton_shapes_and_range():
    img = ras.render_skeleton(jnp.asarray(_joints()), 64, 64)
    assert img.shape == (64, 64, 3)
    assert float(img.min()) >= -1.0 and float(img.max()) <= 1.0


def test_limb_drawn_between_joints():
    img = np.asarray(ras.render_skeleton(jnp.asarray(_joints()), 64, 64))
    # midpoint of nose-neck limb (x=32, y in (16,32)) must be colored
    mid = img[24, 32]
    assert not np.allclose(mid, -1.0)
    # far corner is background
    assert np.allclose(img[0, 63], -1.0)


def test_low_confidence_joint_not_drawn():
    j = _joints()
    j[:, 2] = 0.0  # nothing visible
    img = np.asarray(ras.render_skeleton(jnp.asarray(j), 64, 64))
    assert np.allclose(img, -1.0)


def test_batched_render():
    j = np.stack([_joints(), _joints()])
    out = ras.render_skeleton_batch(jnp.asarray(j), 32, 32)
    assert out.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(out[0], out[1])


def test_heatmaps_peak_at_joint():
    j = _joints()
    hm = np.asarray(ras.joint_heatmaps(jnp.asarray(j), 64, 64, sigma=2.0))
    assert hm.shape == (64, 64, 18)
    y, x = int(j[1, 1]), int(j[1, 0])
    assert hm[y, x, 1] > 0.99
    assert hm[0, 0, 1] < 0.01


def test_pose_heatmaps_input_channels(tiny_opt):
    """--pose_heatmaps (the reference's "18Feature" encoding) appends
    n_joints Gaussian channels to the pose input, train + infer paths."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from neural_human_video_rendering_tpu.train.steps import build_pose_input
    opt = dataclasses.replace(tiny_opt, pose_heatmaps=True, heatmap_sigma=2.0)
    assert opt.pose_nc == 3 + 18
    j = np.zeros((2, 18, 3), np.float32)
    j[:, :, 0] = 16.0
    j[:, :, 1] = np.arange(18)[None] + 4.0
    j[:, :, 2] = 1.0
    pose = build_pose_input(opt, jnp.asarray(j), None)
    assert pose.shape == (2, opt.train_size, opt.train_size, 21)
    hm = np.asarray(pose[0, :, :, 3:])          # heatmap block in [-1,1]
    # peak of joint 0's heatmap sits at its (x=16, y=4) location
    assert hm[4, 16, 0] > 0.99
    assert hm[..., 0].max() <= 1.0 and hm[..., 0].min() >= -1.0


def test_coord_conv_input_channels(tiny_opt):
    """--coord_conv appends two normalized coordinate ramps (x then y) to
    the pose input; composes with --pose_heatmaps."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from neural_human_video_rendering_tpu.train.steps import build_pose_input
    opt = dataclasses.replace(tiny_opt, coord_conv=True)
    assert opt.pose_nc == 3 + 2
    j = np.zeros((2, 18, 3), np.float32)
    j[:, :, :2] = 8.0
    j[:, :, 2] = 1.0
    pose = build_pose_input(opt, jnp.asarray(j), None)
    S = opt.train_size
    assert pose.shape == (2, S, S, 5)
    xs, ys = np.asarray(pose[0, :, :, 3]), np.asarray(pose[0, :, :, 4])
    np.testing.assert_allclose(xs[0], np.linspace(-1, 1, S), atol=1e-6)
    np.testing.assert_allclose(xs[-1], xs[0], atol=0)        # x: constant in y
    np.testing.assert_allclose(ys[:, 0], np.linspace(-1, 1, S), atol=1e-6)
    np.testing.assert_allclose(ys[:, -1], ys[:, 0], atol=0)  # y: constant in x
    # composes with heatmaps: 3 render + 18 hm + 2 coords
    opt2 = dataclasses.replace(tiny_opt, coord_conv=True, pose_heatmaps=True)
    assert opt2.pose_nc == 23
    pose2 = build_pose_input(opt2, jnp.asarray(j), None)
    assert pose2.shape[-1] == 23


def test_limb_coord_maps_geometry():
    """Limb-local frames: t runs 0->1 joint a->b along the limb, d is
    signed perpendicular distance, both Gaussian-enveloped and zeroed for
    low-confidence limbs."""
    j = np.zeros((18, 3), np.float32)
    j[:, 2] = 1.0
    # limb 0 is (1, 2): place joint 1 at (10, 32), joint 2 at (50, 32) — a
    # horizontal segment
    j[1] = [10.0, 32.0, 1.0]
    j[2] = [50.0, 32.0, 1.0]
    lc = np.asarray(ras.limb_coord_maps(jnp.asarray(j), 64, 64, sigma=8.0))
    assert lc.shape == (64, 64, 2 * 17)
    t_ch, d_ch = lc[..., 0], lc[..., 1]
    # on the segment: w=1, so t_ch = 2t-1; at joint a, t=0 -> -1; at b -> +1;
    # midpoint -> 0
    assert abs(t_ch[32, 10] + 1.0) < 1e-3
    assert abs(t_ch[32, 50] - 1.0) < 1e-3
    assert abs(t_ch[32, 30]) < 0.02
    # d is antisymmetric across the limb and ~0 on it
    assert abs(d_ch[32, 30]) < 1e-3
    assert d_ch[36, 30] * d_ch[28, 30] < 0       # opposite signs
    np.testing.assert_allclose(d_ch[36, 30], -d_ch[28, 30], atol=1e-4)
    # Gaussian envelope: far away everything ~0 (the d channel's linear
    # d/sigma factor softens the tail before the Gaussian kills it)
    assert abs(t_ch[0, 63]) < 1e-3 and abs(d_ch[0, 63]) < 1e-3
    # low-confidence endpoint zeroes the limb's two channels
    j2 = j.copy()
    j2[2, 2] = 0.0
    lc2 = np.asarray(ras.limb_coord_maps(jnp.asarray(j2), 64, 64, sigma=8.0))
    assert np.allclose(lc2[..., 0], 0.0) and np.allclose(lc2[..., 1], 0.0)


def test_limb_coords_input_channels(tiny_opt):
    """--limb_coords appends 2*17 limb-frame channels; composes with the
    other encodings."""
    import dataclasses

    from neural_human_video_rendering_tpu.train.steps import build_pose_input
    opt = dataclasses.replace(tiny_opt, limb_coords=True, limb_sigma=4.0)
    assert opt.pose_nc == 3 + 34
    j = np.zeros((2, 18, 3), np.float32)
    j[:, :, 0] = 16.0
    j[:, :, 1] = np.arange(18)[None] + 4.0
    j[:, :, 2] = 1.0
    pose = build_pose_input(opt, jnp.asarray(j), None)
    assert pose.shape == (2, opt.train_size, opt.train_size, 37)
    lc = np.asarray(pose[0, :, :, 3:])
    assert np.abs(lc).max() > 0.5          # limbs actually present
    opt2 = dataclasses.replace(tiny_opt, limb_coords=True, pose_heatmaps=True,
                               coord_conv=True)
    assert opt2.pose_nc == 3 + 18 + 2 + 34
    assert build_pose_input(opt2, jnp.asarray(j), None).shape[-1] == opt2.pose_nc
