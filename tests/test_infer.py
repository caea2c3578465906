"""Inference-driver test: the reference demo path (keypoints -> frames)."""

import dataclasses
import os

from neural_human_video_rendering_tpu.infer.test_driver import run_inference


def test_inference_writes_frames_and_gallery(tiny_opt, tmp_path,
                                             ref_keypoints_dir):
    opt = dataclasses.replace(
        tiny_opt, pose_path=ref_keypoints_dir,
        results_dir=str(tmp_path / "results"),
        name="infer_test", checkpoints_dir=str(tmp_path / "ckpt"),
        which_epoch="latest", isTrain=False)
    n = run_inference(opt, batch_size=2, max_frames=5)
    assert n == 5
    imgs = os.listdir(os.path.join(opt.results_dir, "images"))
    assert len(imgs) == 5
    assert any("frame00000" in f for f in imgs)
    assert os.path.exists(os.path.join(opt.results_dir, "index.html"))


def test_visualizer_artifacts(tiny_opt, tmp_path):
    """HTML gallery + opt.txt + logs: the reference's artifact contract."""
    import numpy as np
    opt = dataclasses.replace(tiny_opt, checkpoints_dir=str(tmp_path),
                              name="vis_test", tf_log=True)
    opt.save()
    assert os.path.exists(os.path.join(opt.run_dir, "opt.txt"))
    from neural_human_video_rendering_tpu.utils.visualizer import Visualizer
    vis = Visualizer(opt)
    vis.log_losses(1, 0, {"G_GAN": 0.5}, step=1)
    vis.display_results({"fake": np.zeros((8, 8, 3), np.float32)}, 1, 1)
    vis.close()
    assert os.path.exists(os.path.join(opt.run_dir, "web", "index.html"))
    assert os.path.isdir(os.path.join(opt.run_dir, "logs"))


def test_save_video(tiny_opt, tmp_path):
    """--save_video assembles the rendered frames into a playable file."""
    import cv2
    import dataclasses
    from neural_human_video_rendering_tpu.utils.video import write_video
    from neural_human_video_rendering_tpu.utils.image import save_image
    import numpy as np

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i in range(5):
        save_image(str(img_dir / f"frame{i:05d}_synthesized.jpg"),
                   np.full((32, 32, 3), -1 + i * 0.4, np.float32))
    out = str(tmp_path / "video.mp4")
    n = write_video(str(img_dir), out, fps=5)
    assert n == 5
    # a file was produced (mp4 or the MJPG fallback) and decodes back
    import os
    produced = out if os.path.isfile(out) else str(tmp_path / "video.avi")
    cap = cv2.VideoCapture(produced)
    assert cap.isOpened()
    frames = 0
    while cap.read()[0]:
        frames += 1
    assert frames == 5


def test_map_driving_joints_matches_training_geometry(tiny_opt):
    """Inference keypoint mapping must reuse dataset.canvas_geom (review
    finding r2: a reimplemented anisotropic squeeze ignored scale_width's
    letterbox offset and crop-mode's loadSize canvas + center crop)."""
    import dataclasses
    import numpy as np
    from neural_human_video_rendering_tpu.data.dataset import canvas_geom
    from neural_human_video_rendering_tpu.infer.test_driver import \
        map_driving_joints

    j = np.zeros((1, 18, 3), np.float32)
    j[0, 0] = (512.0, 256.0, 1.0)      # a confident joint on a 1024x512 canvas
    canvas = (512.0, 1024.0)           # (H, W)

    # resize: anisotropic to S x S
    opt = dataclasses.replace(tiny_opt, loadSize=64, fineSize=64,
                              resize_or_crop="resize")
    out = map_driving_joints(opt, j, canvas)
    np.testing.assert_allclose(out[0, 0, :2], [512 * 64 / 1024,
                                               256 * 64 / 512], atol=1e-5)

    # scale_width: aspect-preserving + vertical letterbox offset
    opt = dataclasses.replace(tiny_opt, loadSize=64, fineSize=64,
                              resize_or_crop="scale_width")
    sx, sy, oy = canvas_geom("scale_width", 1024, 512, 64)
    out = map_driving_joints(opt, j, canvas)
    np.testing.assert_allclose(out[0, 0, :2],
                               [512 * sx, 256 * sy + oy], atol=1e-5)
    assert oy != 0      # the letterbox offset actually engages

    # resize_and_crop: loadSize canvas, deterministic center-crop offset
    opt = dataclasses.replace(tiny_opt, loadSize=64, fineSize=32,
                              resize_or_crop="resize_and_crop")
    oc = (64 - 32) // 2
    out = map_driving_joints(opt, j, canvas)
    np.testing.assert_allclose(out[0, 0, :2],
                               [512 * 64 / 1024 - oc, 256 * 64 / 512 - oc],
                               atol=1e-5)

    # unconfident joints are left untouched
    assert out[0, 1, 2] == 0 and out[0, 1, 0] == 0


def test_pose_image_driving_uses_training_geometry(tiny_opt, tmp_path,
                                                   monkeypatch):
    """A model trained on pre-rendered pose images (openpose_img contract)
    must be DRIVEN with pose images loaded at the training geometry —
    loadSize canvas + deterministic center crop under crop modes, not a
    plain square resize (round-3 review finding)."""
    import numpy as np
    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.utils.image import save_image

    pose_dir = str(tmp_path / "pose_imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        save_image(os.path.join(pose_dir, f"frame{i:05d}.png"),
                   rng.uniform(-1, 1, (40, 40, 3)).astype(np.float32))

    # crop mode: loadSize 40, fineSize 32 -> eval center-crops (40-32)//2=4
    opt = dataclasses.replace(
        tiny_opt, pose_path=pose_dir, resize_or_crop="crop",
        loadSize=40, fineSize=32,
        results_dir=str(tmp_path / "results"),
        name="poseimg_test", checkpoints_dir=str(tmp_path / "ckpt"),
        which_epoch="latest", isTrain=False)

    captured = {}
    import neural_human_video_rendering_tpu.train.steps as st
    real_make = st.make_forward_fn

    def spy_make(opt_, renderer, cluster_feats=None):
        fwd = real_make(opt_, renderer, cluster_feats)

        def wrapped(g, assets, joints, laplace=None, pose_img=None,
                    feat_image=None):
            if pose_img is not None and "pimg" not in captured:
                captured["pimg"] = np.asarray(pose_img)
            return fwd(g, assets, joints, laplace, pose_img, feat_image)
        return wrapped

    monkeypatch.setattr(
        "neural_human_video_rendering_tpu.infer.test_driver.make_forward_fn",
        spy_make)
    n = run_inference(opt, batch_size=2, max_frames=3)
    assert n == 3
    assert captured["pimg"].shape[1:3] == (32, 32)
    # exact training geometry: FrameDataset's own load (loadSize canvas +
    # deterministic center crop), not a 40->32 squash
    expected = dsm.load_image(os.path.join(pose_dir, "frame00000.png"), 40)
    expected = expected[4:36, 4:36]
    np.testing.assert_allclose(captured["pimg"][0], expected, atol=1e-6)
    squash = dsm.load_image(os.path.join(pose_dir, "frame00000.png"), 32)
    assert np.abs(squash - expected).max() > 0.05   # the old path differed
