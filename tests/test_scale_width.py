"""scale_width* resize modes (pix2pixHD family; VERDICT r1 missing #4):
aspect-preserving width scaling onto the static square canvas, with every
modality and the keypoints sharing one geometry."""

import dataclasses

import numpy as np

from neural_human_video_rendering_tpu.data import dataset as dsm

from corpus import make_corpus


def test_canvas_geom():
    # landscape 96x48 (W x H) onto a 48 canvas: width-fit scale 0.5,
    # height 24 centered at oy=12
    sx, sy, oy = dsm.canvas_geom("scale_width", W=96, H=48, S=48)
    assert sx == sy == 0.5 and oy == 12
    # portrait: height overflows -> centered crop (negative offset)
    sx, sy, oy = dsm.canvas_geom("scale_width", W=48, H=96, S=48)
    assert sx == sy == 1.0 and oy == -24
    # plain resize: anisotropic, no offset
    sx, sy, oy = dsm.canvas_geom("resize", W=96, H=48, S=48)
    assert (sx, sy, oy) == (0.5, 1.0, 0)


def test_apply_canvas_pad_and_crop():
    img = np.arange(48 * 96 * 3, dtype=np.float32).reshape(48, 96, 3)
    import cv2
    out = dsm.apply_canvas(img, (0.5, 0.5, 12), 48, cv2.INTER_NEAREST, -1.0)
    assert out.shape == (48, 48, 3)
    assert np.all(out[:12] == -1.0) and np.all(out[36:] == -1.0)
    assert not np.all(out[12:36] == -1.0)
    tall = np.ones((96, 48, 1), np.float32)
    out = dsm.apply_canvas(tall, (1.0, 1.0, -24), 48, cv2.INTER_NEAREST, 0.0)
    assert out.shape == (48, 48, 1) and np.all(out == 1.0)


def test_scale_width_dataset_geometry(tiny_opt, tmp_path):
    """Landscape 96x48 native canvas, scale_width to 48: images letterboxed,
    keypoints mapped by the same scale+offset."""
    c = make_corpus(str(tmp_path), n=4, canvas=(48, 96))   # (H, W)
    opt = dataclasses.replace(
        tiny_opt, loadSize=48, fineSize=48, resize_or_crop="scale_width",
        pose_path=c["openpose_json"], img_path=c["frames"],
        mask_path=c["mask"], densepose_path=c["densepose"],
        flow_path=c["flow"], flow_inv_path=c["flow_inv"])
    ds = dsm.FrameDataset(opt, "train")
    assert ds._canvas == (96, 48)
    s = ds[1]
    assert s["image"].shape == (48, 48, 3)
    # letterbox rows are fill (-1 for images, 0 for mask/parts/flow)
    assert np.all(s["image"][:12] == -1.0)
    assert np.all(s["mask"][:12] == 0.0)
    assert np.all(s["dp_parts"][:12] == 0)
    assert np.all(s["flow"][36:] == 0.0)
    # content present in the center band
    assert not np.all(s["image"][12:36] == -1.0)
    # keypoints: x' = 0.5x, y' = 0.5y + 12, inside the band
    has = s["joints"][:, 2] > 0
    assert has.any()
    ys = s["joints"][has, 1]
    assert ys.min() >= 12 - 1e-3 and ys.max() <= 36 + 1e-3
    # flow vectors rescaled by the same factor: constant field (3, 5) on the
    # native canvas must read (1.5, 2.5) inside the letterbox band
    const = np.broadcast_to(np.array([3.0, 5.0], np.float32),
                            (48, 96, 2)).copy()
    with open(f"{c['flow']}/frame00000.flo", "wb") as f:
        f.write(np.float32(202021.25).tobytes())
        f.write(np.int32(96).tobytes())
        f.write(np.int32(48).tobytes())
        f.write(const.tobytes())
    s1 = ds[1]
    np.testing.assert_allclose(s1["flow"][24, 24], [1.5, 2.5], atol=1e-5)
    assert np.all(s1["flow"][:12] == 0) and np.all(s1["flow"][36:] == 0)


def test_scale_width_and_crop(tiny_opt, tmp_path):
    c = make_corpus(str(tmp_path), n=4, canvas=(48, 96))
    opt = dataclasses.replace(
        tiny_opt, loadSize=48, fineSize=32,
        resize_or_crop="scale_width_and_crop",
        pose_path=c["openpose_json"], img_path=c["frames"])
    assert opt.train_size == 32
    ds = dsm.FrameDataset(opt, "train")
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
