"""Golden tests on the 100 on-disk OpenPose JSONs (SURVEY.md §4/§7 step 1)."""

import os

import numpy as np

from neural_human_video_rendering_tpu.data import keypoints as kp


def test_parse_all_reference_jsons(ref_keypoints_dir):
    names = sorted(os.listdir(ref_keypoints_dir))
    assert len(names) == 100
    for n in names:
        p = kp.parse_keypoint_json(os.path.join(ref_keypoints_dir, n))
        assert p["body"].shape == (25, 3)
        assert p["face"].shape == (70, 3)
        assert p["hand_l"].shape == (21, 3)
        assert p["hand_r"].shape == (21, 3)
        # demo sequence: a detected person in every frame
        assert p["body"][:, 2].max() > 0.5


def test_first_frame_values(ref_keypoints_dir):
    p = kp.parse_keypoint_json(os.path.join(ref_keypoints_dir,
                                            "frame00000_keypoints.json"))
    np.testing.assert_allclose(p["body"][0], [503.564, 224.076, 0.889074],
                               rtol=1e-6)


def test_body25_to_coco18():
    body = np.arange(75, dtype=np.float32).reshape(25, 3)
    coco = kp.body25_to_coco18(body)
    assert coco.shape == (18, 3)
    np.testing.assert_array_equal(coco[0], body[0])    # nose
    np.testing.assert_array_equal(coco[8], body[9])    # RHip skips MidHip
    np.testing.assert_array_equal(coco[17], body[18])  # LEar


def test_load_pose_dir(ref_keypoints_dir):
    names, joints = kp.load_pose_dir(ref_keypoints_dir)
    assert joints.shape == (100, 18, 3)
    assert names[0] == "frame00000_keypoints.json"
    assert np.isfinite(joints).all()


def test_write_read_roundtrip(tmp_path):
    body = np.random.RandomState(0).rand(25, 3).astype(np.float32) * 100
    path = str(tmp_path / "frame_keypoints.json")
    kp.write_keypoint_json(path, body)
    back = kp.parse_keypoint_json(path)["body"]
    np.testing.assert_allclose(back, body, atol=1e-4)
