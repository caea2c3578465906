"""Dataset / loader / texture-unfold / flow-IO tests (SURVEY.md §2 #7,#11)."""

import dataclasses
import os

import cv2
import numpy as np

from neural_human_video_rendering_tpu.data import dataset as dsm
from neural_human_video_rendering_tpu.data import densepose as dp
from neural_human_video_rendering_tpu.data import texture_unfold as tu


def test_synthetic_dataset_contract(tiny_opt):
    ds = dsm.SyntheticDataset(tiny_opt, length=4)
    s = ds[1]
    S = tiny_opt.loadSize
    assert s["joints"].shape == (18, 3)
    assert s["image"].shape == (S, S, 3)
    assert s["mask"].shape == (S, S, 1)
    assert s["dp_parts"].shape == (S, S) and s["dp_parts"].dtype == np.int32
    assert s["dp_uv"].shape == (S, S, 2)
    assert s["flow"].shape == (S, S, 2)
    assert 0 <= s["dp_parts"].max() <= 24
    # deterministic
    s2 = dsm.SyntheticDataset(tiny_opt, length=4)[1]
    np.testing.assert_allclose(s["image"], s2["image"])


def test_collate_and_loader(tiny_opt):
    ds = dsm.SyntheticDataset(tiny_opt, length=6)
    loader = dsm.BatchLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2,) + ds[0]["image"].shape
    # reshuffles between epochs
    first_epoch_idx = [b["index"].tolist() for b in batches]
    second = [b["index"].tolist() for b in loader]
    assert sorted(sum(first_epoch_idx, [])) == sorted(sum(second, []))


def test_iuv_roundtrip():
    rng = np.random.RandomState(0)
    parts = rng.randint(0, 25, (16, 16)).astype(np.int32)
    uv = rng.rand(16, 16, 2).astype(np.float32)
    uv[parts == 0] = 0
    enc = dp.encode_iuv(parts, uv)
    p2, uv2 = dp.decode_iuv(enc)
    np.testing.assert_array_equal(p2, parts)
    np.testing.assert_allclose(uv2, uv, atol=1 / 255.0 + 1e-6)


def test_flo_reader_roundtrip(tmp_path):
    flow = np.random.RandomState(0).randn(8, 6, 2).astype(np.float32)
    path = str(tmp_path / "f.flo")
    with open(path, "wb") as f:
        f.write(np.float32(202021.25).tobytes())
        f.write(np.int32(6).tobytes())
        f.write(np.int32(8).tobytes())
        f.write(flow.tobytes())
    back = dsm.read_flo(path)
    np.testing.assert_allclose(back, flow)


def test_texture_atlas_grid_roundtrip(tmp_path):
    tiles = np.random.RandomState(0).rand(24, 16, 16, 3).astype(np.float32)
    grid = tu.tiles_to_grid(tiles)
    assert grid.shape == (4 * 16, 6 * 16, 3)
    path = str(tmp_path / "texture.png")   # png: lossless
    cv2.imwrite(path, cv2.cvtColor((grid * 255).astype(np.uint8),
                                   cv2.COLOR_RGB2BGR))
    back = dsm.load_texture_atlas(path, 16)
    np.testing.assert_allclose(back, tiles * 2 - 1, atol=2 / 255.0 + 1e-6)


def test_unfold_texture_end_to_end(tmp_path):
    """Frames + IUV -> atlas: constant-color part must yield that color."""
    fdir, ddir = tmp_path / "frames", tmp_path / "dp"
    fdir.mkdir(), ddir.mkdir()
    H = W = 32
    for i in range(3):
        img = np.zeros((H, W, 3), np.uint8)
        img[:, :, 1] = 200                      # greenish everywhere
        parts = np.zeros((H, W), np.int32)
        parts[4:28, 4:28] = 5                   # one part in the middle
        uu, vv = np.meshgrid(np.linspace(0, 1, W), np.linspace(0, 1, H))
        uv = np.stack([uu, vv], -1).astype(np.float32)
        iuv = dp.encode_iuv(parts, uv)
        cv2.imwrite(str(fdir / f"frame{i:05d}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(ddir / f"frame{i:05d}.png"),
                    cv2.cvtColor(iuv, cv2.COLOR_RGB2BGR))
    out = str(tmp_path / "texture.jpg")
    tu.unfold_texture(str(fdir), str(ddir), out, tile=16)
    atlas = dsm.load_texture_atlas(out, 16)
    # part 5 tile (index 4) carries the green color
    tile = (atlas[4] + 1) / 2
    assert tile[..., 1].mean() > 0.6
    assert tile[..., 0].mean() < 0.2


def test_frame_dataset_real_files(tmp_path, tiny_opt):
    """FrameDataset over a tiny on-disk dataset in the reference layout."""
    from neural_human_video_rendering_tpu.data import keypoints as kp
    root = tmp_path
    for sub in ("img", "pose", "mask", "densepose"):
        (root / sub).mkdir()
    S = 48
    for i in range(4):
        img = np.full((S, S, 3), i * 30, np.uint8)
        cv2.imwrite(str(root / "img" / f"frame{i:05d}.png"), img)
        body = np.zeros((25, 3), np.float32)
        body[:, 0] = 10 + i
        body[:, 1] = 20
        body[:, 2] = 0.9
        kp.write_keypoint_json(str(root / "pose" / f"frame{i:05d}_keypoints.json"),
                               body)
        cv2.imwrite(str(root / "mask" / f"frame{i:05d}.png"),
                    np.full((S, S), 255, np.uint8))
        parts = np.zeros((S, S), np.int32)
        uv = np.zeros((S, S, 2), np.float32)
        cv2.imwrite(str(root / "densepose" / f"frame{i:05d}.png"),
                    cv2.cvtColor(dp.encode_iuv(parts, uv), cv2.COLOR_RGB2BGR))
    opt = dataclasses.replace(
        tiny_opt, img_path=str(root / "img"), pose_path=str(root / "pose"),
        mask_path=str(root / "mask"), densepose_path=str(root / "densepose"),
        data_ratio=0.75)
    train = dsm.FrameDataset(opt, "train")
    test = dsm.FrameDataset(opt, "test")
    assert len(train) == 3 and len(test) == 1     # --data_ratio split
    s = train[0]
    assert s["image"].shape == (opt.loadSize, opt.loadSize, 3)
    assert s["mask"].max() == 1.0
    # keypoints rescaled from the 48px canvas to loadSize
    assert abs(s["joints"][0, 0] - 10 * opt.loadSize / S) < 1e-4


def test_batchloader_multihost_sharding(tiny_opt):
    """shard=(i, n): disjoint strided slices of one identically-shuffled
    global order — hosts cover the dataset exactly once per epoch."""
    import dataclasses
    from neural_human_video_rendering_tpu.data.dataset import (BatchLoader,
                                                               SyntheticDataset)
    opt = dataclasses.replace(tiny_opt, batchSize=2)
    ds = SyntheticDataset(opt, length=12)
    seen = []
    for i in range(3):
        loader = BatchLoader(ds, 2, shuffle=True, seed=5, shard=(i, 3))
        assert len(loader) == 2
        for b in loader:
            seen.extend(int(x) for x in b["index"])
    assert sorted(seen) == list(range(12))

    # unsharded default covers everything too
    loader = BatchLoader(ds, 2, shuffle=True, seed=5)
    got = [int(x) for b in loader for x in b["index"]]
    assert sorted(got) == list(range(12))


def test_multi_person_pool_variants_and_cuts(tmp_path):
    """--people N pools deterministic body-proportion variants with zeroed
    flow at identity boundaries (person-agnostic stage-1 corpus,
    pretrainTrans.sh's multi-person intent)."""
    import numpy as np
    from neural_human_video_rendering_tpu.data import synthetic_video as sv

    from conftest import REFERENCE_KEYPOINTS
    base = sv.load_reference_joints(REFERENCE_KEYPOINTS, 64)[:4]
    v0 = sv.person_variant(base, 64, 0)
    v1 = sv.person_variant(base, 64, 1)
    v1b = sv.person_variant(base, 64, 1)
    np.testing.assert_array_equal(v0, base)          # seed 0 = identity
    np.testing.assert_array_equal(v1, v1b)           # deterministic
    assert np.abs(v1[..., :2] - base[..., :2]).max() > 1.0   # really varies
    assert v1[..., :2].max() <= 63 and v1[..., :2].min() >= 0
    np.testing.assert_array_equal(v1[..., 2], base[..., 2])  # conf untouched

    out = tmp_path / "pool"
    joints = np.concatenate([v0, v1])
    sv.write_corpus(str(out), joints, size=64, tile=32, cuts=(4,))
    # flow file at the boundary (frame 3 -> 4 pair, file frame00003) is zero
    import struct
    raw = open(out / "flow" / "frame00003.flo", "rb").read()
    fl = np.frombuffer(raw[12:], np.float32)
    assert np.all(fl == 0)
    # a within-person flow file is not all zero
    raw2 = open(out / "flow" / "frame00001.flo", "rb").read()
    assert np.abs(np.frombuffer(raw2[12:], np.float32)).max() > 0
