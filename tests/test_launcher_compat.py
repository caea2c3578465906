"""Reference-launcher compatibility: parse each launcher's EXACT flag line
and assert the resulting knob/dataset state (VERDICT r1 next-round #2).

The four reference .sh scripts are the public API of the framework
(SURVEY.md §5 config row: "the .sh files must run against the new framework
with path edits only"). These tests read the real launcher files from
/root/reference, extract their argv verbatim, remap only the path flags to a
fabricated corpus, and check: every flag parses, the knobs land where the
reference set them, and the dataset layer picks real data (not the synthetic
fallback).
"""

import dataclasses
import os

import numpy as np
import pytest

from neural_human_video_rendering_tpu.config import Options, TrainOptions
from neural_human_video_rendering_tpu.config import TestOptions as InferOptions

from corpus import make_corpus

REF = "/root/reference"

PATH_FLAGS = {"--checkpoints_dir", "--pose_path", "--mask_path", "--img_path",
              "--densepose_path", "--bg_path", "--texture_path", "--flow_path",
              "--flow_inv_path", "--lapalce_path", "--part_texture_path",
              "--pose_texture_path", "--pose_tgt_path", "--results_dir",
              "--load_pretrain_TransG", "--name"}


def launcher_argv(sh_path):
    """Extract the python invocation's argv from a launcher shell script."""
    txt = open(sh_path).read().replace("\\\n", " ")
    toks = []
    for line in txt.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        toks.extend(t for t in line.split() if t != "\\")
    argv, i = [], 0
    while i < len(toks):
        if toks[i].startswith("--"):
            argv.append(toks[i])
            i += 1
            while i < len(toks) and not toks[i].startswith("--"):
                argv.append(toks[i])
                i += 1
        else:
            i += 1
    return argv


def remap_paths(argv, mapping):
    """Replace the value after each path flag via `mapping` (flag -> path)."""
    out = list(argv)
    for i, t in enumerate(out):
        if t in mapping and i + 1 < len(out):
            out[i + 1] = mapping[t]
    return out


@pytest.fixture(scope="module")
def ref_available():
    if not os.path.isdir(REF):
        pytest.skip("reference mirror not available")
    return REF


def test_pretrain_trans_launcher(ref_available, tmp_path):
    """pretrainTrans.sh: pose+mask+densepose, NO --img_path — must still
    build a FrameDataset over the real dirs (VERDICT r1 weak #3)."""
    from neural_human_video_rendering_tpu.train.drivers import _dataset
    from neural_human_video_rendering_tpu.data import dataset as dsm

    argv = launcher_argv(f"{REF}/pretrainTrans.sh")
    c = make_corpus(str(tmp_path), n=6, size=48)
    argv = remap_paths(argv, {
        "--checkpoints_dir": str(tmp_path / "ckpt"),
        "--pose_path": c["openpose_json"],
        "--mask_path": c["mask"],
        "--densepose_path": c["densepose"],
        "--name": "uv_test",
    })
    opt = TrainOptions().parse(argv, save=False)
    # knob state exactly as the reference set it
    assert opt.batchSize == 6
    assert opt.n_blocks_translate == 5
    assert opt.loadSize == 512 and opt.resize_or_crop == "resize"
    assert opt.save_epoch_freq == 2 and opt.tf_log and opt.no_flip
    assert opt.input_nc == 3 and not opt.use_laplace
    assert opt.pose_nc == 3

    small = dataclasses.replace(opt, loadSize=48)
    ds = _dataset(small, "train")
    assert isinstance(ds, dsm.FrameDataset), \
        "pretrainTrans.sh must hit real data, not the synthetic fallback"
    s = ds[1]
    assert "mask" in s and "dp_parts" in s and "image" not in s
    assert s["joints"].shape == (18, 3) and s["joints"][:, 2].max() > 0


def test_pretrain_tex_launcher(ref_available, tmp_path):
    """pre_train_tex.sh: pose_path is a rendered-pose IMAGE dir and
    --input_nc 81 stacks pose render + 78 LaplaceProj channels
    (VERDICT r1 weak #5)."""
    from neural_human_video_rendering_tpu.data import dataset as dsm

    argv = launcher_argv(f"{REF}/pre_train_tex.sh")
    c = make_corpus(str(tmp_path), n=4, size=40, pose="img", laplace_ch=78)
    argv = remap_paths(argv, {
        "--checkpoints_dir": str(tmp_path / "ckpt"),
        "--pose_path": c["openpose_img"],
        "--lapalce_path": c["LaplaceProj"],
        "--part_texture_path": str(tmp_path / "absent"),
        "--pose_texture_path": str(tmp_path / "absent"),
        "--texture_path": c["texture.jpg"],
        "--name": "tex_test",
    })
    opt = TrainOptions().parse(argv, save=False)
    assert opt.input_nc == 81 and opt.use_laplace and opt.use_mask_texture
    assert opt.TexG == "part" and opt.loadSize == 200
    assert opt.data_ratio == 0.9
    assert opt.laplace_nc_eff == 78
    assert opt.pose_nc == 81, "81-channel contract (pre_train_tex.sh:18)"

    small = dataclasses.replace(opt, loadSize=40)
    ds = dsm.FrameDataset(small, "train")
    s = ds[1]
    assert s["pose_img"].shape == (40, 40, 3)
    assert s["laplace"].shape == (40, 40, 78)

    # the assembled generator input really is 81 channels
    import jax.numpy as jnp
    from neural_human_video_rendering_tpu.train.steps import build_pose_input
    pose = build_pose_input(small, jnp.asarray(s["joints"])[None],
                            jnp.asarray(s["laplace"])[None],
                            jnp.asarray(s["pose_img"])[None])
    assert pose.shape == (1, 40, 40, 81)


def test_pretrain_tex_laplace_channel_mismatch_fails_loudly(tmp_path):
    """3-channel LaplaceProj files under the 78-channel contract must raise,
    not replicate-fill (VERDICT r1 weak #5)."""
    from neural_human_video_rendering_tpu.data import dataset as dsm
    c = make_corpus(str(tmp_path), n=2, size=40, pose="img", laplace_ch=3)
    opt = Options(loadSize=40, input_nc=81, use_laplace=True,
                  pose_path=c["openpose_img"], lapalce_path=c["LaplaceProj"],
                  no_flip=True)
    ds = dsm.FrameDataset(opt, "train")
    with pytest.raises(ValueError, match="channel mismatch"):
        ds[0]


def test_train_launcher(ref_available, tmp_path):
    """train_start/pretrain_start.sh: the full stage-2 flag surface."""
    from neural_human_video_rendering_tpu.train.drivers import _dataset
    from neural_human_video_rendering_tpu.data import dataset as dsm

    argv = launcher_argv(f"{REF}/train_start/pretrain_start.sh")
    c = make_corpus(str(tmp_path), n=6, size=48)
    argv = remap_paths(argv, {
        "--checkpoints_dir": str(tmp_path / "ckpt"),
        "--pose_path": c["openpose_json"],
        "--mask_path": c["mask"],
        "--img_path": c["frames"],
        "--densepose_path": c["densepose"],
        "--bg_path": c["bg.jpg"],
        "--texture_path": c["texture.jpg"],
        "--flow_path": c["flow"],
        "--flow_inv_path": c["flow_inv"],
        "--load_pretrain_TransG": str(tmp_path / "uv"),
        "--name": "e2e_test",
    })
    opt = TrainOptions().parse(argv, save=False)
    assert opt.batchSize == 2 and opt.loadSize == 512
    assert opt.lambda_L2 == 500 and opt.lambda_UV == 1000
    assert opt.lambda_Prob == 10 and opt.lambda_Temp == 500
    assert opt.use_densepose_loss and opt.use_laplace
    assert opt.data_ratio == 0.9 and opt.save_epoch_freq == 5
    assert opt.which_epoch_TransG == "2" and opt.no_flip

    small = dataclasses.replace(opt, loadSize=48)
    ds = _dataset(small, "train")
    assert isinstance(ds, dsm.FrameDataset)
    s = ds[2]
    for k in ("image", "image_prev", "mask", "dp_parts", "dp_uv",
              "flow", "flow_inv"):
        assert k in s, k


def test_test_launcher(ref_available, tmp_path):
    """test_start/start.sh: inference sizing + laplace mode flags."""
    argv = launcher_argv(f"{REF}/test_start/start.sh")
    argv = remap_paths(argv, {
        "--checkpoints_dir": str(tmp_path / "ckpt"),
        "--pose_path": str(tmp_path / "kp"),
        "--pose_tgt_path": str(tmp_path / "tgt"),
        "--bg_path": str(tmp_path / "bg.jpg"),
        "--texture_path": str(tmp_path / "texture.jpg"),
        "--results_dir": str(tmp_path / "out"),
        "--name": "infer_test",
    })
    opt = InferOptions().parse(argv, save=False)
    assert not opt.isTrain and opt.phase == "test"
    assert opt.TexG == "part" and opt.use_mask_texture
    assert opt.n_downsample_global == 2 and opt.n_blocks_global == 10
    assert opt.ngf_global == 48
    assert opt.n_downsample_bg == 2 and opt.n_blocks_bg == 2
    assert opt.use_laplace and opt.pose_plus_laplace
    assert opt.pose_nc == 3 + opt.laplace_nc
    assert opt.which_epoch == "30" and opt.loadSize == 512


def test_align_pose_launcher(ref_available):
    """run_alignPose.sh flags all parse in graph_posenorm's CLI."""
    import subprocess
    import sys
    argv = launcher_argv(f"{REF}/data/data_prep/run_alignPose.sh")
    flags = {argv[i] for i in range(len(argv)) if argv[i].startswith("--")}
    assert flags == {"--target_keypoints", "--source_keypoints",
                     "--target_shape", "--source_shape", "--source_frames",
                     "--results", "--target_spread", "--source_spread",
                     "--calculate_scale_translation"}
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "graph_posenorm.py"), "--help"],
        capture_output=True, text=True)
    for f in flags:
        assert f in r.stdout, f


def test_bool_flags_are_toggleable():
    """Default-True knobs must be switch-off-able: --no_X pairs
    (VERDICT r1 weak #2: --no_temporal_detach_prev was advertised but
    didn't exist)."""
    opt = TrainOptions().parse([], save=False)
    assert opt.use_pallas_warp and opt.temporal_detach_prev
    opt = TrainOptions().parse(
        ["--no_use_pallas_warp", "--no_temporal_detach_prev"], save=False)
    assert not opt.use_pallas_warp and not opt.temporal_detach_prev
    # pix2pixHD-style no_* flags keep working as plain store_true
    opt = TrainOptions().parse(["--no_flip", "--no_vgg_loss"], save=False)
    assert opt.no_flip and opt.no_vgg_loss
    # and --X / --no_X together is an argparse error, not silent precedence
    with pytest.raises(SystemExit):
        TrainOptions().parse(["--use_pallas_warp", "--no_use_pallas_warp"],
                             save=False)


def test_debug_flag_overrides_cadence():
    opt = TrainOptions().parse(["--debug"], save=False)
    assert opt.display_freq == 1 and opt.print_freq == 1
    assert opt.niter == 1 and opt.niter_decay == 0
    assert opt.max_dataset_size == 10
