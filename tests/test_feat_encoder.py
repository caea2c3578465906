"""Encoder E / --instance_feat path (SURVEY.md §2 #14 --instance_feat;
pix2pixHD networks.define_E lineage, flag evidence test_start/start.sh:23).
Region map = DensePose part map (documented adaptation — the human-video
data contract has no object instance maps)."""

import dataclasses
import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.config import Options
from neural_human_video_rendering_tpu.models.generators import (FeatEncoder,
                                                                part_pool)
from neural_human_video_rendering_tpu.models.renderer import \
    renderer_from_options

RNG = jax.random.PRNGKey(0)


def test_part_pool_region_means():
    """Every pixel gets exactly its region's mean feature."""
    fmap = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    regions = jnp.asarray([[0, 0, 1, 1]] * 4)[None]          # left|right split
    onehot = jax.nn.one_hot(regions, 2)
    out = np.asarray(part_pool(fmap, onehot))[0, ..., 0]
    left = np.arange(16).reshape(4, 4)[:, :2].mean()
    right = np.arange(16).reshape(4, 4)[:, 2:].mean()
    np.testing.assert_allclose(out[:, :2], left, rtol=1e-5)
    np.testing.assert_allclose(out[:, 2:], right, rtol=1e-5)


def test_feat_encoder_shapes():
    m = FeatEncoder(feat_num=3, nef=4, n_downsampling=2)
    x = jnp.zeros((2, 32, 32, 3))
    params = m.init(RNG, x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 32, 32, 3)
    assert float(jnp.abs(out).max()) <= 1.0


def _small_opt(**kw):
    return dataclasses.replace(
        Options(), loadSize=32, tex_tile=16, ngf=4, ngf_global=4,
        n_blocks_translate=1, n_downsample_translate=2, n_blocks_global=1,
        n_downsample_global=1, n_blocks_bg=1, n_downsample_bg=1,
        nef=4, n_downsample_E=1, dtype="float32", **kw)


def _render_inputs(opt):
    B, S, P, T = 2, opt.loadSize, opt.n_parts, opt.tex_tile
    pose = jnp.zeros((B, S, S, opt.pose_nc))
    bg = jnp.zeros((1, S, S, 3))
    tex = jnp.zeros((1, P, T, T, 3))
    return pose, bg, tex


def test_renderer_instance_feat_params_and_modes():
    opt = _small_opt(instance_feat=True)
    r = renderer_from_options(opt)
    assert r.use_feat
    pose, bg, tex = _render_inputs(opt)
    feat_img = jax.random.uniform(RNG, pose.shape[:3] + (3,))
    params = r.init(RNG, pose, bg, tex, None, feat_image=feat_img)["params"]
    assert "FeatE" in params, sorted(params)
    # training mode: real frame encoded
    out_e = r.apply({"params": params}, pose, bg, tex, None,
                    feat_image=feat_img)
    # inference mode: cluster codes
    codes = jnp.ones((opt.n_parts + 1, opt.feat_num))
    out_c = r.apply({"params": params}, pose, bg, tex, None,
                    cluster_feats=codes)
    # neutral mode: no source -> zero codes, same shapes
    out_z = r.apply({"params": params}, pose, bg, tex, None)
    for out in (out_e, out_c, out_z):
        assert out["fake"].shape == pose.shape[:3] + (3,)
    # the appearance code path must actually influence the render
    assert float(jnp.abs(out_c["fake"] - out_z["fake"]).max()) > 0


def test_renderer_without_flag_has_no_encoder():
    opt = _small_opt()
    r = renderer_from_options(opt)
    pose, bg, tex = _render_inputs(opt)
    params = r.init(RNG, pose, bg, tex, None)["params"]
    assert "FeatE" not in params


def test_train_step_trains_encoder():
    """One stage-2 step with --instance_feat: runs, and E gets gradients."""
    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.train import steps as st
    from neural_human_video_rendering_tpu.train.state import create_train_state

    opt = _small_opt(instance_feat=True, batchSize=2, no_vgg_loss=True,
                     lambda_Temp=0.0, use_densepose_loss=True)
    ds = dsm.SyntheticDataset(opt, length=2)
    batch = {k: jnp.asarray(v)
             for k, v in dsm.collate([ds[0], ds[1]]).items()}
    bundle = create_train_state(opt, RNG, ds.texture_atlas(), ds.background())
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    before = jax.tree.map(jnp.copy, bundle["state"].g_params["FeatE"])
    state, metrics = step(bundle["state"], batch)
    assert np.isfinite(float(metrics["G_total"]))
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         before, state.g_params["FeatE"])
    assert max(jax.tree.leaves(moved)) > 0, "encoder E got no gradient"


def test_kmeans_tool():
    import sys
    sys.path.insert(0, "tools")
    from encode_features import kmeans
    rng = np.random.RandomState(0)
    x = np.concatenate([rng.randn(50, 2) + 5, rng.randn(50, 2) - 5])
    c = kmeans(x.astype(np.float32), 2)
    assert c.shape == (2, 2)
    got = sorted(c[:, 0].round(0))
    assert got[0] < -3 and got[1] > 3
    # degenerate: fewer points than clusters still yields k centers
    assert kmeans(x[:1].astype(np.float32), 4).shape == (4, 2)


@pytest.mark.slow
def test_encode_features_cli_roundtrip(tiny_opt, tmp_path, monkeypatch):
    """tools/encode_features.py end to end on a tiny corpus: train one
    checkpoint with E, encode + cluster codes, and render through the
    cluster path with the produced npz."""
    import sys as _sys
    from corpus import make_corpus
    c = make_corpus(str(tmp_path / "data"), n=6, size=32)

    small = ("--loadSize 32 --tex_tile 16 --ngf 4 --ngf_global 4 --ndf 4 "
             "--n_blocks_translate 1 --n_downsample_translate 1 "
             "--n_blocks_global 1 --n_downsample_global 1 --n_blocks_bg 1 "
             "--n_downsample_bg 1 --nef 4 --n_downsample_E 1 "
             "--dtype float32").split()
    data = ["--pose_path", c["openpose_json"], "--img_path", c["frames"],
            "--densepose_path", c["densepose"], "--mask_path", c["mask"],
            "--bg_path", c["bg.jpg"], "--texture_path", c["texture.jpg"],
            "--no_flip", "--resize_or_crop", "resize"]
    ckpt_dir = str(tmp_path / "ckpt")

    import train as train_cli
    monkeypatch.setattr(_sys, "argv", ["train.py", "--name", "fe",
        "--checkpoints_dir", ckpt_dir, "--batchSize", "2", "--niter", "1",
        "--no_decay", "--save_epoch_freq", "1", "--print_freq", "100",
        "--no_vgg_loss", "--lambda_Temp", "0", "--use_densepose_loss",
        "--instance_feat"] + data + small)
    train_cli.main()

    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import encode_features as ef
    out_npz = str(tmp_path / "feats.npz")
    monkeypatch.setattr(_sys, "argv", ["encode_features.py", "--out",
        out_npz, "--max_frames", "4", "--n_clusters", "3", "--name", "fe",
        "--checkpoints_dir", ckpt_dir, "--instance_feat"] + data + small)
    ef.main()
    centers = np.load(out_npz)["centers"]
    assert centers.shape == (3, 25, 3)
    assert np.isfinite(centers).all()

    import test as test_cli
    monkeypatch.setattr(_sys, "argv", ["test.py", "--name", "fe",
        "--checkpoints_dir", ckpt_dir, "--pose_path", c["openpose_json"],
        "--results_dir", str(tmp_path / "out"), "--how_many", "2",
        "--instance_feat", "--load_features", out_npz,
        "--cluster_idx", "1"] + small)
    test_cli.main()
    outs = os.listdir(str(tmp_path / "out" / "images"))
    assert any(f.endswith(".jpg") or f.endswith(".png") for f in outs)
