"""End-to-end jitted train-step tests for all three stages."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.data import dataset as dsm
from neural_human_video_rendering_tpu.models.generators import TexG, TransG
from neural_human_video_rendering_tpu.train import steps as st
from neural_human_video_rendering_tpu.train.state import (create_train_state,
                                                          make_optimizer)


def _batch(opt, n=2):
    ds = dsm.SyntheticDataset(opt, length=max(n, 2))
    b = dsm.collate([ds[i] for i in range(n)])
    return ds, {k: jnp.asarray(v) for k, v in b.items()}


def _gan_opt(tiny_opt):
    return dataclasses.replace(
        tiny_opt, lambda_L2=500, lambda_UV=1000, lambda_Prob=10,
        lambda_Temp=500, use_densepose_loss=True, no_vgg_loss=True)


def test_full_train_step_runs_and_updates(tiny_opt):
    opt = _gan_opt(tiny_opt)
    ds, batch = _batch(opt)
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    state0 = bundle["state"]
    g0 = jax.tree.leaves(state0.g_params)[0].copy()
    state1, metrics = step(state0, batch)
    for k in ("G_GAN", "G_L2", "G_UV", "G_Prob", "G_Temp", "D_total"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert int(state1.step) == 1
    # params actually moved
    g1 = jax.tree.leaves(state1.g_params)[0]
    assert float(jnp.abs(g1 - g0).max()) > 0


def test_train_step_uv_refine_and_limb_coords(tiny_opt):
    """The two round-4 IUV levers compose through the full jitted GAN step:
    --uv_refine adds the TransG residual stack (its params must receive
    gradients) and --limb_coords widens the pose input."""
    opt = dataclasses.replace(_gan_opt(tiny_opt), uv_refine=1,
                              uv_refine_ngf=4, limb_coords=True,
                              limb_sigma=4.0)
    assert opt.pose_nc == 3 + 34
    ds, batch = _batch(opt)
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    state0 = bundle["state"]
    assert "refine_stem" in state0.g_params["TransG"]
    r0 = jax.tree.leaves(state0.g_params["TransG"]["refine_stem"])[0].copy()
    state1, metrics = step(state0, batch)
    for k in ("G_GAN", "G_UV", "G_Prob", "D_total"):
        assert np.isfinite(float(metrics[k])), k
    r1 = jax.tree.leaves(state1.g_params["TransG"]["refine_stem"])[0]
    assert not np.allclose(np.asarray(r0), np.asarray(r1))


def test_train_step_loss_decreases(tiny_opt):
    import dataclasses
    opt = dataclasses.replace(tiny_opt, lambda_L2=500, no_vgg_loss=True,
                              lambda_Mask=0.0, lr=5e-4)
    ds, batch = _batch(opt)
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    state = bundle["state"]
    first = last = None
    for i in range(8):
        state, metrics = step(state, batch)
        v = float(metrics["G_L2"])
        first = v if first is None else first
        last = v
    assert last < first  # reconstruction improves on a fixed batch


def test_pretrain_uv_step_decreases(tiny_opt):
    opt = tiny_opt
    ds, batch = _batch(opt)
    transg = TransG(opt.n_parts, opt.ngf, opt.n_downsample_translate,
                    opt.n_blocks_translate)
    S = opt.loadSize
    params = transg.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, S, S, opt.pose_nc)))["params"]
    tx = make_optimizer(opt)
    opt_state = tx.init(params)
    step = st.make_pretrain_uv_step(opt, transg, tx)
    first = last = None
    for i in range(5):
        params, opt_state, losses = step(params, opt_state, batch)
        v = float(losses["total"])
        first = v if first is None else first
        last = v
    assert np.isfinite(last) and last < first


def test_pretrain_tex_step_runs(tiny_opt):
    opt = tiny_opt
    ds, batch = _batch(opt)
    static = ds.texture_atlas()
    batch = dict(batch)
    batch["part_texture"] = jnp.asarray(
        np.clip(static[None].repeat(2, 0) + 0.1, -1, 1))
    texg = TexG(opt.n_parts, opt.tex_tile, opt.ngf_global,
                opt.n_downsample_global, opt.n_blocks_global)
    S = opt.loadSize
    params = texg.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, S, S, opt.pose_nc)))["params"]
    tx = make_optimizer(opt)
    opt_state = tx.init(params)
    step = st.make_pretrain_tex_step(opt, texg, tx, static)
    params, opt_state, losses = step(params, opt_state, batch)
    assert np.isfinite(float(losses["Tex_L1"]))


def test_vgg_loss_in_train_step(tiny_opt):
    """Separate (slower) check that the VGG path compiles and is finite."""
    import dataclasses
    opt = dataclasses.replace(tiny_opt, no_vgg_loss=False, lambda_L2=500)
    ds, batch = _batch(opt)
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    assert bundle["vgg_params"] is not None
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    _, metrics = step(bundle["state"], batch)
    assert np.isfinite(float(metrics["G_VGG"]))


def test_symmetric_temporal_gradient_mode(tiny_opt):
    """temporal_detach_prev=False (the reference-faithful symmetric
    gradient) must still compile and train."""
    opt = dataclasses.replace(_gan_opt(tiny_opt), temporal_detach_prev=False)
    ds, batch = _batch(opt)
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    state = bundle["state"]
    first = last = None
    for _ in range(4):
        state, metrics = step(state, batch)
        v = float(metrics["G_total"])
        assert np.isfinite(v)
        first = v if first is None else first
        last = v
    assert last < first


def test_temporal_prev_real_mode(tiny_opt):
    """--temporal_prev real: temporal target is the flow-warped real t-1
    frame; no prev render. Step compiles, trains, and G_Temp is finite."""
    opt = dataclasses.replace(_gan_opt(tiny_opt), temporal_prev="real")
    ds, batch = _batch(opt)
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    state = bundle["state"]
    first = last = None
    for _ in range(3):
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["G_Temp"]))
        v = float(metrics["G_total"])
        first = v if first is None else first
        last = v
    assert last < first
