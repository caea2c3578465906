"""--netG local (pix2pixHD LocalEnhancer) + --niter_fix_global tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.models.generators import (
    GlobalGenerator, LocalEnhancer, TransG)


def test_global_return_features_shape():
    g = GlobalGenerator(out_nc=3, ngf=4, n_downsampling=2, n_blocks=1,
                        return_features=True)
    x = jnp.zeros((1, 16, 16, 3))
    params = g.init(jax.random.PRNGKey(0), x)["params"]
    feat = g.apply({"params": params}, x)
    assert feat.shape == (1, 16, 16, 4)   # full res, ngf channels, no head


def test_local_enhancer_shapes_and_structure():
    m = LocalEnhancer(out_nc=3, ngf=4, n_downsample_global=2,
                      n_blocks_global=1, n_local_enhancers=1, n_blocks_local=2)
    x = jnp.zeros((2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    # the pix2pixHD structure is present: coarse trunk + enhancer branch
    assert "global_trunk" in params
    assert "enh1_stem" in params and "enh1_block0" in params
    # trunk width = ngf * 2 (n_local_enhancers = 1)
    stem_kernel = params["global_trunk"]["ConvNormRelu_0"]["Conv_0"]["kernel"]
    assert stem_kernel.shape[-1] == 8


def test_local_enhancer_two_levels():
    m = LocalEnhancer(out_nc=2, ngf=2, n_downsample_global=1,
                      n_blocks_global=1, n_local_enhancers=2, n_blocks_local=1)
    x = jnp.zeros((1, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (1, 32, 32, 2)
    assert "enh2_stem" in params and "enh1_stem" in params


def test_transg_local_heads(tiny_opt):
    t = TransG(n_parts=24, ngf=4, n_downsampling=2, n_blocks=1, netG="local",
               n_blocks_local=1)
    x = jnp.zeros((1, 32, 32, 3))
    params = t.init(jax.random.PRNGKey(0), x)["params"]
    logits, uv = t.apply({"params": params}, x)
    assert logits.shape == (1, 32, 32, 25)
    assert uv.shape == (1, 32, 32, 24, 2)
    assert float(uv.min()) >= 0.0 and float(uv.max()) <= 1.0


def test_netg_local_full_train_step(tiny_opt):
    """The whole G+D step runs with --netG local."""
    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.train import steps as st
    from neural_human_video_rendering_tpu.train.state import create_train_state

    opt = dataclasses.replace(tiny_opt, netG="local", n_blocks_local=1,
                              lambda_L2=500, no_vgg_loss=True)
    ds = dsm.SyntheticDataset(opt, length=2)
    batch = {k: jnp.asarray(v) for k, v in dsm.collate([ds[0], ds[1]]).items()}
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    state, metrics = step(bundle["state"], batch)
    assert np.isfinite(float(metrics["G_total"]))
    assert "global_trunk" in state.g_params["TransG"]["LocalEnhancer_0"]


def test_niter_fix_global_freezes_trunk(tiny_opt):
    """--niter_fix_global: trunk params stay EXACTLY fixed for the first N
    epochs' steps, enhancer params move; trunk unfreezes after."""
    import optax
    from neural_human_video_rendering_tpu.train.state import make_optimizer

    opt = dataclasses.replace(tiny_opt, netG="local", niter_fix_global=1,
                              no_decay=True)
    tx = make_optimizer(opt, steps_per_epoch=2)   # freeze for 2 steps

    params = {"TransG": {"global_trunk": {"w": jnp.ones((3,))},
                         "enh1_stem": {"w": jnp.ones((3,))}}}
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    p = params
    for step_i in range(4):
        ups, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, ups)
        trunk_moved = not np.allclose(np.asarray(p["TransG"]["global_trunk"]["w"]), 1.0)
        enh_moved = not np.allclose(np.asarray(p["TransG"]["enh1_stem"]["w"]), 1.0)
        if step_i < 2:
            assert not trunk_moved, f"trunk moved during freeze (step {step_i})"
        assert enh_moved
    assert not np.allclose(np.asarray(p["TransG"]["global_trunk"]["w"]),
                           np.asarray(params["TransG"]["global_trunk"]["w"]))
