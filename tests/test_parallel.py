"""Data-parallel mesh tests over 8 virtual CPU devices (SURVEY.md §2
"Parallelism": the TPU-native replacement for the reference's
nn.DataParallel)."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.data import dataset as dsm
from neural_human_video_rendering_tpu.parallel.mesh import (batch_sharding,
                                                            make_mesh,
                                                            replicate,
                                                            shard_batch)
from neural_human_video_rendering_tpu.train import steps as st
from neural_human_video_rendering_tpu.train.state import create_train_state


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_layout():
    mesh = make_mesh()
    x = np.zeros((8, 4, 4, 3), np.float32)
    sharded = shard_batch(mesh, {"x": x})["x"]
    assert sharded.sharding.spec[0] == "data"
    # each device holds 1/8 of the batch
    assert sharded.addressable_shards[0].data.shape == (1, 4, 4, 3)


def test_data_parallel_train_step(tiny_opt):
    """Full GAN step with batch sharded over the 8-device mesh: XLA inserts
    the gradient all-reduce; the updated (replicated) state must match a
    single-device run on the same global batch."""
    opt = dataclasses.replace(tiny_opt, lambda_L2=500, no_vgg_loss=True,
                              lambda_Temp=500, use_densepose_loss=True,
                              lambda_UV=1000, lambda_Prob=10)
    ds = dsm.SyntheticDataset(opt, length=8)
    batch_np = dsm.collate([ds[i] for i in range(8)])
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])

    mesh = make_mesh()
    state_sh = replicate(mesh, bundle["state"])
    batch_sh = shard_batch(mesh, batch_np)
    state1, metrics = step(state_sh, batch_sh)
    for v in metrics.values():
        assert np.isfinite(float(v))

    # single-device run on the identical global batch must produce the same
    # losses (parameters can't be compared directly: Adam's step-1 update is
    # ~lr*sign(grad), so reduction-order noise on near-zero grads flips signs)
    bundle2 = create_train_state(opt, jax.random.PRNGKey(0),
                                 ds.texture_atlas(), ds.background())
    batch_1d = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, metrics2 = step(bundle2["state"], batch_1d)
    for k in metrics:
        assert abs(float(metrics[k]) - float(metrics2[k])) < 1e-3 * (
            1 + abs(float(metrics2[k]))), k


def test_run_train_engages_mesh(tiny_opt, tmp_path, capsys):
    """The CLI driver auto-engages the data mesh when batchSize divides the
    visible devices (run_train -> _maybe_mesh -> sharded batches)."""
    from neural_human_video_rendering_tpu.train.drivers import run_train
    opt = dataclasses.replace(
        tiny_opt, checkpoints_dir=str(tmp_path), name="dp8", batchSize=8,
        lambda_L2=500, no_vgg_loss=True, use_densepose_loss=True,
        lambda_UV=1000, lambda_Prob=10, lambda_Temp=0,
        niter=1, no_decay=True, save_epoch_freq=1, print_freq=1,
        display_freq=10 ** 9, no_html=True)
    state = run_train(opt)
    out = capsys.readouterr().out
    assert "[mesh] data-parallel over 8 devices" in out
    assert "G_total" in out
    # returned state is replicated over the mesh, finite, and checkpointed
    leaf = jax.tree_util.tree_leaves(state.g_params)[0]
    assert len(leaf.sharding.device_set) == 8
    assert np.isfinite(np.asarray(leaf)).all()


def test_run_train_single_device_when_indivisible(tiny_opt, tmp_path, capsys):
    from neural_human_video_rendering_tpu.train.drivers import run_train
    opt = dataclasses.replace(
        tiny_opt, checkpoints_dir=str(tmp_path), name="dp3", batchSize=3,
        lambda_L2=500, no_vgg_loss=True, lambda_Temp=0,
        niter=1, no_decay=True, save_epoch_freq=1, print_freq=1,
        display_freq=10 ** 9, no_html=True)
    run_train(opt)
    out = capsys.readouterr().out
    assert "not divisible" in out


@pytest.mark.slow
def test_data_parallel_step_with_instance_feat(tiny_opt):
    """The encoder-E path (per-sample feat_image, einsum region pooling)
    shards over the data mesh like every other batch input."""
    opt = dataclasses.replace(tiny_opt, instance_feat=True, nef=4,
                              n_downsample_E=1, lambda_L2=500,
                              no_vgg_loss=True, lambda_Temp=0,
                              use_densepose_loss=True,
                              lambda_UV=1000, lambda_Prob=10)
    ds = dsm.SyntheticDataset(opt, length=8)
    batch_np = dsm.collate([ds[i] for i in range(8)])
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    assert "FeatE" in bundle["state"].g_params
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    mesh = make_mesh()
    state_sh = replicate(mesh, bundle["state"])
    batch_sh = shard_batch(mesh, batch_np)
    state1, metrics = step(state_sh, batch_sh)
    for v in metrics.values():
        assert np.isfinite(float(v))
