"""Data-parallel mesh tests over 8 virtual CPU devices (SURVEY.md §2
"Parallelism": the TPU-native replacement for the reference's
nn.DataParallel)."""

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
