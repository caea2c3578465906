"""LR schedule parity (pix2pixHD: constant for --niter epochs, then linear
decay to 0 over --niter_decay; disabled by --no_decay)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.train.state import (create_train_state,
                                                          make_optimizer)


def _update_sizes(tx, n):
    params = {"w": jnp.zeros(())}
    state = tx.init(params)
    grads = {"w": jnp.ones(())}
    sizes = []
    for _ in range(n):
        ups, state = tx.update(grads, state, params)
        sizes.append(abs(float(ups["w"])))
    return sizes


def test_linear_decay_after_flat_phase(tiny_opt):
    opt = dataclasses.replace(tiny_opt, niter=1, niter_decay=2, lr=2e-4)
    sizes = _update_sizes(make_optimizer(opt, steps_per_epoch=5), 15)
    # flat phase: full LR (Adam with constant grad -> update ~ lr)
    assert sizes[4] > 0.9 * sizes[0]
    # decay phase: shrinks toward zero by the end of niter+niter_decay
    assert sizes[14] < 0.2 * sizes[0]
    assert sizes[14] < sizes[9] < sizes[6]


def test_no_decay_keeps_lr_constant(tiny_opt):
    opt = dataclasses.replace(tiny_opt, niter=1, niter_decay=2, no_decay=True)
    sizes = _update_sizes(make_optimizer(opt, steps_per_epoch=5), 15)
    assert sizes[14] > 0.9 * sizes[0]


def test_stage2_state_gets_the_schedule(tiny_opt):
    """Regression: create_train_state must thread steps_per_epoch into the
    G/D optimizers (stage-2 previously always trained at constant LR)."""
    opt = dataclasses.replace(tiny_opt, niter=1, niter_decay=1)
    import jax
    from neural_human_video_rendering_tpu.data import dataset as dsm
    ds = dsm.SyntheticDataset(opt, length=2)
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background(),
                                steps_per_epoch=3)
    sizes = _update_sizes(bundle["g_tx"], 6)
    assert sizes[5] < 0.6 * sizes[0]
    assert np.isfinite(sizes).all() if hasattr(np, "isfinite") else True
