"""Checkpoint semantics tests (SURVEY.md §2 #21)."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.utils import checkpoint as ckpt


def _params(seed=0):
    k = jax.random.PRNGKey(seed)
    return {"TransG": {"w": jax.random.normal(k, (4, 4)), "b": jnp.zeros(4)},
            "TexG": {"w": jax.random.normal(k, (3, 3))}}


def test_save_load_roundtrip(tmp_path):
    d = str(tmp_path)
    p = _params()
    ckpt.save_net(d, "G", 5, p)
    back = ckpt.load_net(d, "G", 5, target=p)
    np.testing.assert_allclose(np.asarray(back["TransG"]["w"]),
                               np.asarray(p["TransG"]["w"]))
    # latest copy exists and loads identically
    latest = ckpt.load_net(d, "G", "latest", target=p)
    np.testing.assert_allclose(np.asarray(latest["TexG"]["w"]),
                               np.asarray(p["TexG"]["w"]))


def test_save_breaks_hardlinks(tmp_path):
    """A run dir forked with `cp -al` must not overwrite its parent's
    checkpoints through shared inodes: saves are write-then-rename, so
    the fork's save gets a fresh inode and the parent's bytes survive.
    (Round 4 lost a parent run's latest_* to exactly this.)"""
    import os
    parent, fork = str(tmp_path / "parent"), str(tmp_path / "fork")
    p0 = _params(seed=0)
    ckpt.save_net(parent, "G", 1, p0)
    os.makedirs(fork)
    for f in os.listdir(parent):  # cp -al
        os.link(os.path.join(parent, f), os.path.join(fork, f))
    ckpt.save_net(fork, "G", 2, _params(seed=1))
    back = ckpt.load_net(parent, "G", "latest", target=p0)
    np.testing.assert_allclose(np.asarray(back["TransG"]["w"]),
                               np.asarray(p0["TransG"]["w"]))
    assert ckpt.latest_epoch(parent, "G") == "1"


def test_latest_epoch_discovery(tmp_path):
    d = str(tmp_path)
    assert ckpt.latest_epoch(d, "G") is None
    ckpt.save_net(d, "G", 2, _params())
    ckpt.save_net(d, "G", 10, _params())
    assert ckpt.latest_epoch(d, "G") == "10"


def test_partial_transg_restore(tmp_path):
    """Stage-1 TransG checkpoint loads into stage-2 generator params."""
    d = str(tmp_path)
    stage1 = _params(seed=1)
    ckpt.save_net(d, "TransG", 2, stage1["TransG"])
    stage2 = _params(seed=2)
    merged = ckpt.load_transg_into(stage2, d, 2)
    np.testing.assert_allclose(np.asarray(merged["TransG"]["w"]),
                               np.asarray(stage1["TransG"]["w"]))
    # other subnets untouched
    np.testing.assert_allclose(np.asarray(merged["TexG"]["w"]),
                               np.asarray(stage2["TexG"]["w"]))


def test_full_train_state_resume(tmp_path):
    """latest_state restores optimizer moments + step (full resume — the
    reference reloads weights only)."""
    import optax
    from neural_human_video_rendering_tpu.train.state import TrainState

    d = str(tmp_path)
    p = _params()
    tx = optax.adam(1e-3)
    st = TrainState(step=0, g_params=p, d_params=p,
                    g_opt=tx.init(p), d_opt=tx.init(p),
                    static_tex=jnp.zeros((1,)), bg=jnp.zeros((1,)),
                    tex_mask=None)
    # take one update so the moments are non-trivial
    grads = jax.tree.map(jnp.ones_like, p)
    ups, g_opt = tx.update(grads, st.g_opt, p)
    st = st.replace(step=7, g_opt=g_opt,
                    g_params=optax.apply_updates(p, ups))
    ckpt.save_train_state(d, st, 3)

    fresh = TrainState(step=0, g_params=p, d_params=p,
                       g_opt=tx.init(p), d_opt=tx.init(p),
                       static_tex=jnp.zeros((1,)), bg=jnp.zeros((1,)),
                       tex_mask=None)
    restored, epoch = ckpt.load_train_state(d, fresh)
    assert epoch == 3
    assert int(restored.step) == 7
    m_saved = jax.tree.leaves(st.g_opt)[0]
    m_rest = jax.tree.leaves(restored.g_opt)[0]
    np.testing.assert_allclose(np.asarray(m_rest), np.asarray(m_saved))


def test_load_pretrain_warm_start(tiny_opt, tmp_path):
    """--load_pretrain warm-starts G (and D) from another run's checkpoints
    (pix2pixHD BaseOptions flag, previously accepted but unused)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.train.drivers import run_train
    from neural_human_video_rendering_tpu.utils import checkpoint as ck

    # run A: one tiny epoch, saves checkpoints
    optA = dataclasses.replace(tiny_opt, name="A", lambda_L2=500,
                               no_vgg_loss=True, no_decay=True, niter=1,
                               checkpoints_dir=str(tmp_path),
                               save_epoch_freq=1, save_latest_freq=0,
                               print_freq=100, display_freq=10 ** 9)
    stateA = run_train(optA, epochs=1)

    # run B: warm-start from A; its initial G params must equal A's saved G
    optB = dataclasses.replace(optA, name="B",
                               load_pretrain=str(tmp_path / "A"))
    stateB = run_train(optB, epochs=1)
    saved = ck.load_net(str(tmp_path / "A"), "G", "latest",
                        jax.tree.map(jnp.zeros_like, stateA.g_params))
    # after one epoch B moved away from A's params, but the load happened:
    # check the run printed / produced finite state and differs from fresh
    flatA = jax.tree.leaves(saved)
    flatB = jax.tree.leaves(stateB.g_params)
    assert all(np.isfinite(np.asarray(x)).all() for x in flatB)
    # B trained FROM A: param distance B->A much smaller than A->zero scale
    dist = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(flatA, flatB))
    norm = sum(float(jnp.sum(a ** 2)) for a in flatA)
    assert dist < 0.5 * norm


def test_resume_across_schedule_change(tmp_path):
    """A --no_decay checkpoint resumes into a decay-schedule optimizer:
    Adam moments restore, the fresh ScaleByScheduleState is fast-forwarded
    to the saved step (so the added LR schedule starts from the
    checkpoint's position, not from scratch)."""
    import optax
    from neural_human_video_rendering_tpu.train.state import TrainState

    d = str(tmp_path)
    p = _params()
    tx_const = optax.adam(1e-3)                       # no_decay structure
    st = TrainState(step=0, g_params=p, d_params=p,
                    g_opt=tx_const.init(p), d_opt=tx_const.init(p),
                    static_tex=jnp.zeros((1,)), bg=jnp.zeros((1,)),
                    tex_mask=None)
    grads = jax.tree.map(jnp.ones_like, p)
    ups, g_opt = tx_const.update(grads, st.g_opt, p)
    st = st.replace(step=42, g_opt=g_opt,
                    g_params=optax.apply_updates(p, ups))
    ckpt.save_train_state(d, st, 6)

    sched = optax.join_schedules(
        [optax.constant_schedule(1e-3),
         optax.linear_schedule(1e-3, 0.0, 100)], boundaries=[50])
    tx_decay = optax.adam(sched)                      # decay structure
    fresh = TrainState(step=0, g_params=p, d_params=p,
                       g_opt=tx_decay.init(p), d_opt=tx_decay.init(p),
                       static_tex=jnp.zeros((1,)), bg=jnp.zeros((1,)),
                       tex_mask=None)
    restored, epoch = ckpt.load_train_state(d, fresh)
    assert epoch == 6 and int(restored.step) == 42
    # Adam moments carried over
    m_saved = jax.tree.leaves(st.g_opt)[0]
    m_rest = jax.tree.leaves(restored.g_opt)[0]
    np.testing.assert_allclose(np.asarray(m_rest), np.asarray(m_saved))
    # schedule count fast-forwarded to the global step
    counts = [int(np.asarray(s.count)) for s in
              jax.tree.leaves(restored.g_opt,
                              is_leaf=lambda n: isinstance(
                                  n, optax.ScaleByScheduleState))
              if isinstance(s, optax.ScaleByScheduleState)]
    assert counts and all(c == 42 for c in counts)
    # and the reverse direction (decay ckpt -> no_decay run) also loads
    ckpt.save_train_state(d, restored, 7)
    back, epoch2 = ckpt.load_train_state(
        d, st.replace(g_opt=tx_const.init(p), d_opt=tx_const.init(p)))
    assert epoch2 == 7


def test_tolerant_merge_dict_vs_leaf(capsys):
    """Checkpoint subtree where the new state expects a scalar leaf (optax
    chain change, e.g. adding a freeze counter) must keep the fresh leaf
    instead of crashing on np.asarray(dict).astype (review finding r2)."""
    import numpy as np
    from neural_human_video_rendering_tpu.utils.checkpoint import (
        _tolerant_from_state_dict)
    target = {"0": np.zeros((), np.int32),          # new: freeze counter
              "1": {"mu": np.zeros(3, np.float32)}}
    raw = {"0": {"count": np.ones(2), "mu": np.ones(3)},   # old: adam dict
           "1": {"mu": np.ones(3, np.float32)}}
    merged = _tolerant_from_state_dict(target, raw, "test")
    assert merged["0"].shape == () and int(merged["0"]) == 0   # fresh
    np.testing.assert_allclose(merged["1"]["mu"], 1.0)         # restored


def test_tolerant_merge_counts_missing_keys(capsys):
    import numpy as np
    from neural_human_video_rendering_tpu.utils.checkpoint import (
        _tolerant_from_state_dict)
    target = {"a": np.zeros(2, np.float32), "b": np.zeros(2, np.float32),
              "c": {"x": np.zeros((), np.float32)}}
    raw = {"a": np.ones(2, np.float32)}    # b and c missing entirely
    merged = _tolerant_from_state_dict(target, raw, "test")
    np.testing.assert_allclose(merged["a"], 1.0)
    np.testing.assert_allclose(merged["b"], 0.0)
    msg = capsys.readouterr().out
    assert "2 subtree(s)" in msg, msg
