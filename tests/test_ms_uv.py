"""--ms_uv multi-scale deep UV supervision (round-5 structural lever).

The round-4 quality decomposition pinned the remaining held-out gap on
TransG's IUV accuracy (docs/quality/quality_profile_ep100.json); --ms_uv N
adds N aux IUV heads at intermediate decoder resolutions, supervised
against stride-subsampled DensePose pseudo-GT. These tests pin: shapes and
scale ladder, ms_uv=0 producing the exact legacy param tree (checkpoint
compat), gradient flow from the aux loss into trunk params, the GT
subsampling math, and the full train-step integration.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu import losses as L
from neural_human_video_rendering_tpu.models.generators import TransG


def _transg(ms_uv, n_down=3, size=32):
    net = TransG(n_parts=4, ngf=4, n_downsampling=n_down, n_blocks=1,
                 ms_uv=ms_uv)
    # nonzero input: an all-zeros image zeroes every activation (bias init
    # is zero), which would zero all weight grads and void the grad-flow test
    x = jax.random.normal(jax.random.PRNGKey(9), (1, size, size, 3))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    return net, params, x


def test_aux_shapes_and_scale_ladder():
    net, params, x = _transg(ms_uv=2, n_down=3, size=32)
    logits, uv, aux = net.apply({"params": params}, x)
    assert logits.shape == (1, 32, 32, 5) and uv.shape == (1, 32, 32, 4, 2)
    # two taps at the decoder's intermediate levels: S/4 then S/2
    assert [a[0].shape[1] for a in aux] == [8, 16]
    for lg, u in aux:
        assert lg.shape[-1] == 5 and u.shape[-2:] == (4, 2)
        assert float(u.min()) >= 0.0 and float(u.max()) <= 1.0


def test_ms_uv_zero_is_legacy_tree():
    """ms_uv=0 must produce byte-identical param structure to before the
    feature existed — old checkpoints keep loading."""
    _, p0, _ = _transg(ms_uv=0)
    _, p2, _ = _transg(ms_uv=2)
    flat0 = set(jax.tree_util.keystr(k) for k, _ in
                jax.tree_util.tree_flatten_with_path(p0)[0])
    flat2 = set(jax.tree_util.keystr(k) for k, _ in
                jax.tree_util.tree_flatten_with_path(p2)[0])
    extra = flat2 - flat0
    assert flat0 <= flat2
    assert extra and all("aux_head" in k for k in extra)


def test_aux_loss_reaches_trunk_params():
    """The deep-supervision gradient must flow through the shared decoder
    trunk, not only the aux head convs."""
    net, params, x = _transg(ms_uv=1)
    key = jax.random.PRNGKey(1)
    dp_parts = jax.random.randint(key, (1, 32, 32), 0, 5)
    dp_uv = jax.random.uniform(key, (1, 32, 32, 2))

    def aux_only_loss(p):
        _, _, aux = net.apply({"params": p}, x)
        uv_l, ce_l = L.ms_iuv_loss(aux, dp_uv, dp_parts)
        return uv_l + ce_l

    grads = jax.grad(aux_only_loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    trunk = [np.abs(np.asarray(g)).sum() for k, g in flat
             if "aux_head" not in jax.tree_util.keystr(k)]
    assert sum(x > 0 for x in trunk) > 0


def test_ms_iuv_loss_subsampling_math():
    """At a scale where GT is constant within each stride cell, the
    subsampled loss must equal the full-res loss computed by hand."""
    P = 3
    parts = jnp.array([[1, 2], [0, 3]], dtype=jnp.int32)
    dp_parts = jnp.repeat(jnp.repeat(parts[None], 2, axis=1), 2, axis=2)
    dp_uv = jnp.repeat(jnp.repeat(
        jnp.array([[[0.2, 0.8], [0.5, 0.5]],
                   [[0.0, 0.0], [1.0, 0.25]]])[None], 2, axis=1), 2, axis=2)
    logits_k = jnp.zeros((1, 2, 2, P + 1))
    uv_k = jnp.full((1, 2, 2, P, 2), 0.5)
    uv_l, ce_l = L.ms_iuv_loss(((logits_k, uv_k),), dp_uv, dp_parts)
    # hand-computed: fg pixels (parts 1,2,3); pred 0.5 everywhere
    exp_uv = (abs(0.5 - 0.2) + abs(0.5 - 0.8)
              + 0.0 + 0.0
              + abs(0.5 - 1.0) + abs(0.5 - 0.25)) / (3 * 2)
    np.testing.assert_allclose(float(uv_l), exp_uv, rtol=1e-5)
    np.testing.assert_allclose(float(ce_l), np.log(P + 1), rtol=1e-5)


def test_ms_iuv_loss_empty():
    z = L.ms_iuv_loss((), jnp.zeros((1, 4, 4, 2)),
                      jnp.zeros((1, 4, 4), jnp.int32))
    assert float(z[0]) == 0.0 and float(z[1]) == 0.0


def test_train_step_with_ms_uv(tiny_opt):
    """Full stage-2 step trains with --ms_uv 1: the G_MSUV term appears,
    all losses stay finite, params update."""
    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.train import steps as st
    from neural_human_video_rendering_tpu.train.state import create_train_state

    opt = dataclasses.replace(tiny_opt, ms_uv=1, lambda_MS=0.3,
                              lambda_L2=500, lambda_UV=1000, lambda_Prob=10,
                              use_densepose_loss=True, no_vgg_loss=True)
    ds = dsm.SyntheticDataset(opt, length=opt.batchSize)
    batch = dsm.collate([ds[i] for i in range(opt.batchSize)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    state, metrics = step(bundle["state"], batch)
    assert "G_MSUV" in metrics and np.isfinite(float(metrics["G_MSUV"]))
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_pretrain_step_with_ms_uv(tiny_opt):
    import dataclasses

    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.models.generators import TransG
    from neural_human_video_rendering_tpu.train import steps as st
    from neural_human_video_rendering_tpu.train.state import make_optimizer

    opt = dataclasses.replace(tiny_opt, ms_uv=1, lambda_MS=0.3)
    ds = dsm.SyntheticDataset(opt, length=opt.batchSize)
    batch = dsm.collate([ds[i] for i in range(opt.batchSize)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    net = TransG(opt.n_parts, opt.ngf, opt.n_downsample_translate,
                 opt.n_blocks_translate, ms_uv=opt.ms_uv)
    S = opt.train_size
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, S, S, opt.pose_nc)))["params"]
    tx = make_optimizer(opt, 10)
    step = st.make_pretrain_uv_step(opt, net, tx)
    params, _, losses = step(params, tx.init(params), batch)
    assert "MSUV" in losses and np.isfinite(float(losses["MSUV"]))
