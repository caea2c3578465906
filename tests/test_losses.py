"""Loss-suite unit tests (SURVEY.md §2 #18)."""

import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu import losses as L


def _fake_d_outs(val, scales=2, layers=3, shape=(1, 4, 4)):
    return [[jnp.full(shape + (8,), val) for _ in range(layers)]
            + [jnp.full(shape + (1,), val)] for _ in range(scales)]


def test_lsgan_g_perfect_and_worst():
    assert float(L.lsgan_loss_g(_fake_d_outs(1.0))) == 0.0
    assert abs(float(L.lsgan_loss_g(_fake_d_outs(0.0))) - 1.0) < 1e-6


def test_lsgan_d():
    # perfect discriminator: real->1, fake->0
    assert float(L.lsgan_loss_d(_fake_d_outs(1.0), _fake_d_outs(0.0))) == 0.0
    v = float(L.lsgan_loss_d(_fake_d_outs(0.0), _fake_d_outs(1.0)))
    assert abs(v - 1.0) < 1e-6


def test_feature_matching_zero_when_equal():
    outs = _fake_d_outs(0.5)
    assert float(L.feature_matching_loss(outs, outs)) == 0.0
    other = _fake_d_outs(1.5)
    assert float(L.feature_matching_loss(outs, other)) > 0


def test_uv_loss_zero_when_exact():
    B, H, W, P = 1, 4, 4, 3
    rng = np.random.RandomState(0)
    dp_uv = rng.rand(B, H, W, 2).astype(np.float32)
    parts = rng.randint(0, P + 1, (B, H, W)).astype(np.int32)
    uv_pred = np.zeros((B, H, W, P, 2), np.float32)
    for p in range(P):
        uv_pred[..., p, :] = dp_uv
    assert float(L.uv_loss(jnp.asarray(uv_pred), jnp.asarray(dp_uv),
                           jnp.asarray(parts))) < 1e-6
    # perturb -> positive
    uv_bad = uv_pred + 0.25
    assert float(L.uv_loss(jnp.asarray(uv_bad), jnp.asarray(dp_uv),
                           jnp.asarray(parts))) > 0.1


def test_part_ce_loss_prefers_correct_class():
    B, H, W, P = 1, 4, 4, 3
    parts = np.ones((B, H, W), np.int32)
    good = np.full((B, H, W, P + 1), -10.0, np.float32)
    good[..., 1] = 10.0
    bad = np.full((B, H, W, P + 1), -10.0, np.float32)
    bad[..., 2] = 10.0
    lg = float(L.part_ce_loss(jnp.asarray(good), jnp.asarray(parts)))
    lb = float(L.part_ce_loss(jnp.asarray(bad), jnp.asarray(parts)))
    assert lg < 1e-3 and lb > 5.0


def test_part_ce_loss_mask_restricts():
    B, H, W, P = 1, 4, 4, 3
    parts = np.ones((B, H, W), np.int32)
    logits = np.full((B, H, W, P + 1), -10.0, np.float32)
    logits[..., 2] = 10.0              # everywhere wrong
    mask = np.zeros((B, H, W, 1), np.float32)  # ...but nothing supervised
    assert float(L.part_ce_loss(jnp.asarray(logits), jnp.asarray(parts),
                                jnp.asarray(mask))) == 0.0


def test_temporal_loss_zero_for_static_scene():
    img = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32))
    zero_flow = jnp.zeros((1, 8, 8, 2))
    v = float(L.temporal_flow_loss(img, img, zero_flow, zero_flow))
    assert v < 1e-6


def test_occlusion_mask_flags_inconsistent_flow():
    # consistent forward/backward pair -> mostly visible (borders occlude
    # because the zero-padded warp breaks consistency there, by design)
    flow = jnp.zeros((1, 16, 16, 2)).at[..., 0].set(1.0)
    m = L.occlusion_mask(flow, -flow)
    assert float(m.mean()) > 0.8
    # inconsistent backward flow -> occluded everywhere
    m2 = L.occlusion_mask(flow, flow * 5.0)
    assert float(m2.mean()) < float(m.mean()) - 0.3


def test_vanilla_gan_loss_no_lsgan():
    """--no_lsgan switches to sigmoid BCE (pix2pixHD GANLoss use_lsgan)."""
    import numpy as np
    from neural_human_video_rendering_tpu.losses.gan import (lsgan_loss_d,
                                                             lsgan_loss_g)
    z = jnp.asarray(np.linspace(-3, 3, 12).reshape(1, 3, 4).astype(np.float32))
    fake = [[z]]
    real = [[-z]]
    g_bce = float(lsgan_loss_g(fake, use_lsgan=False))
    # reference BCE-with-logits, target 1
    import scipy.special as sp
    zf = np.asarray(z, np.float64)
    expect = np.mean(np.logaddexp(0, -np.abs(zf)) + np.maximum(zf, 0) - zf)
    assert abs(g_bce - expect) < 1e-6
    d_bce = float(lsgan_loss_d(real, fake, use_lsgan=False))
    expect_d = 0.5 * (np.mean(np.logaddexp(0, -np.abs(-zf)) + np.maximum(-zf, 0) - (-zf))
                      + np.mean(np.logaddexp(0, -np.abs(zf)) + np.maximum(zf, 0)))
    assert abs(d_bce - expect_d) < 1e-6
    # perfect D on easy targets: BCE losses positive and finite
    assert np.isfinite(g_bce) and g_bce > 0


def test_train_step_no_lsgan(tiny_opt):
    import dataclasses
    import jax
    import numpy as np
    from neural_human_video_rendering_tpu.data import dataset as dsm
    from neural_human_video_rendering_tpu.train import steps as st
    from neural_human_video_rendering_tpu.train.state import create_train_state
    opt = dataclasses.replace(tiny_opt, no_lsgan=True, lambda_L2=500,
                              no_vgg_loss=True)
    ds = dsm.SyntheticDataset(opt, length=opt.batchSize)
    batch = {k: jnp.asarray(v) for k, v in
             dsm.collate([ds[i] for i in range(opt.batchSize)]).items()}
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    _, metrics = step(bundle["state"], batch)
    assert np.isfinite(float(metrics["G_GAN"]))
    assert np.isfinite(float(metrics["D_total"]))


def test_uv_grad_loss_invariant_to_constant_offset():
    """The gradient loss supervises the local warp Jacobian: adding a
    constant offset to the predicted UV (absolute drift) must not change
    it, while warping the field (non-constant error) must."""
    B, H, W, P = 1, 6, 6, 3
    rng = np.random.RandomState(1)
    dp_uv = rng.rand(B, H, W, 2).astype(np.float32)
    parts = rng.randint(0, P + 1, (B, H, W)).astype(np.int32)
    uv_pred = np.zeros((B, H, W, P, 2), np.float32)
    for p in range(P):
        uv_pred[..., p, :] = dp_uv
    exact = float(L.uv_grad_loss(jnp.asarray(uv_pred), jnp.asarray(dp_uv),
                                 jnp.asarray(parts)))
    assert exact < 1e-6
    shifted = float(L.uv_grad_loss(jnp.asarray(uv_pred + 0.3),
                                   jnp.asarray(dp_uv), jnp.asarray(parts)))
    assert shifted < 1e-6          # uv_loss would be 0.3 here
    # vary along H: the rng(1) part map's same-part pairs are all vertical
    ramp = np.linspace(0, 0.5, H, dtype=np.float32)[None, :, None, None, None]
    warped = float(L.uv_grad_loss(jnp.asarray(uv_pred + ramp),
                                  jnp.asarray(dp_uv), jnp.asarray(parts)))
    assert warped > 1e-3


def test_uv_grad_loss_ignores_cross_part_and_background_pairs():
    """Only pairs with the SAME nonzero GT part on both pixels count: a
    field that is exact inside each part but wild across boundaries and in
    the background scores zero."""
    B, H, W, P = 1, 4, 6, 2
    parts = np.zeros((B, H, W), np.int32)
    parts[:, :, :2] = 1
    parts[:, :, 3:5] = 2           # column 2 = bg gap, column 5 = bg
    dp_uv = np.tile(np.linspace(0, 1, W, dtype=np.float32)[None, None, :, None],
                    (B, H, 1, 2))
    uv_pred = np.zeros((B, H, W, P, 2), np.float32)
    for p in range(P):
        uv_pred[..., p, :] = dp_uv
    # corrupt background and make the two parts disagree by a constant
    uv_pred[:, :, 2, :, :] = 7.0   # bg column: never supervised
    uv_pred[:, :, 3:5, :, :] += 0.4  # part 2 offset: within-part grads intact
    got = float(L.uv_grad_loss(jnp.asarray(uv_pred), jnp.asarray(dp_uv),
                               jnp.asarray(parts)))
    assert got < 1e-6
