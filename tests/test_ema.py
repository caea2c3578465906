"""EMA generator track (--ema_decay): update math, checkpoint round-trip,
and the inference-side G_ema preference.

Parity note: the reference's pix2pixHD lineage trains WITHOUT weight
averaging, so the default is off (ema_decay=0, TrainState.g_ema=None and
the step is byte-identical to the non-EMA graph). EMA is a quality knob of
this framework (evaluated/served track when enabled).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.data import dataset as dsm
from neural_human_video_rendering_tpu.train import steps as st
from neural_human_video_rendering_tpu.train.state import create_train_state
from neural_human_video_rendering_tpu.utils import checkpoint as ckpt


def _bundle_and_batch(opt, n=2):
    ds = dsm.SyntheticDataset(opt, length=max(n, 2))
    b = dsm.collate([ds[i] for i in range(n)])
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    bundle = create_train_state(opt, jax.random.PRNGKey(0),
                                ds.texture_atlas(), ds.background())
    return bundle, batch


def _gan_opt(tiny_opt, **kw):
    return dataclasses.replace(
        tiny_opt, lambda_L2=500, lambda_UV=1000, lambda_Prob=10,
        use_densepose_loss=True, no_vgg_loss=True, **kw)


def test_ema_off_by_default(tiny_opt):
    opt = _gan_opt(tiny_opt)
    bundle, batch = _bundle_and_batch(opt)
    assert bundle["state"].g_ema is None
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    state1, _ = step(bundle["state"], batch)
    assert state1.g_ema is None


def test_ema_update_math(tiny_opt):
    """g_ema after each step equals the hand-computed warmup-decayed blend
    of the previous EMA with the freshly-updated raw params."""
    opt = _gan_opt(tiny_opt, ema_decay=0.9)
    bundle, batch = _bundle_and_batch(opt)
    state = bundle["state"]
    assert state.g_ema is not None
    # init: EMA starts as a copy of the raw params
    for e, p in zip(jax.tree.leaves(state.g_ema),
                    jax.tree.leaves(state.g_params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    ema_prev = jax.tree.map(np.asarray, state.g_ema)
    for t in (1, 2):  # warmup regime: d = (1+t)/(10+t) < 0.9
        state, _ = step(state, batch)
        d = min(0.9, (1.0 + t) / (10.0 + t))
        want = jax.tree.map(lambda e, p: e * d + np.asarray(p) * (1 - d),
                            ema_prev, state.g_params)
        got = jax.tree.map(np.asarray, state.g_ema)
        for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
        ema_prev = got
    # EMA lags the raw params (it is a distinct, smoother track)
    diff = max(float(np.abs(e - np.asarray(p)).max()) for e, p in zip(
        jax.tree.leaves(ema_prev), jax.tree.leaves(state.g_params)))
    assert diff > 0


def test_ema_checkpoint_roundtrip_and_inference_preference(tiny_opt, tmp_path):
    opt = _gan_opt(tiny_opt, ema_decay=0.9)
    bundle, batch = _bundle_and_batch(opt)
    step = st.make_train_step(opt, bundle["renderer"], bundle["disc"],
                              bundle["vgg_params"], bundle["g_tx"],
                              bundle["d_tx"])
    state, _ = step(bundle["state"], batch)
    run_dir = str(tmp_path / "run")
    ckpt.save_net(run_dir, "G", 1, state.g_params)
    ckpt.save_net(run_dir, "G_ema", 1, state.g_ema)
    # round-trip: the EMA file restores the EMA values, not the raw ones
    back = ckpt.load_net(run_dir, "G_ema", "latest", state.g_params)
    for b, e in zip(jax.tree.leaves(back), jax.tree.leaves(state.g_ema)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(e))
    # inference preference: the driver loads G_ema when present
    label = ("G_ema" if os.path.isfile(
        ckpt._path(run_dir, "latest", "G_ema")) else "G")
    assert label == "G_ema"
    # and falls back to G when absent
    os.remove(ckpt._path(run_dir, "latest", "G_ema"))
    label = ("G_ema" if os.path.isfile(
        ckpt._path(run_dir, "latest", "G_ema")) else "G")
    assert label == "G"


def test_ema_blend_math_unit():
    """Fast-tier EMA math check (the full-GAN-step integration,
    test_ema_update_math, is slow-tier: it compiles the whole train step).
    Pins the warmup ramp, the cap at `decay`, and param->EMA dtype cast."""
    ema = {"w": jnp.full((3,), 1.0, jnp.float32)}
    p = {"w": jnp.full((3,), 2.0, jnp.bfloat16)}
    for step in (0, 1, 5, 500):
        out = st.ema_blend(ema, p, jnp.asarray(step), 0.9)
        t = step + 1
        d = min(0.9, (1.0 + t) / (10.0 + t))
        want = 1.0 * d + 2.0 * (1.0 - d)
        assert out["w"].dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out["w"]), want, rtol=1e-6)
    # large-step effective decay is capped at `decay` exactly
    out = st.ema_blend(ema, p, jnp.asarray(10 ** 6), 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0 * 0.9 + 2.0 * 0.1,
                               rtol=1e-6)
