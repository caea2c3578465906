"""LPIPS metric (utils/lpips.py): structure, ingest, and fallback ranking.

BASELINE.md's north star metric is LPIPS; real weights are environmentally
unavailable (zero egress), so these tests pin (a) the exact LPIPS math over
fabricated weights, (b) the official-checkpoint ingest format, and (c) the
uniform-head fallback's ranking behavior — the same contract
test_vgg_fallback_ranking.py pins for the perceptual loss.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from neural_human_video_rendering_tpu.models import vgg as vggm
from neural_human_video_rendering_tpu.utils import lpips as L


@pytest.fixture(scope="module")
def vgg_params():
    return vggm.get_vgg_params()


def _img(seed=0, S=64):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
    base = np.stack([np.sin(7 * xx), np.cos(5 * yy),
                     np.sin(4 * (xx + yy))], -1) * 0.6
    base += rng.uniform(-0.1, 0.1, base.shape)
    return np.clip(base, -1, 1).astype(np.float32)[None]


# ---------------------------------------------------------------- structure

def test_identity_is_zero(vgg_params):
    a = jnp.asarray(_img())
    assert float(L.lpips_distance(vgg_params, a, a)) == 0.0


def test_per_sample_shape_and_mean(vgg_params):
    a = jnp.asarray(np.concatenate([_img(0), _img(1)]))
    b = jnp.asarray(np.concatenate([_img(2), _img(3)]))
    v = L.lpips_distance(vgg_params, a, b, per_sample=True)
    assert v.shape == (2,)
    s = L.lpips_distance(vgg_params, a, b)
    assert np.isclose(float(jnp.mean(v)), float(s), rtol=1e-5)


def test_packed_tap_normalization_is_per_pixel():
    """Tap 0 arrives space-to-depth packed; group-wise normalization must
    equal normalizing each original pixel's channel vector."""
    rng = np.random.default_rng(0)
    C = 8
    packed = rng.normal(size=(2, 4, 4, 4 * C)).astype(np.float32)
    out = np.asarray(L._normalize_tap(jnp.asarray(packed), C))
    assert out.shape == (2, 4, 4, 4, C)
    want = packed.reshape(2, 4, 4, 4, C)
    want = want / np.sqrt((want ** 2).sum(-1, keepdims=True) + 1e-10)
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_linear_head_weights_change_the_distance(vgg_params):
    a, b = jnp.asarray(_img(0)), jnp.asarray(_img(1))
    d_uniform = float(L.lpips_distance(vgg_params, a, b))
    lins = L.uniform_lin_weights()
    lins[2] = lins[2] * 50.0            # upweight relu3_1
    d_weighted = float(L.lpips_distance(vgg_params, a, b, lins))
    assert d_weighted != pytest.approx(d_uniform, rel=1e-3)


# ------------------------------------------------------------------- ingest

def test_load_official_pth_layout(tmp_path, vgg_params):
    torch = pytest.importorskip("torch")
    sd = {}
    rng = np.random.default_rng(1)
    for i, c in enumerate(L.TAP_WIDTHS):
        w = rng.normal(0.1, 0.05, (1, c, 1, 1)).astype(np.float32)
        w[0, 0] = -0.3                   # negative entry must clamp to 0
        sd[f"lin{i}.model.1.weight"] = torch.from_numpy(w)
    p = str(tmp_path / "lpips_vgg.pth")
    torch.save(sd, p)
    lins = L.load_lin_weights(p)
    assert [w.shape[0] for w in lins] == list(L.TAP_WIDTHS)
    assert all((w >= 0).all() for w in lins)
    assert lins[0][0] == 0.0
    d = float(L.lpips_distance(vgg_params, jnp.asarray(_img(0)),
                               jnp.asarray(_img(1)), lins))
    assert np.isfinite(d) and d > 0


def test_load_npz_layout(tmp_path):
    p = str(tmp_path / "lins.npz")
    np.savez(p, **{f"lin{i}": np.full((c,), 0.5, np.float32)
                   for i, c in enumerate(L.TAP_WIDTHS)})
    lins = L.load_lin_weights(p)
    assert lins[3].shape == (512,)


def test_load_rejects_wrong_width(tmp_path):
    p = str(tmp_path / "bad.npz")
    arrays = {f"lin{i}": np.ones((c,), np.float32)
              for i, c in enumerate(L.TAP_WIDTHS)}
    arrays["lin2"] = np.ones((7,), np.float32)
    np.savez(p, **arrays)
    with pytest.raises(ValueError, match="lin2"):
        L.load_lin_weights(p)


def test_get_lin_weights_env_gate(tmp_path, monkeypatch):
    monkeypatch.delenv("LPIPS_WEIGHTS", raising=False)
    assert L.get_lin_weights()[0][0] == pytest.approx(1 / 64)
    p = str(tmp_path / "lins.npz")
    np.savez(p, **{f"lin{i}": np.full((c,), 2.0, np.float32)
                   for i, c in enumerate(L.TAP_WIDTHS)})
    monkeypatch.setenv("LPIPS_WEIGHTS", p)
    assert L.get_lin_weights()[0][0] == 2.0


# ------------------------------------------------- fallback ranking contract

def test_monotone_in_noise(vgg_params):
    a = _img()
    rng = np.random.default_rng(1)
    noise = rng.normal(0, 1, a.shape).astype(np.float32)
    ds = [float(L.lpips_distance(vgg_params, jnp.asarray(a),
                                 jnp.asarray(np.clip(a + s * noise, -1, 1))))
          for s in (0.02, 0.08, 0.2, 0.5)]
    assert all(x < y for x, y in zip(ds, ds[1:])), ds


def test_monotone_in_blur(vgg_params):
    import cv2
    a = _img()
    ds = [float(L.lpips_distance(
        vgg_params, jnp.asarray(a),
        jnp.asarray(cv2.GaussianBlur(a[0], (k, k), 0)[None])))
        for k in (3, 7, 15)]
    assert all(x < y for x, y in zip(ds, ds[1:])), ds


def test_shift_worse_than_small_noise(vgg_params):
    a = _img()
    shifted = np.roll(a, 12, axis=2)
    rng = np.random.default_rng(2)
    noisy = np.clip(a + 0.02 * rng.normal(0, 1, a.shape), -1, 1
                    ).astype(np.float32)
    d_shift = float(L.lpips_distance(vgg_params, jnp.asarray(a),
                                     jnp.asarray(shifted)))
    d_noise = float(L.lpips_distance(vgg_params, jnp.asarray(a),
                                     jnp.asarray(noisy)))
    assert d_shift > d_noise


# ---------------------------------------------------------------------- CLI

def test_evaluate_cli_metric_lpips(tmp_path):
    from neural_human_video_rendering_tpu.infer import evaluate as ev
    from neural_human_video_rendering_tpu.utils.image import save_image
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    for i in range(3):
        save_image(os.path.join(d1, f"frame{i:05d}_synthesized.jpg"),
                   _img(i)[0])
        save_image(os.path.join(d2, f"frame{i:05d}.jpg"), _img(i + 10)[0])
    res = ev.main(["--results_dir", d1, "--gt_dir", d2, "--loadSize", "64",
                   "--no_vgg", "--metric", "lpips",
                   "--out", str(tmp_path / "m.json")])
    assert "lpips" in res and np.isfinite(res["lpips"]) and res["lpips"] > 0
    assert "vgg_dist" not in res
