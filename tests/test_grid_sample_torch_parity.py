"""grid_sample semantics vs ATen: pins the spec of record
(ops/grid_sample.py — UV in [0,1], x = u*(W-1) i.e. align_corners=True,
border clamp) against torch.nn.functional.grid_sample, the reference's
actual hot op (SURVEY.md §2 #15)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import neural_human_video_rendering_tpu.ops.grid_sample  # noqa: E402,F401
import sys  # noqa: E402

gs = sys.modules["neural_human_video_rendering_tpu.ops.grid_sample"]


def _torch_sample(img_hwc, x, y, W, H):
    """ATen bilinear grid_sample, align_corners=True, border padding."""
    t_img = torch.from_numpy(img_hwc.transpose(2, 0, 1)[None])
    gx = 2.0 * x / (W - 1) - 1.0
    gy = 2.0 * y / (H - 1) - 1.0
    grid = torch.from_numpy(np.stack([gx, gy], -1)[None])
    with torch.no_grad():
        out = torch.nn.functional.grid_sample(
            t_img, grid, mode="bilinear", padding_mode="border",
            align_corners=True)
    return out.numpy()[0].transpose(1, 2, 0)


def test_bilinear_matches_aten_inside_and_border():
    rng = np.random.RandomState(0)
    H = W = 9
    img = rng.randn(H, W, 3).astype(np.float32)
    # coords spanning interior, exact grid points, and out-of-range (clamp)
    x = rng.uniform(-2, W + 1, (13, 17)).astype(np.float32)
    y = rng.uniform(-2, H + 1, (13, 17)).astype(np.float32)
    ours = np.asarray(gs.grid_sample(jnp.asarray(img[None]),
                                     jnp.asarray(x[None]),
                                     jnp.asarray(y[None]))[0])
    # ATen border-pad: clamp the SAMPLE POSITION before interpolating —
    # clamp coords on our side the same way for the comparison
    ref = _torch_sample(img, np.clip(x, 0, W - 1), np.clip(y, 0, H - 1), W, H)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_texture_warp_reference_matches_aten_composition():
    """Full per-part warp + probability blend == ATen grid_sample x P."""
    rng = np.random.RandomState(1)
    B, P, T, H, W = 2, 4, 8, 6, 6
    tex = rng.randn(B, P, T, T, 3).astype(np.float32)
    uv = rng.uniform(0, 1, (B, H, W, P, 2)).astype(np.float32)
    probs = rng.dirichlet(np.ones(P + 1), (B, H, W)).astype(np.float32)

    ours = np.asarray(gs.texture_warp_reference(
        jnp.asarray(tex), jnp.asarray(uv), jnp.asarray(probs)))

    ref = np.zeros((B, H, W, 3), np.float32)
    for b in range(B):
        for p in range(P):
            x = uv[b, :, :, p, 0] * (T - 1)
            y = uv[b, :, :, p, 1] * (T - 1)
            samp = _torch_sample(tex[b, p], x, y, T, T)
            ref[b] += probs[b, :, :, p + 1:p + 2] * samp
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)
