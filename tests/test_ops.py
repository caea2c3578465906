"""Texture-warp / grid-sample op tests — the pinned sampling semantics."""

import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.ops import (flow_warp, grid_sample,
                                                  texture_warp,
                                                  texture_warp_reference)


def test_grid_sample_exact_at_integer_coords():
    img = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32))
    xs = jnp.asarray(np.array([[2.0, 5.0]], np.float32))
    ys = jnp.asarray(np.array([[3.0, 7.0]], np.float32))
    out = grid_sample(img, xs, ys)
    np.testing.assert_allclose(out[0, 0], img[0, 3, 2], rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], img[0, 7, 5], rtol=1e-6)


def test_grid_sample_bilinear_midpoint():
    img = np.zeros((1, 2, 2, 1), np.float32)
    img[0, 0, 0, 0] = 0.0
    img[0, 0, 1, 0] = 1.0
    img[0, 1, 0, 0] = 2.0
    img[0, 1, 1, 0] = 3.0
    out = grid_sample(jnp.asarray(img), jnp.full((1, 1), 0.5),
                      jnp.full((1, 1), 0.5))
    np.testing.assert_allclose(float(out[0, 0, 0]), 1.5, rtol=1e-6)


def test_grid_sample_clamps_at_border():
    img = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1))
    out = grid_sample(img, jnp.full((1, 1), -5.0), jnp.full((1, 1), -5.0))
    np.testing.assert_allclose(float(out[0, 0, 0]), 0.0)


def test_flow_warp_identity_and_shift():
    img = jnp.asarray(np.random.RandomState(1).rand(1, 8, 8, 2).astype(np.float32))
    out = flow_warp(img, jnp.zeros((1, 8, 8, 2)))
    np.testing.assert_allclose(out, img, rtol=1e-5)
    # shift by +1 in x: out(x) = img(x+1)
    flow = jnp.zeros((1, 8, 8, 2)).at[..., 0].set(1.0)
    out = np.asarray(flow_warp(img, flow))
    np.testing.assert_allclose(out[0, :, :-1], np.asarray(img)[0, :, 1:], rtol=1e-5)


def test_flow_warp_zero_outside():
    img = jnp.ones((1, 4, 4, 1))
    flow = jnp.full((1, 4, 4, 2), 10.0)
    out = flow_warp(img, flow)
    np.testing.assert_allclose(out, 0.0)


def _warp_inputs(B=2, P=4, T=8, H=8, W=8, seed=0):
    rng = np.random.RandomState(seed)
    tex = rng.rand(B, P, T, T, 3).astype(np.float32) * 2 - 1
    uv = rng.rand(B, H, W, P, 2).astype(np.float32)
    logits = rng.rand(B, H, W, P + 1).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return jnp.asarray(tex), jnp.asarray(uv), jnp.asarray(probs)


def test_texture_warp_reference_one_part_full_prob():
    B, P, T = 1, 2, 4
    tex = np.zeros((B, P, T, T, 3), np.float32)
    tex[0, 1] = 1.0                      # part 2 texture all ones
    uv = np.full((B, 4, 4, P, 2), 0.5, np.float32)
    probs = np.zeros((B, 4, 4, P + 1), np.float32)
    probs[..., 2] = 1.0                  # every pixel fully part 2
    out = texture_warp_reference(jnp.asarray(tex), jnp.asarray(uv),
                                 jnp.asarray(probs))
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_texture_warp_blend_weights():
    B, P, T = 1, 2, 4
    tex = np.zeros((B, P, T, T, 3), np.float32)
    tex[0, 0] = 1.0
    tex[0, 1] = 3.0
    uv = np.full((B, 2, 2, P, 2), 0.25, np.float32)
    probs = np.zeros((B, 2, 2, P + 1), np.float32)
    probs[..., 1] = 0.25
    probs[..., 2] = 0.5
    out = texture_warp_reference(jnp.asarray(tex), jnp.asarray(uv),
                                 jnp.asarray(probs))
    np.testing.assert_allclose(np.asarray(out), 0.25 * 1 + 0.5 * 3, rtol=1e-6)


def test_texture_warp_public_api_matches_reference():
    tex, uv, probs = _warp_inputs()
    ref = texture_warp_reference(tex, uv, probs)
    out = texture_warp(tex, uv, probs)        # CPU -> jnp fallback path
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_texture_warp_grad_flows():
    import jax
    tex, uv, probs = _warp_inputs()

    def f(t, u, p):
        return jnp.sum(texture_warp_reference(t, u, p) ** 2)

    g_tex, g_uv, g_probs = jax.grad(f, argnums=(0, 1, 2))(tex, uv, probs)
    assert np.isfinite(np.asarray(g_tex)).all()
    assert np.abs(np.asarray(g_uv)).max() > 0
    assert np.abs(np.asarray(g_probs)).max() > 0


def test_texture_warp_topk_full_k_matches_reference():
    from neural_human_video_rendering_tpu.ops import texture_warp_topk
    tex, uv, probs = _warp_inputs(P=4)
    ref = texture_warp_reference(tex, uv, probs)
    out = texture_warp_topk(tex, uv, probs, k=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_texture_warp_topk_peaked_probs():
    """With near-one-hot probs (the trained regime) top-2 ~= all-parts."""
    from neural_human_video_rendering_tpu.ops import texture_warp_topk
    rng = np.random.RandomState(0)
    B, P, T, H, W = 1, 8, 8, 8, 8
    tex = jnp.asarray(rng.rand(B, P, T, T, 3).astype(np.float32) * 2 - 1)
    uv = jnp.asarray(rng.rand(B, H, W, P, 2).astype(np.float32))
    hot = rng.randint(1, P + 1, (B, H, W))
    probs = 0.02 * rng.rand(B, H, W, P + 1).astype(np.float32)
    idx = np.indices((B, H, W))
    probs[idx[0], idx[1], idx[2], hot] = 1.0
    probs /= probs.sum(-1, keepdims=True)
    probs = jnp.asarray(probs)
    ref = texture_warp_reference(tex, uv, probs)
    out = texture_warp_topk(tex, uv, probs, k=2)
    assert float(jnp.abs(out - ref).max()) < 0.15
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.15)
