"""Fused Pallas texture-warp kernel (ops/pallas_warp2.py) equivalence tests.

Run in Pallas interpret mode on CPU (the kernel auto-selects interpret off
TPU); the same code path compiles under Mosaic on hardware. Equivalence is
against the XLA top-k reference, values AND all three gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_human_video_rendering_tpu.ops.grid_sample import texture_warp_topk
from neural_human_video_rendering_tpu.ops.pallas_warp2 import (
    pallas_warp_supported, texture_warp_pallas)


def _inputs(B=2, P=5, T=128, H=32, W=32, seed=0):
    rng = np.random.RandomState(seed)
    tex = jnp.asarray(rng.rand(B, P, T, T, 3).astype(np.float32) * 2 - 1)
    uv = jnp.asarray(rng.rand(B, H, W, P, 2).astype(np.float32))
    lg = rng.rand(B, H, W, P + 1).astype(np.float32) * 3
    probs = jnp.asarray(np.exp(lg) / np.exp(lg).sum(-1, keepdims=True))
    return tex, uv, probs


def test_supported_predicate():
    tex, uv, _ = _inputs()
    assert pallas_warp_supported(tex, uv)
    tex64 = jnp.zeros((1, 4, 64, 64, 3))
    uv64 = jnp.zeros((1, 32, 32, 4, 2))
    assert not pallas_warp_supported(tex64, uv64)  # tile != 128


@pytest.mark.parametrize("k,P", [(3, 5), (4, 24), (5, 5)])
def test_forward_matches_topk(k, P):
    tex, uv, probs = _inputs(P=P, seed=k)
    ref = texture_warp_topk(tex, uv, probs, k)
    out = texture_warp_pallas(tex, uv, probs, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_gradients_match_topk():
    k = 3
    tex, uv, probs = _inputs()

    def loss(fn):
        return lambda t, u, p: jnp.mean(fn(t, u, p, k) ** 2)

    gr = jax.grad(loss(texture_warp_topk), argnums=(0, 1, 2))(tex, uv, probs)
    gp = jax.grad(loss(texture_warp_pallas), argnums=(0, 1, 2))(tex, uv, probs)
    for name, a, b in zip(("dtex", "duv", "dprobs"), gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6,
                                   err_msg=name)


def test_block_skip_correctness():
    """Blocks where a part has zero top-k weight must contribute exactly 0."""
    tex, uv, probs = _inputs(B=1, P=5, H=64, W=64)
    # concentrate all probability on part 1 for the whole image: other
    # parts' (block, part) steps are skipped
    p = np.zeros((1, 64, 64, 6), np.float32)
    p[..., 2] = 1.0
    probs = jnp.asarray(p)
    ref = texture_warp_topk(tex, uv, probs, 2)
    out = texture_warp_pallas(tex, uv, probs, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_dispatcher_uses_pallas_on_supported_shapes(monkeypatch):
    from neural_human_video_rendering_tpu.ops import pallas_warp as pw
    tex, uv, probs = _inputs()
    monkeypatch.setattr(pw, "_PALLAS_OK", True)
    out = pw.texture_warp(tex, uv, probs, use_pallas=True, k=3)
    ref = texture_warp_topk(tex, uv, probs, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
