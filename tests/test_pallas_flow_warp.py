"""Pallas flow-warp kernel (ops/pallas_flow_warp.py) equivalence tests.

Interpret mode on CPU (the kernel auto-selects interpret off TPU); pinned
against the XLA-gather reference ops.grid_sample.flow_warp, including
out-of-image positions (zero) and border-clamped taps.
"""

import jax
import jax.numpy as jnp
import numpy as np

from neural_human_video_rendering_tpu.ops.grid_sample import flow_warp
from neural_human_video_rendering_tpu.ops.pallas_flow_warp import (
    flow_warp_pallas, flow_warp_supported)


def _inputs(B=1, H=128, W=256, C=3, mag=20.0, seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32) * 2 - 1)
    fl = jnp.asarray((rng.rand(B, H, W, 2).astype(np.float32) - 0.5) * 2 * mag)
    return img, fl


def test_supported_predicate():
    img, _ = _inputs()
    assert flow_warp_supported(img)
    assert not flow_warp_supported(jnp.zeros((1, 100, 128, 3)))


def test_matches_reference_small_flow():
    img, fl = _inputs(mag=8.0)
    ref = flow_warp(img, fl)
    out = flow_warp_pallas(img, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_matches_reference_large_flow_and_outside():
    # displacements big enough to cross tiles and leave the image
    img, fl = _inputs(H=256, W=128, mag=300.0, seed=1)
    ref = flow_warp(img, fl)
    out = flow_warp_pallas(img, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_zero_flow_identity():
    img, _ = _inputs(seed=2)
    out = flow_warp_pallas(img, jnp.zeros(img.shape[:3] + (2,)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=2e-6)


def test_two_channel_field():
    # the occlusion mask warps the 2-channel inverse flow field
    img, fl = _inputs(C=2, seed=3)
    ref = flow_warp(img, fl)
    out = flow_warp_pallas(img, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_gradients_match_reference():
    img, fl = _inputs(H=128, W=128, mag=10.0, seed=4)

    def loss(fn):
        return lambda i, f: jnp.mean(fn(i, f) ** 2)

    gr = jax.grad(loss(flow_warp), argnums=(0, 1))(img, fl)
    gp = jax.grad(loss(flow_warp_pallas), argnums=(0, 1))(img, fl)
    for name, a, b in zip(("dimg", "dflow"), gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5,
                                   err_msg=name)
