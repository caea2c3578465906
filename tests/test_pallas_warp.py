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


def _inputs(B=2, P=5, T=128, H=32, W=32, seed=0, C=3):
    rng = np.random.RandomState(seed)
    tex = jnp.asarray(rng.rand(B, P, T, T, C).astype(np.float32) * 2 - 1)
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


def test_block_part_cap_noop_when_peaked():
    """With peaked probabilities the per-block part cap selects the same
    parts as plain per-pixel top-k: identical output and gradients."""
    rng = np.random.RandomState(3)
    B, P, T, H, W = 1, 6, 128, 64, 64
    tex = jnp.asarray(rng.rand(B, P, T, T, 3).astype(np.float32) * 2 - 1)
    uv = jnp.asarray(rng.rand(B, H, W, P, 2).astype(np.float32))
    # spatially coherent: one dominant part per 16-row band (= one kernel
    # block at W=64), distinct sub-dominant logits so per-pixel top-2 is
    # always within the block's top-4 mass
    lg = np.empty((B, H, W, P + 1), np.float32)
    lg[..., 0] = -8.0
    for p in range(1, P + 1):
        lg[..., p] = -8.0 + 0.1 * p
    for band in range(4):
        dom = 1 + (band * 2) % P
        lg[:, band * 16:(band + 1) * 16, :, dom] = 8.0
    probs = jnp.asarray(np.exp(lg) / np.exp(lg).sum(-1, keepdims=True))

    def loss(t, u, p, cap):
        return jnp.mean(texture_warp_pallas(t, u, p, 2, cap) ** 2)

    ref, gref = jax.value_and_grad(loss, argnums=(0, 1, 2))(tex, uv, probs, 0)
    out, gout = jax.value_and_grad(loss, argnums=(0, 1, 2))(tex, uv, probs, 4)
    np.testing.assert_allclose(float(out), float(ref), atol=1e-6)
    for name, a, b in zip(("dtex", "duv", "dprobs"), gref, gout):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6,
                                   err_msg=name)


def test_block_part_cap_keeps_top_mass_parts():
    """Under the cap, only the block's top-mass parts contribute."""
    from neural_human_video_rendering_tpu.ops.pallas_warp2 import (
        _topk_dense_weights)
    rng = np.random.RandomState(5)
    B, P, N = 1, 6, 2048  # 2 kernel blocks
    fg = jnp.asarray(rng.rand(B, P, N).astype(np.float32))
    w = np.asarray(_topk_dense_weights(fg, P, block_parts=2))
    mass = np.asarray(fg).reshape(B, P, 2, 1024).sum(-1)  # (B,P,NB)
    for nb in range(2):
        active = {p for p in range(P) if w[0, p, nb * 1024:(nb + 1) * 1024].any()}
        top2 = set(np.argsort(mass[0, :, nb])[-2:])
        assert active == top2


def test_block_part_cap_defaults_off():
    """The block cap is lossy on spatially incoherent part maps (it zeroes
    every part below a block's top-`block_parts` mass), which is exactly
    the regime of training — a resumed 512px run collapsed PSNR 28->19
    under block_parts=8 (2026-08-17). It must therefore be opt-in."""
    from neural_human_video_rendering_tpu.config import Options
    from neural_human_video_rendering_tpu.models.renderer import NeuralRenderer
    assert Options().warp_block_parts == 0
    assert NeuralRenderer.warp_block_parts == 0


def test_block_part_cap_is_lossy_on_incoherent_probs():
    """Documents WHY the cap defaults off: peaked but spatially random
    part maps lose most of their mass under block_parts < P."""
    from neural_human_video_rendering_tpu.ops.pallas_warp2 import (
        _topk_dense_weights)
    rng = np.random.RandomState(7)
    B, P, N = 1, 24, 1024  # one kernel block touching all 24 parts
    lg = rng.randn(B, N, P + 1).astype(np.float32) * 8.0  # peaked
    probs = np.exp(lg) / np.exp(lg).sum(-1, keepdims=True)
    fg = jnp.asarray(np.moveaxis(probs[..., 1:], -1, 1))
    w_exact = np.asarray(_topk_dense_weights(fg, 4, block_parts=0))
    w_cap = np.asarray(_topk_dense_weights(fg, 4, block_parts=8))
    lost = 1.0 - w_cap.sum() / w_exact.sum()
    assert lost > 0.3, lost  # the cap silently drops >30% of blend mass


def test_warp_eps_defaults_and_bound():
    """warp_eps drops sub-eps blend weights with an a-priori bound of
    k*eps blend mass per pixel — the principled replacement for the
    demoted block cap (engages the kernel's block skip on trained
    checkpoints; exact at early-training prob levels)."""
    from neural_human_video_rendering_tpu.config import Options
    from neural_human_video_rendering_tpu.models.renderer import NeuralRenderer
    assert Options().warp_eps == 1e-3
    assert NeuralRenderer.warp_eps == 1e-3

    rng = np.random.RandomState(3)
    B, P, H, W, T, C = 1, 6, 8, 128, 8, 2
    tex = jnp.asarray(rng.rand(B, P, T, T, C).astype(np.float32)) * 2 - 1
    uv = jnp.asarray(rng.rand(B, H, W, P, 2).astype(np.float32))
    # peaked probs -> most parts' weights are tiny
    lg = rng.randn(B, H, W, P + 1).astype(np.float32) * 6.0
    probs = jnp.asarray(np.exp(lg) / np.exp(lg).sum(-1, keepdims=True))
    k, eps = 4, 1e-3
    exact = texture_warp_topk(tex, uv, probs, k=k)
    dropped = texture_warp_topk(tex, uv, probs, k=k, eps=eps)
    assert float(jnp.abs(exact - dropped).max()) <= k * eps + 1e-6
    assert float(jnp.abs(exact - dropped).max()) > 0  # it did drop some


def test_warp_eps_selection_semantics():
    """Weights below eps are zeroed, at/above eps are kept verbatim."""
    from neural_human_video_rendering_tpu.ops.pallas_warp2 import (
        _topk_dense_weights)
    fg = jnp.asarray(
        np.array([[[0.5], [0.01], [0.0005], [0.2]]], np.float32))  # (1,4,1)
    w = np.asarray(_topk_dense_weights(fg, 4, eps=1e-3))[:, :, 0]
    np.testing.assert_allclose(w, [[0.5, 0.01, 0.0, 0.2]])


def test_warp_eps_exact_at_uniform_probs():
    """Early-training regime: near-uniform probs all exceed eps=1e-3, so
    the threshold changes nothing (the bench/worst case stays honest)."""
    from neural_human_video_rendering_tpu.ops.pallas_warp2 import (
        _topk_dense_weights)
    P = 24
    fg = jnp.full((1, P, 8), 1.0 / (P + 1), jnp.float32)
    w0 = np.asarray(_topk_dense_weights(fg, 4, eps=0.0))
    w1 = np.asarray(_topk_dense_weights(fg, 4, eps=1e-3))
    np.testing.assert_array_equal(w0, w1)


def test_warp_eps_applies_on_all_parts_fallback():
    """k=0 / k>=P ("all parts") must still honor eps on the non-Pallas
    path, matching the Pallas path's kk=P+eps routing."""
    from neural_human_video_rendering_tpu.ops.pallas_warp import texture_warp
    rng = np.random.RandomState(9)
    B, P, H, W, T, C = 1, 5, 4, 4, 8, 2
    tex = jnp.asarray(rng.rand(B, P, T, T, C).astype(np.float32))
    uv = jnp.asarray(rng.rand(B, H, W, P, 2).astype(np.float32))
    lg = rng.randn(B, H, W, P + 1).astype(np.float32) * 6.0
    probs = jnp.asarray(np.exp(lg) / np.exp(lg).sum(-1, keepdims=True))
    out = texture_warp(tex, uv, probs, use_pallas=False, k=0, eps=1e-3)
    ref = texture_warp_topk(tex, uv, probs, k=P, eps=1e-3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    exact = texture_warp_topk(tex, uv, probs, k=P)
    assert float(jnp.abs(out - exact).max()) > 0  # eps engaged


def test_dispatcher_uses_pallas_on_supported_shapes(monkeypatch):
    from neural_human_video_rendering_tpu.ops import pallas_warp as pw
    tex, uv, probs = _inputs()
    monkeypatch.setattr(pw, "_PALLAS_OK", True)
    out = pw.texture_warp(tex, uv, probs, use_pallas=True, k=3)
    ref = texture_warp_topk(tex, uv, probs, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_topk_kernel_matches_dense_weights():
    """The fused Pallas selection kernel == _topk_dense_weights exactly."""
    from neural_human_video_rendering_tpu.ops.pallas_warp2 import (
        _topk_call, _topk_dense_weights)
    rng = np.random.RandomState(11)
    B, P, N = 2, 7, 3072   # 3 kernel blocks
    fg = jnp.asarray(rng.rand(B, P, N).astype(np.float32))
    for k, cap in [(3, 0), (2, 4), (7, 2), (1, 0)]:
        ref = np.asarray(_topk_dense_weights(fg, k, cap))
        got = np.asarray(_topk_call(
            fg.reshape(B, P, N // 1024, 8, 128), k, cap)).reshape(B, P, N)
        np.testing.assert_array_equal(got, ref, err_msg=f"k={k} cap={cap}")


def test_small_tile_pad_is_bit_exact():
    """Sub-128 tiles ride the kernel via zero-pad + the `ext` effective
    tile edge: the kernel samples and CLIPS on the (T-1) grid, so the
    padded op is bit-identical to the unpadded reference — values and all
    three gradients, arbitrary uv (no boundary-safe dance needed; the old
    uv-rescale dispatch double-rounded and could flip floor() cells)."""
    from neural_human_video_rendering_tpu.ops.grid_sample import (
        texture_warp_reference)
    from neural_human_video_rendering_tpu.ops.pallas_warp2 import _TILE

    tex, uv, probs = _inputs(T=64, seed=7)
    # include exact texel boundaries and the u=1.0 edge in the probe set
    uv = uv.at[0, 0, 0].set(1.0).at[0, 0, 1].set(31.0 / 63.0)
    ref = texture_warp_reference(tex, uv, probs)
    k = tex.shape[1]

    def padded(fn, t, u, p):
        pad = _TILE - t.shape[2]
        tp = jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, pad), (0, 0)))
        return fn(tp, u, p)

    out_k = padded(lambda t, u, p: texture_warp_pallas(t, u, p, k, 0, 0.0,
                                                       tex.shape[2]),
                   tex, uv, probs)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), atol=2e-6)

    def loss(fn):
        return lambda t, u, p: jnp.mean(fn(t, u, p) ** 2)

    gr = jax.grad(loss(texture_warp_reference), argnums=(0, 1, 2))(
        tex, uv, probs)
    gp = jax.grad(loss(lambda t, u, p: padded(
        lambda tp, up, pp: texture_warp_pallas(tp, up, pp, k, 0, 0.0,
                                               tex.shape[2]), t, u, p)),
        argnums=(0, 1, 2))(tex, uv, probs)
    for name, a, b in zip(("dtex", "duv", "dprobs"), gr, gp):
        # dtex of the padded op has extra zero rows/cols; compare the live
        # region
        a_np, b_np = np.asarray(a), np.asarray(b)
        if name == "dtex":
            b_np = b_np[:, :, :a_np.shape[2], :a_np.shape[3]]
        np.testing.assert_allclose(b_np, a_np, atol=1e-5, err_msg=name)


def test_dispatch_small_tile_matches_topk_exactly(monkeypatch):
    """The full dispatch path (pad + ext) vs the XLA top-k at tile 64."""
    from neural_human_video_rendering_tpu.ops import pallas_warp as pw
    tex, uv, probs = _inputs(T=64, seed=11)
    monkeypatch.setattr(pw, "_PALLAS_OK", True)
    out = pw.texture_warp(tex, uv, probs, use_pallas=True, k=3)
    ref = texture_warp_topk(tex, uv, probs, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


# ---------------------------------------------------------------- bf16 mode

def test_bf16_forward_close_to_f32():
    """compute_dtype=bfloat16 must match the exact kernel within bf16
    product rounding (~2^-8 relative on [-1,1] textures)."""
    tex, uv, probs = _inputs(P=5, seed=7)
    exact = texture_warp_pallas(tex, uv, probs, 3)
    bf16 = texture_warp_pallas(tex, uv, probs, 3,
                               compute_dtype="bfloat16")
    err = np.abs(np.asarray(bf16) - np.asarray(exact))
    assert err.max() < 0.02, err.max()
    assert err.mean() < 3e-3, err.mean()


def test_bf16_gradients_close_to_f32():
    tex, uv, probs = _inputs(P=5, seed=8)

    def loss(cd):
        return lambda t, u, p: jnp.mean(
            texture_warp_pallas(t, u, p, 3, 0, 0.0, 128, cd) ** 2)

    g32 = jax.grad(loss("float32"), argnums=(0, 1, 2))(tex, uv, probs)
    g16 = jax.grad(loss("bfloat16"), argnums=(0, 1, 2))(tex, uv, probs)
    for name, a, b in zip(("dtex", "duv", "dprobs"), g32, g16):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        assert np.abs(b - a).max() / scale < 0.03, (
            name, np.abs(b - a).max(), scale)


def test_bf16_zero_weight_parts_still_exact_zero():
    """The block-skip and zero-weight semantics are dtype-independent."""
    tex, uv, _ = _inputs(B=1, P=5, H=64, W=64, seed=9)
    p = np.zeros((1, 64, 64, 6), np.float32)
    p[..., 2] = 1.0
    probs = jnp.asarray(p)
    ref = texture_warp_topk(tex, uv, probs, 2)
    out = texture_warp_pallas(tex, uv, probs, 2,
                              compute_dtype="bfloat16")
    # part-1-only blend of a bf16-rounded texture: error is pure rounding
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 0.02


def test_bf16_forward_bitexact_vs_f32_on_rounded_texture():
    """The packed-i32 bf16 mode's forward is EXACTLY the f32 kernel run on
    a bf16-rounded texture (packing moves bits, unpacked math is f32) —
    stronger than the old tolerance contract, pinned bit-for-bit."""
    tex, uv, probs = _inputs(P=5, seed=12)
    tex_rounded = tex.astype(jnp.bfloat16).astype(jnp.float32)
    ref = texture_warp_pallas(tex_rounded, uv, probs, 3)
    out = texture_warp_pallas(tex, uv, probs, 3, compute_dtype="bfloat16")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_bf16_even_channel_count_packs_without_padding():
    """C=4 exercises the no-pad packing branch (C=3 pads a zero plane)."""
    tex, uv, probs = _inputs(P=4, C=4, seed=13)
    tex_rounded = tex.astype(jnp.bfloat16).astype(jnp.float32)
    ref = texture_warp_pallas(tex_rounded, uv, probs, 2)
    out = texture_warp_pallas(tex, uv, probs, 2, compute_dtype="bfloat16")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_bf16_even_channel_gradients_close_to_f32():
    """Backward of the NO-PAD packing branch (C=4): the odd half-word of a
    fully-used plane (channel 2i+1 unpack + its dtex matmul) has its own
    code path vs the C=3 padded case — pin its gradients the same way
    test_bf16_gradients_close_to_f32 pins C=3's."""
    tex, uv, probs = _inputs(P=4, C=4, seed=14)
    tex_rounded = tex.astype(jnp.bfloat16).astype(jnp.float32)

    def loss(cd):
        return lambda t, u, p: jnp.mean(
            texture_warp_pallas(t, u, p, 3, 0, 0.0, 128, cd) ** 2)

    # f32 kernel on the ROUNDED texture = the bf16 mode's exact math on
    # everything but the dtex MXU accumulation dtype
    g32 = jax.grad(loss("float32"), argnums=(0, 1, 2))(tex_rounded, uv, probs)
    g16 = jax.grad(loss("bfloat16"), argnums=(0, 1, 2))(tex, uv, probs)
    for name, a, b in zip(("dtex", "duv", "dprobs"), g32, g16):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        assert np.abs(b - a).max() / scale < 0.03, (
            name, np.abs(b - a).max(), scale)


def test_bf16_renderer_flag_threads_through(tiny_opt):
    """--warp_dtype reaches the renderer (and the XLA fallback ignores it,
    staying exact on CPU test shapes)."""
    import dataclasses

    from neural_human_video_rendering_tpu.models.renderer import (
        renderer_from_options)
    opt = dataclasses.replace(tiny_opt, warp_dtype="bfloat16")
    r = renderer_from_options(opt)
    assert r.warp_dtype == "bfloat16"
