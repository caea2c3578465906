"""Bilinear sampling ops: the framework's grid_sample equivalents.

The reference's hot custom op is ATen ``grid_sample`` warping the learned
per-part texture atlas at predicted UV coordinates, blended by part
probabilities (SURVEY.md §2 #15; reference: README.md:50,64). Here that is a
pure-jnp gather formulation XLA lowers to TPU dynamic-gathers; ops.pallas_warp
provides the fused Pallas kernel that must match this reference bit-for-bit
(tests/test_ops.py pins equivalence).

Semantics pinned (spec of record):
  * UV in [0, 1]; sample position x = u * (W - 1)  (align_corners=True).
  * Out-of-range positions clamp to the border (texture atlas tiles are
    padded islands, so clamping is correct and cheap on TPU).
  * flow_warp uses zero padding outside the image (matches the temporal
    loss needing black borders to be masked by occlusion, SURVEY.md §2 #18).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C); ix, iy int32 (...,) -> (..., C) via flat take."""
    H, W = img.shape[0], img.shape[1]
    flat = img.reshape(H * W, -1)
    idx = iy * W + ix
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, img.shape[-1])


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
              zero_outside: bool) -> jnp.ndarray:
    """Sample img (H,W,C) at float pixel coords x, y (...,) -> (..., C)."""
    H, W = img.shape[0], img.shape[1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f)[..., None]
    wy = (y - y0f)[..., None]
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, H - 1)
    v00 = _gather_2d(img, x0, y0)
    v01 = _gather_2d(img, x1, y0)
    v10 = _gather_2d(img, x0, y1)
    v11 = _gather_2d(img, x1, y1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    if zero_outside:
        inside = ((x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1))[..., None]
        out = jnp.where(inside, out, 0.0)
    return out


def grid_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                zero_outside: bool = False) -> jnp.ndarray:
    """Batched bilinear sampling. img (B,H,W,C); x,y (B,...) pixel coords."""
    return jax.vmap(lambda im, xx, yy: _bilinear(im, xx, yy, zero_outside))(img, x, y)


def flow_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp img (B,H,W,C) by flow (B,H,W,2): out(p) = img(p + flow(p)).

    flow channel 0 = dx, channel 1 = dy, in pixels. Zero padding outside.
    Matches the temporal-loss warp of the previous frame by FlowNet2 flow
    (reference: train_start/pretrain_start.sh:21-22,37).
    """
    B, H, W = img.shape[0], img.shape[1], img.shape[2]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    x = xs + flow[..., 0]
    y = ys + flow[..., 1]
    return grid_sample(img, x, y, zero_outside=True)


def texture_warp_reference(tex: jnp.ndarray, uv: jnp.ndarray,
                           probs: jnp.ndarray) -> jnp.ndarray:
    """Per-part texture warp + probability blend (jnp reference).

    Args:
      tex:   (B, P, Ht, Wt, C) per-part texture tiles in [-1, 1].
      uv:    (B, H, W, P, 2) UV coords in [0, 1] (u -> x axis, v -> y axis).
      probs: (B, H, W, P+1) part probabilities, channel 0 = background.

    Returns:
      (B, H, W, C) foreground render  fg = sum_p probs[..., p+1] * tex_p(uv_p).
    """
    B, P, Ht, Wt, C = tex.shape
    x = uv[..., 0] * (Wt - 1)          # (B, H, W, P)
    y = uv[..., 1] * (Ht - 1)

    def per_part(tex_p, x_p, y_p):      # (Ht,Wt,C), (H,W), (H,W)
        return _bilinear(tex_p, x_p, y_p, zero_outside=False)

    def per_batch(tex_b, x_b, y_b):     # (P,Ht,Wt,C), (H,W,P), (H,W,P)
        samp = jax.vmap(per_part, in_axes=(0, 2, 2))(tex_b, x_b, y_b)  # (P,H,W,C)
        return samp

    samples = jax.vmap(per_batch)(tex, x, y)                 # (B,P,H,W,C)
    w = jnp.moveaxis(probs[..., 1:], -1, 1)[..., None]       # (B,P,H,W,1)
    return jnp.sum(samples * w, axis=1)


def texture_warp_topk(tex: jnp.ndarray, uv: jnp.ndarray, probs: jnp.ndarray,
                      k: int = 4, eps: float = 0.0) -> jnp.ndarray:
    """TPU-first texture warp: sample only each pixel's top-k parts.

    The reference semantics (texture_warp_reference) sample ALL P parts per
    pixel and blend — a (B, P, H, W, C) intermediate (~1.2 GB/frame at
    512 px) and P gathers per pixel. After (even a little) training the part
    probabilities are near-one-hot, so the blend is dominated by the k most
    probable parts; sampling only those is numerically equivalent at part
    interiors and a faithful soft blend at part seams, with P/k times less
    gather traffic and memory. k == P reproduces the reference exactly
    (pinned by tests/test_ops.py).

    Layout note (load-bearing): everything here lives in "plane" layout —
    (B, k, N) / (B, N) with N = H*W on the minor axis. TPU tiles the last
    two dims to (8, 128); tensors shaped (..., k) or (..., k, C) with k=4,
    C=3 trailing get padded 32x (a 48 MB tap buffer becomes 1.5 GB and the
    step OOMs — observed in the XLA allocation dump). top-k itself is an
    unrolled argmax+mask loop for the same reason: jax.lax.top_k would
    produce (B, H, W, k) intermediates.

    Shapes as texture_warp_reference; k is static.
    """
    B, P, Ht, Wt, C = tex.shape
    H, W = uv.shape[1], uv.shape[2]
    N = H * W

    fg = jnp.moveaxis(probs[..., 1:], -1, 1).reshape(B, P, N)    # (B,P,N)
    u = jnp.moveaxis(uv[..., 0], -1, 1).reshape(B, P, N)
    v = jnp.moveaxis(uv[..., 1], -1, 1).reshape(B, P, N)

    # iterative top-k: k x (argmax over P + mask); intermediates (B,N)/(B,P,N)
    part_ids = jnp.arange(P, dtype=jnp.int32)[None, :, None]
    remaining = fg
    idx_list, w_list = [], []
    for _ in range(k):
        a = jnp.argmax(remaining, axis=1).astype(jnp.int32)      # (B,N)
        a_e = a[:, None, :]
        w = jnp.take_along_axis(remaining, a_e, axis=1)[:, 0]    # (B,N)
        idx_list.append(a)
        w_list.append(jnp.maximum(w, 0.0))
        remaining = jnp.where(part_ids == a_e, -jnp.inf, remaining)
    part_idx = jnp.stack(idx_list, axis=1)                       # (B,k,N)
    wk = jnp.stack(w_list, axis=1)                               # (B,k,N)
    if eps > 0.0:
        # drop sub-eps blend weights (selection-set shrink, same
        # stop-gradient semantics as the top-k membership itself).
        # Error bound: <= k*eps of blend mass per pixel, regime-
        # independent — see pallas_warp2._topk_dense_weights.
        wk = jnp.where(jax.lax.stop_gradient(wk) >= eps, wk, 0.0)

    u_k = jnp.take_along_axis(u, part_idx, axis=1)               # (B,k,N)
    v_k = jnp.take_along_axis(v, part_idx, axis=1)
    x = u_k * (Wt - 1)
    y = v_k * (Ht - 1)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, Wt - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, Wt - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, Ht - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, Ht - 1)
    base = part_idx * (Ht * Wt)                                  # (B,k,N)

    # per-channel texture planes (B, P*Ht*Wt): gathers stay (B, k*N)-shaped
    tex_chan = [tex[..., c].reshape(B, P * Ht * Wt) for c in range(C)]

    def tap(ix, iy):
        idx = (base + iy * Wt + ix).reshape(B, k * N)
        return [jnp.take_along_axis(tc, idx, axis=1).reshape(B, k, N)
                for tc in tex_chan]                              # C x (B,k,N)

    v00 = tap(x0, y0)
    v01 = tap(x1, y0)
    v10 = tap(x0, y1)
    v11 = tap(x1, y1)
    chans = []
    for c in range(C):
        samp = ((v00[c] * (1 - wx) + v01[c] * wx) * (1 - wy)
                + (v10[c] * (1 - wx) + v11[c] * wx) * wy)        # (B,k,N)
        chans.append(jnp.sum(samp * wk, axis=1))                 # (B,N)
    out = jnp.stack(chans, axis=1).reshape(B, C, H, W)
    return jnp.moveaxis(out, 1, -1)                              # (B,H,W,C)
