"""Temporal flow-warp loss (SURVEY.md §2 #18; --lambda_Temp 500).

Warps the previous frame's output to the current frame via FlowNet2 forward
flow and penalizes mismatch, with occlusion-aware masking from
forward/backward flow consistency (reference: train_start/
pretrain_start.sh:21-22,37 — flow + flow_inv are both loaded).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.pallas_flow_warp import flow_warp_fast as flow_warp


def occlusion_mask(flow: jnp.ndarray, flow_inv: jnp.ndarray,
                   alpha: float = 0.01, beta: float = 0.5) -> jnp.ndarray:
    """(B,H,W,1) soft non-occlusion mask via forward-backward consistency.

    A pixel is visible in both frames when flow(p) + flow_inv(p + flow(p))
    is small relative to the flow magnitudes (standard FB-consistency test).
    """
    fwd_warped_inv = flow_warp(flow_inv, flow)          # flow_inv at p+flow(p)
    diff2 = jnp.sum((flow + fwd_warped_inv) ** 2, axis=-1, keepdims=True)
    mag2 = jnp.sum(flow ** 2 + fwd_warped_inv ** 2, axis=-1, keepdims=True)
    return (diff2 < alpha * mag2 + beta).astype(jnp.float32)


def temporal_flow_loss(cur: jnp.ndarray, prev: jnp.ndarray, flow: jnp.ndarray,
                       flow_inv: jnp.ndarray) -> jnp.ndarray:
    """L1 between current output and flow-warped previous output, masked.

    cur/prev: (B,H,W,3) rendered frames t and t-1; flow maps frame t pixels
    back into frame t-1 (backward flow convention: prev sampled at p+flow).
    """
    # prev and flow_inv are warped by the SAME flow field: one fused kernel
    # launch over 5 channels shares the coordinate/mask computation
    warped = flow_warp(jnp.concatenate(
        [prev, flow_inv.astype(prev.dtype)], axis=-1), flow)
    warped_prev, warped_inv = warped[..., :3], warped[..., 3:]
    diff2 = jnp.sum((flow + warped_inv) ** 2, axis=-1, keepdims=True)
    mag2 = jnp.sum(flow ** 2 + warped_inv ** 2, axis=-1, keepdims=True)
    mask = (diff2 < 0.01 * mag2 + 0.5).astype(jnp.float32)
    err = jnp.abs(cur.astype(jnp.float32) - warped_prev.astype(jnp.float32))
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask) * 3.0, 1.0)
