"""Reconstruction / densepose-supervision losses (SURVEY.md §2 #18).

Weights from the reference launcher: --lambda_L2 500 --lambda_UV 1000
--lambda_Prob 10 --use_densepose_loss (train_start/pretrain_start.sh:31-34).
All reductions in float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def l2_loss(fake: jnp.ndarray, real: jnp.ndarray) -> jnp.ndarray:
    """Mean squared reconstruction error on the composite frame."""
    return jnp.mean((fake.astype(jnp.float32) - real.astype(jnp.float32)) ** 2)


def uv_loss(uv_pred: jnp.ndarray, dp_uv: jnp.ndarray,
            dp_parts: jnp.ndarray) -> jnp.ndarray:
    """L1 on predicted UV vs DensePose pseudo-GT, at the GT part only.

    uv_pred: (B,H,W,P,2); dp_uv: (B,H,W,2) in [0,1]; dp_parts: (B,H,W) int,
    0 = background. For each foreground pixel, only the channel group of its
    GT part is supervised (one-hot gather, no dynamic indexing).
    """
    P = uv_pred.shape[3]
    onehot = jax.nn.one_hot(dp_parts - 1, P, dtype=jnp.float32)     # (B,H,W,P)
    pred = jnp.sum(uv_pred.astype(jnp.float32) * onehot[..., None], axis=3)
    fg = (dp_parts > 0).astype(jnp.float32)[..., None]
    err = jnp.abs(pred - dp_uv.astype(jnp.float32)) * fg
    return jnp.sum(err) / jnp.maximum(jnp.sum(fg) * 2.0, 1.0)


def uv_grad_loss(uv_pred: jnp.ndarray, dp_uv: jnp.ndarray,
                 dp_parts: jnp.ndarray) -> jnp.ndarray:
    """L1 on spatial finite differences of predicted vs pseudo-GT UV.

    A difference pair is supervised only when BOTH pixels carry the same
    nonzero GT part (within-part interiors; part boundaries and background
    contribute nothing). Complements uv_loss: absolute UV may drift under
    noisy DensePose pseudo-GT, but the local warp Jacobian it encodes is the
    thing texture sampling actually needs to be continuous.

    uv_pred: (B,H,W,P,2); dp_uv: (B,H,W,2) in [0,1]; dp_parts: (B,H,W) int.
    """
    P = uv_pred.shape[3]
    onehot = jax.nn.one_hot(dp_parts - 1, P, dtype=jnp.float32)     # (B,H,W,P)
    pred = jnp.sum(uv_pred.astype(jnp.float32) * onehot[..., None], axis=3)
    gt = dp_uv.astype(jnp.float32)
    total, count = jnp.float32(0.0), jnp.float32(0.0)
    for axis in (1, 2):
        dp_ = jnp.diff(pred, axis=axis)
        dg_ = jnp.diff(gt, axis=axis)
        lo = jax.lax.slice_in_dim(dp_parts, 0, dp_parts.shape[axis] - 1, axis=axis)
        hi = jax.lax.slice_in_dim(dp_parts, 1, dp_parts.shape[axis], axis=axis)
        valid = ((lo == hi) & (lo > 0)).astype(jnp.float32)[..., None]
        total += jnp.sum(jnp.abs(dp_ - dg_) * valid)
        count += jnp.sum(valid) * 2.0
    return total / jnp.maximum(count, 1.0)


def part_ce_loss(logits: jnp.ndarray, dp_parts: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Softmax cross-entropy of part logits vs DensePose part index.

    logits: (B,H,W,P+1) with background at channel 0; dp_parts: (B,H,W).
    Optional mask (B,H,W,1) restricts supervision (pretrain uses the person
    segmentation mask, reference: pretrainTrans.sh:7).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot multiply-reduce instead of take_along_axis: XLA fuses the
    # iota-compare inline (no gather — TPU gathers run ~110M elem/s and
    # this one cost ~8 ms/step at 512px)
    onehot = jax.nn.one_hot(dp_parts, logp.shape[-1], dtype=logp.dtype)
    picked = jnp.sum(logp * onehot, axis=-1)
    if mask is not None:
        m = mask[..., 0].astype(jnp.float32)
        return -jnp.sum(picked * m) / jnp.maximum(jnp.sum(m), 1.0)
    return -jnp.mean(picked)


def mask_loss(pred_mask: jnp.ndarray, gt_mask: jnp.ndarray) -> jnp.ndarray:
    """L1 between the predicted soft mask and the (noisy) segmentation GT.

    Weighted low so the mask can refine past the noisy GT online
    (reference: README.md:60).
    """
    return jnp.mean(jnp.abs(pred_mask.astype(jnp.float32)
                            - gt_mask.astype(jnp.float32)))


def ms_iuv_loss(aux, dp_uv: jnp.ndarray, dp_parts: jnp.ndarray,
                mask: Optional[jnp.ndarray] = None):
    """Deep-supervision IUV loss over --ms_uv aux heads.

    aux: tuple of (logits_k (B,h,w,P+1), uv_k (B,h,w,P,2)) at intermediate
    decoder resolutions; dp_uv/dp_parts/mask are the full-resolution
    DensePose pseudo-GT. Each scale is supervised against the GT
    stride-subsampled to its own (h, w) — nearest subsampling keeps part
    indices categorical (any interpolation would invent part labels at
    boundaries). Returns (uv_total, ce_total), each the MEAN over scales so
    the weight of the aux objective doesn't grow with --ms_uv.
    """
    if not aux:
        z = jnp.float32(0.0)
        return z, z
    H, W = dp_parts.shape[1], dp_parts.shape[2]
    uv_t, ce_t = jnp.float32(0.0), jnp.float32(0.0)
    for logits_k, uv_k in aux:
        fh, fw = H // logits_k.shape[1], W // logits_k.shape[2]
        parts_k = dp_parts[:, ::fh, ::fw]
        duv_k = dp_uv[:, ::fh, ::fw]
        uv_t += uv_loss(uv_k, duv_k, parts_k)
        ce_t += part_ce_loss(logits_k, parts_k,
                             mask[:, ::fh, ::fw] if mask is not None else None)
    n = jnp.float32(len(aux))
    return uv_t / n, ce_t / n
