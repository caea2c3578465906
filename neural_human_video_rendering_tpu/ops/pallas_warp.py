"""Texture-warp dispatch: route to the fastest correct implementation.

Paths, in preference order:
  1. ops.pallas_warp2.texture_warp_pallas — the fused Mosaic kernel
     (TPU, tile==128, H*W % 1024 == 0). ~10x the XLA gather path.
  2. ops.grid_sample.texture_warp_topk — plane-layout XLA top-k sampling
     (any backend/shape; used by CPU tests and odd-shaped configs).
  3. ops.grid_sample.texture_warp_reference — exact all-parts semantics
     (k >= P); the spec of record the other two are pinned against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import texture_warp_reference, texture_warp_topk

_PALLAS_OK = None


def _pallas_available() -> bool:
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            from jax.experimental import pallas as pl  # noqa: F401
            from jax.experimental.pallas import tpu as pltpu  # noqa: F401
            _PALLAS_OK = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            _PALLAS_OK = False
    return _PALLAS_OK


def texture_warp(tex: jnp.ndarray, uv: jnp.ndarray, probs: jnp.ndarray,
                 use_pallas: bool = True, k: int = 4,
                 block_parts: int = 0, eps: float = 0.0,
                 compute_dtype: str = "float32") -> jnp.ndarray:
    """Per-part texture warp + probability blend — the production op.

    tex (B,P,T,T,C) in [-1,1]; uv (B,H,W,P,2) in [0,1]; probs (B,H,W,P+1)
    with background at channel 0. Returns (B,H,W,C). Semantics pinned by
    tests/test_ops.py and tests/test_pallas_warp.py. block_parts caps the
    Pallas kernel's active parts per 1024-pixel block (LOSSY, default 0 —
    see pallas_warp2._topk_dense_weights); eps drops sub-eps blend
    weights (error bounded by k*eps per pixel, applied identically on
    both the Pallas and XLA paths so they stay equivalent).
    compute_dtype "bfloat16" runs the Pallas kernel's texture gathers and
    mask-reduces in bf16 (--warp_dtype; bounded ~2^-8 rounding, see
    pallas_warp2.texture_warp_pallas) — XLA fallback paths ignore it.
    """
    P = tex.shape[1]
    if use_pallas and _pallas_available():
        from .pallas_warp2 import (_TILE, pallas_warp_supported,
                                   texture_warp_pallas)
        T = tex.shape[2]
        ext = _TILE
        if (2 <= T < _TILE and tex.shape[3] == T
                and (uv.shape[1] * uv.shape[2]) % 1024 == 0
                and uv.shape[3] == P):
            # Small tiles (e.g. --tex_tile 64) zero-pad up to the kernel's
            # native 128 edge; the kernel samples/clips on the effective
            # (T-1) grid via `ext`, so the padded op is BIT-IDENTICAL to
            # the unpadded one (values and gradients; no uv rescale, no
            # double rounding). Without the pad, sub-128 tiles silently
            # fell to the XLA gather path — measured 12x slower end-to-end
            # at 512px/tile 64.
            pad = _TILE - T
            tex = jnp.pad(tex, ((0, 0), (0, 0), (0, pad), (0, pad), (0, 0)))
            ext = T
        if pallas_warp_supported(tex, uv):
            kk = k if 0 < k <= P else P
            return texture_warp_pallas(tex, uv, probs, kk, block_parts,
                                       eps, ext, compute_dtype)
    if 0 < k < P:
        return texture_warp_topk(tex, uv, probs, k=k, eps=eps)
    if eps > 0.0:
        # k=0 / k>=P means "all parts", but eps must still drop sub-eps
        # weights so this fallback matches the Pallas path (which applies
        # eps at kk=P); topk with k=P selects every part (pinned equal to
        # the reference by tests/test_ops.py)
        return texture_warp_topk(tex, uv, probs, k=P, eps=eps)
    return texture_warp_reference(tex, uv, probs)
