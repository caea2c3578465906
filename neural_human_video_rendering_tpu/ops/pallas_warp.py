"""Fused Pallas TPU kernel for the per-part texture warp.

This is the framework's one custom hot op (SURVEY.md §2 #15 — the ATen
``grid_sample`` + probability blend of the reference). Fusing all P parts,
the 4-tap bilinear interpolation, and the probability blend into one kernel
keeps the texture atlas resident in VMEM (24 x 128 x 128 x 3 bf16 ~= 2.3 MB)
and avoids materializing the (B, P, H, W, C) per-part samples in HBM that the
jnp reference implies (~100 MB/frame at 512 px) — the op is HBM-bandwidth
bound, so that materialization is the whole cost.

Kernel layout: grid over (batch, pixel-row tiles); each program loads the full
(P, Ht, Wt, C) atlas block plus a (TH, W, P, 2) uv tile and (TH, W, P+1)
probs tile into VMEM, computes flat gather indices, and accumulates the
probability-weighted 4-tap samples into the (TH, W, C) output tile. Gathers
run on the VPU via one-hot-free dynamic gather (jnp.take) over the flattened
atlas, which Mosaic supports for VMEM-resident operands.

Falls back to ops.grid_sample.texture_warp_reference when Pallas is
unavailable (CPU tests) or the shapes don't fit VMEM; equivalence is pinned
by tests/test_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .grid_sample import texture_warp_reference

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


def _warp_kernel(tex_ref, uv_ref, probs_ref, out_ref):
    """One (batch, row-tile) program: out tile = sum_p w_p * tex_p(uv_p)."""
    P, Ht, Wt, C = tex_ref.shape
    TH, W = out_ref.shape[0], out_ref.shape[1]

    tex = tex_ref[...].astype(jnp.float32)          # (P, Ht, Wt, C)
    tex_flat = tex.reshape(P * Ht * Wt, C)
    uv = uv_ref[...].astype(jnp.float32)            # (TH, W, P, 2)
    probs = probs_ref[...].astype(jnp.float32)      # (TH, W, P+1)

    x = uv[..., 0] * (Wt - 1)                       # (TH, W, P)
    y = uv[..., 1] * (Ht - 1)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, Wt - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, Wt - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, Ht - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, Ht - 1)

    part = jax.lax.broadcasted_iota(jnp.int32, (TH, W, P), 2)
    base = part * (Ht * Wt)

    def tap(ix, iy):
        idx = (base + iy * Wt + ix).reshape(-1)
        return jnp.take(tex_flat, idx, axis=0).reshape(TH, W, P, C)

    v00 = tap(x0, y0)
    v01 = tap(x1, y0)
    v10 = tap(x0, y1)
    v11 = tap(x1, y1)
    wxe = wx[..., None]
    wye = wy[..., None]
    samp = ((v00 * (1 - wxe) + v01 * wxe) * (1 - wye)
            + (v10 * (1 - wxe) + v11 * wxe) * wye)   # (TH, W, P, C)
    w = probs[..., 1:, None]                          # (TH, W, P, 1)
    out_ref[...] = jnp.sum(samp * w, axis=2).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("row_tile",))
def _texture_warp_pallas(tex: jnp.ndarray, uv: jnp.ndarray, probs: jnp.ndarray,
                         row_tile: int = 64) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, P, Ht, Wt, C = tex.shape
    H, W = uv.shape[1], uv.shape[2]
    TH = min(row_tile, H)
    grid = (B, H // TH)
    return pl.pallas_call(
        _warp_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        grid=grid,
        in_specs=[
            # None squeezes the batch dim away inside the kernel
            pl.BlockSpec((None, P, Ht, Wt, C), lambda b, r: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TH, W, P, 2), lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TH, W, P + 1), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, TH, W, C), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
    )(tex, uv, probs)


def texture_warp(tex: jnp.ndarray, uv: jnp.ndarray, probs: jnp.ndarray,
                 use_pallas: bool = True, k: int = 4) -> jnp.ndarray:
    """Per-part texture warp + blend — the production dispatch.

    Default path: top-k part sampling (ops.grid_sample.texture_warp_topk) —
    the TPU-first formulation that avoids the (B, P, H, W, C) all-parts
    intermediate. k >= P (or k <= 0) falls back to the exact all-parts
    reference. The fused Pallas kernel is kept for the all-parts form where
    Mosaic supports it; semantics pinned by tests/test_ops.py.
    """
    from .grid_sample import texture_warp_topk
    P = tex.shape[1]
    if use_pallas and _pallas_available():
        from .pallas_warp2 import pallas_warp_supported, texture_warp_pallas
        if pallas_warp_supported(tex, uv):
            kk = k if 0 < k <= P else P
            return texture_warp_pallas(tex, uv, probs, kk)
    if 0 < k < P:
        return texture_warp_topk(tex, uv, probs, k=k)
    return texture_warp_reference(tex, uv, probs)
