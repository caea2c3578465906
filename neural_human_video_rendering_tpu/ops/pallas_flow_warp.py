"""Fused Pallas TPU kernel for whole-image bilinear flow warping.

The temporal loss warps the previous frame (and the inverse flow field, for
occlusion masking) by FlowNet2 flow (SURVEY.md §2 #18; reference:
train_start/pretrain_start.sh:21-22,37). As XLA gathers this costs
~30 ms/step at 512px (TPU gathers run ~110M elements/s flat); this kernel
brings it to a few ms with the same lane-gather strategy as the texture
warp (ops/pallas_warp2.py), extended to images larger than one (128,128)
tile:

  * The image is decomposed into a (TY, TX) grid of 128x128 tiles, stored
    TRANSPOSED (col-major) in the kernel input so that fetching source row
    y for each of 128 pixel slots is one (128,128) lane-gather.
  * Grid (B, pixel-blocks, tiles), tiles innermost: the output block stays
    resident and accumulates tap contributions from each tile.
  * Each of the 4 bilinear taps is assigned to the single tile that owns
    its (clamped) integer coordinates; a tap contributes only on that
    tile's grid step. Bilinear + border behavior therefore matches
    ops.grid_sample.flow_warp (zero outside the image, taps clamped)
    bit-for-bit up to float reassociation.
  * Flow displacements are small and spatially coherent, so a 1024-pixel
    block touches ~4-6 of the 16 tiles at 512px; steps for untouched
    (block, tile) pairs are predicated away (@pl.when) and cost ~nothing.

Forward only (the production temporal loss detaches the warped frame —
temporal_detach_prev). flow_warp_pallas is wired with a custom VJP that
recomputes the XLA-gather reference backward, so symmetric-gradient mode
stays correct, just not kernel-accelerated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLK_ROWS = 8
_BLK_LANES = 128
_BLK = _BLK_ROWS * _BLK_LANES
_TILE = 128


def _onehot_cols(ix):
    """(1,128) int32 column ids -> (128,128) one-hot mask (f32)."""
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _BLK_LANES), 0)
    return (iota_sub == jnp.broadcast_to(ix, (_TILE, _BLK_LANES))).astype(
        jnp.float32)


def _fwd_kernel(H, W, TX, x_ref, y_ref, imgT_ref, out_ref):
    t = pl.program_id(2)
    ty = t // TX
    tx = t % TX

    @pl.when(t == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x_all = x_ref[...]
    y_all = y_ref[...]

    # block-level activity test: does any tap of any slot land in this tile?
    x0_all = jnp.clip(jnp.floor(x_all).astype(jnp.int32), 0, W - 1)
    y0_all = jnp.clip(jnp.floor(y_all).astype(jnp.int32), 0, H - 1)
    # taps live in tile cols {x0>>7, (x0+1)>>7} x rows {y0>>7, (y0+1)>>7};
    # the +1 tap can only reach the next tile, so test a half-open range
    hit = ((x0_all >> 7 <= tx) & (tx <= (x0_all + 1).clip(0, W - 1) >> 7) &
           (y0_all >> 7 <= ty) & (ty <= (y0_all + 1).clip(0, H - 1) >> 7))

    @pl.when(jnp.any(hit))
    def _active():
        C = imgT_ref.shape[0]
        acc = [[None] * _BLK_ROWS for _ in range(C)]
        for r in range(_BLK_ROWS):
            x = x_all[r:r + 1, :]
            y = y_all[r:r + 1, :]
            valid = ((x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
                     ).astype(jnp.float32)
            x0f = jnp.floor(x)
            y0f = jnp.floor(y)
            wx = x - x0f
            wy = y - y0f
            x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
            x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, W - 1)
            y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
            y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, H - 1)
            in_row0 = ((y0 >> 7) == ty).astype(jnp.float32) * valid
            in_row1 = ((y1 >> 7) == ty).astype(jnp.float32) * valid
            in_col0 = ((x0 >> 7) == tx).astype(jnp.float32)
            in_col1 = ((x1 >> 7) == tx).astype(jnp.float32)
            oh0 = _onehot_cols(x0 & 127)
            oh1 = _onehot_cols(x1 & 127)
            # fold bilinear weights + tile membership into the column masks:
            # one masked reduce per gathered row per channel
            mA = oh0 * (in_row0 * in_col0 * (1 - wx) * (1 - wy)) \
                + oh1 * (in_row0 * in_col1 * wx * (1 - wy))
            mB = oh0 * (in_row1 * in_col0 * (1 - wx) * wy) \
                + oh1 * (in_row1 * in_col1 * wx * wy)
            ly0 = jnp.broadcast_to(y0 & 127, (_TILE, _BLK_LANES))
            ly1 = jnp.broadcast_to(y1 & 127, (_TILE, _BLK_LANES))
            for c in range(C):
                imgT_c = imgT_ref[c]
                rT0 = jnp.take_along_axis(imgT_c, ly0, axis=1)
                rT1 = jnp.take_along_axis(imgT_c, ly1, axis=1)
                acc[c][r] = (jnp.sum(rT0 * mA, axis=0, keepdims=True)
                             + jnp.sum(rT1 * mB, axis=0, keepdims=True))
        res = jnp.stack([jnp.concatenate(acc[c], axis=0) for c in range(C)])
        out_ref[...] += res


def _interpret_mode() -> bool:
    return jax.default_backend() != "tpu"


def flow_warp_supported(img: jnp.ndarray) -> bool:
    B, H, W, C = img.shape
    return H % _TILE == 0 and W % _TILE == 0 and (H * W) % _BLK == 0


def _fwd_call(img, flow):
    B, H, W, C = img.shape
    TY, TX = H // _TILE, W // _TILE
    N = H * W
    NB = N // _BLK

    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    x = (xs + flow[..., 0]).reshape(B, NB, _BLK_ROWS, _BLK_LANES)
    y = (ys + flow[..., 1]).reshape(B, NB, _BLK_ROWS, _BLK_LANES)
    # transposed tiles: imgT[b,ty,tx,c,col,row] = img[b, ty*128+row, tx*128+col, c]
    imgT = img.astype(jnp.float32).reshape(B, TY, _TILE, TX, _TILE, C)
    imgT = jnp.transpose(imgT, (0, 1, 3, 5, 4, 2))

    blk = pl.BlockSpec((None, None, _BLK_ROWS, _BLK_LANES),
                       lambda b, nb, t: (b, nb, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, H, W, TX),
        grid=(B, NB, TY * TX),
        cost_estimate=pl.CostEstimate(
            flops=B * N * C * 30, bytes_accessed=B * N * (C + 2) * 4,
            transcendentals=0),
        in_specs=[
            blk, blk,
            pl.BlockSpec((None, None, None, C, _TILE, _TILE),
                         lambda b, nb, t: (b, t // TX, t % TX, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, None, C, _BLK_ROWS, _BLK_LANES),
                               lambda b, nb, t: (b, nb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NB, C, _BLK_ROWS, _BLK_LANES),
                                       jnp.float32),
        interpret=_interpret_mode(),
    )(x, y, imgT)
    out = jnp.moveaxis(out.reshape(B, NB, C, _BLK), 2, 3)
    return out.reshape(B, H, W, C)


@jax.custom_vjp
def flow_warp_pallas(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """out(p) = bilinear img(p + flow(p)), zero outside — fused TPU kernel.

    Same contract as ops.grid_sample.flow_warp. Forward is the Pallas
    kernel; the backward recomputes the XLA reference VJP (the production
    temporal loss never differentiates through the warp —
    temporal_detach_prev).
    """
    return _fwd_call(img, flow)


def _flow_warp_fwd(img, flow):
    return _fwd_call(img, flow), (img, flow)


def _flow_warp_bwd(res, g):
    from .grid_sample import flow_warp as flow_warp_ref
    img, flow = res
    _, vjp = jax.vjp(flow_warp_ref, img, flow)
    return vjp(g)


flow_warp_pallas.defvjp(_flow_warp_fwd, _flow_warp_bwd)


def flow_warp_fast(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU for tile-aligned shapes, XLA else."""
    from .pallas_warp import _pallas_available
    if _pallas_available() and flow_warp_supported(img):
        return flow_warp_pallas(img, flow)
    from .grid_sample import flow_warp
    return flow_warp(img, flow)


# deferred imports used inside kernels (see ops/pallas_warp2.py)
from jax.experimental import pallas as pl          # noqa: E402
from jax.experimental.pallas import tpu as pltpu   # noqa: E402
