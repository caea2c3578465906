"""Fused Pallas TPU kernel for the per-part texture warp (production v2).

Why this exists: XLA's gather on TPU runs ~110M elements/s regardless of
table size (measured) — the warp's ~50M texture taps cost ~0.7s forward and
as much again backward, dominating the train step. Mosaic CAN gather at VPU
speed, but only as same-shape ``take_along_axis`` within 128 lanes. This
kernel reformulates the warp around that primitive:

  * Texture tiles live TRANSPOSED in VMEM: texT[c', y] = tex[y, c'].
  * Row fetch (stage A): one (128,128) lane-gather pulls texture row y[l]
    for each of 128 pixel slots l.
  * Column select (stage B): a one-hot sublane mask + reduce picks column
    x[l] — no gather, no transpose.
  * Part blending: dense loop over all P parts per pixel block, with the
    whole (block, part) step predicated away when the block's top-k weight
    mask is all-zero (``@pl.when``) — spatial coherence makes ~P/k of the
    steps no-ops, so the dense loop costs ~what a sorted dispatch would,
    without any sort/permutation (XLA gathers for dispatch would cost more
    than they save).
  * Backward texture gradient: per-tap rank-1 accumulation expressed as a
    (128,128)x(128,128) MXU matmul of one-hot masks — no scatter anywhere.

Top-k selection happens OUTSIDE the kernel as a dense weight tensor
w[b,p,n] = prob if part p is among pixel n's top-k parts else 0, built
with an argmax/threshold loop (elementwise, no gathers). k == P degenerates
to the exact all-parts reference semantics.

Interface matches ops.grid_sample.texture_warp_topk; equivalence is pinned
by tests (interpret mode on CPU, compiled on TPU). Requires tile == 128 and
H*W % 1024 == 0; the dispatcher falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_BLK_ROWS = 8
_BLK_LANES = 128
_BLK = _BLK_ROWS * _BLK_LANES   # pixel slots per block
_TILE = 128                     # texture tile edge (Ht == Wt == 128)


# ----------------------------------------------------------------------
# XLA-side preparation: dense top-k weights + plane layout
# ----------------------------------------------------------------------

def _topk_dense_weights(fg: jnp.ndarray, k: int,
                        block_parts: int = 0,
                        eps: float = 0.0) -> jnp.ndarray:
    """fg (B,P,N) probs -> w (B,P,N): prob where in top-k else 0.

    Value-only selection: the k-th largest value per pixel is found with a
    max/mask loop — plain max reductions over the part axis, no argmax, no
    gathers (the earlier argmax+take_along_axis formulation cost ~80 ms/step
    at 512px; variadic iota-reduce and XLA gather are both VPU-bound slow).
    Ties at the threshold only widen the blend. The selection mask is
    constant under autodiff (same semantics as top_k's gradient).

    block_parts > 0 additionally caps how many parts stay active per
    (batch, 1024-pixel kernel block): parts below the block's top-
    `block_parts` total mass are zeroed. This is a LOSSY approximation: it
    is exact only when each 1024-pixel block genuinely touches <=
    `block_parts` parts, i.e. when part probabilities are *spatially
    coherent* (pixels near each other pick the same parts). Measured on
    TPU (2026-08-17): with spatially incoherent probs — random-peaked or
    near-uniform, which is exactly the regime of early/ongoing training —
    the cap zeroes most pixels' weights (forward maxdiff ~1.0 vs the exact
    top-k, duv grads off by 1e2). A resumed 512px training run collapsed
    PSNR 28->19 within one epoch under block_parts=8. Default is therefore
    0 (exact); >0 is an inference-only opt-in for checkpoints whose part
    maps are verified coherent.

    eps > 0 zeroes selected weights BELOW eps — the principled replacement
    for the block cap. Unlike the cap, the error is a-priori bounded and
    regime-independent: each pixel loses at most k*eps of blend mass
    (k=4, eps=1e-3 => 0.4% of the [-1,1] range — under the bf16 compute
    noise floor and the uint8 serving quantization). Gradient semantics
    match top-k membership (selection is stop-gradient). Why it pays:
    softmax never emits exact zeros, so on a trained checkpoint every
    background pixel keeps k tiny positive weights and the kernel's
    all-zero-block skip never fires (measured: 28% of (block,part) pairs
    skip at eps=0 vs 57% at eps=1e-3 on the round-2 512px checkpoint).
    At early-training prob levels (~1/25 per part) eps=1e-3 drops
    nothing — the threshold only engages once probabilities peak.
    """
    P = fg.shape[1]
    k = min(k, P)
    if k < P:
        remaining = jax.lax.stop_gradient(fg)
        for _ in range(k - 1):
            m = jnp.max(remaining, axis=1, keepdims=True)
            remaining = jnp.where(remaining >= m, -jnp.inf, remaining)
        thr = jnp.max(remaining, axis=1, keepdims=True)
        mask = fg >= thr
        w = jnp.where(jax.lax.stop_gradient(mask), fg, 0.0)
    else:
        w = fg
    if eps > 0.0:
        w = jnp.where(jax.lax.stop_gradient(w) >= eps, w, 0.0)
    if 0 < block_parts < P:
        B, _, N = w.shape
        blk = w.reshape(B, P, N // _BLK, _BLK)
        m_blk = jax.lax.stop_gradient(jnp.sum(blk, axis=3))     # (B,P,NB)
        remaining = m_blk
        for _ in range(block_parts - 1):
            m = jnp.max(remaining, axis=1, keepdims=True)
            remaining = jnp.where(remaining >= m, -jnp.inf, remaining)
        thr = jnp.max(remaining, axis=1, keepdims=True)
        keep = (m_blk >= thr)[..., None]                        # (B,P,NB,1)
        w = jnp.where(keep, blk, 0.0).reshape(B, P, N)
    return w


def _topk_kernel(k, block_parts, eps, fg_ref, w_ref):
    """Single-pass fused top-k + block-cap selection.

    One (P, 8, 128) block per grid step: the k-th-largest threshold per
    pixel slot and the per-block part-mass cap are computed entirely in
    VMEM — ONE read of fg and ONE write of w instead of the XLA
    formulation's ~8 elementwise passes over the 200 MB probability planes
    (~12-20 ms/step traced). Semantics identical to _topk_dense_weights.
    """
    fg = fg_ref[...]                              # (P, 8, 128)
    P = fg.shape[0]
    if 0 < k < P:
        remaining = fg
        for _ in range(k - 1):
            m = jnp.max(remaining, axis=0, keepdims=True)
            remaining = jnp.where(remaining >= m, -jnp.inf, remaining)
        thr = jnp.max(remaining, axis=0, keepdims=True)
        w = jnp.where(fg >= thr, fg, 0.0)
    else:
        w = fg
    if eps > 0.0:
        w = jnp.where(w >= eps, w, 0.0)
    if 0 < block_parts < P:
        # staged reductions: Mosaic aborts on the fused multi-axis
        # (1, 2) reduction of a (P, 8, 128) block
        mass = jnp.sum(jnp.sum(w, axis=1, keepdims=True), axis=2,
                       keepdims=True)                     # (P, 1, 1)
        remaining = mass
        for _ in range(block_parts - 1):
            m = jnp.max(remaining, axis=0, keepdims=True)
            remaining = jnp.where(remaining >= m, -jnp.inf, remaining)
        thr_b = jnp.max(remaining, axis=0, keepdims=True)
        w = jnp.where(mass >= thr_b, w, 0.0)
    w_ref[...] = w


def _topk_call(fg_planes, k, block_parts, eps=0.0):
    """fg (B, P, NB, 8, 128) -> selected weights, same shape."""
    B, P, NB = fg_planes.shape[:3]
    spec = pl.BlockSpec((None, P, None, _BLK_ROWS, _BLK_LANES),
                        lambda b, nb: (b, 0, nb, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_topk_kernel, k, block_parts, eps),
        grid=(B, NB),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(fg_planes.shape, jnp.float32),
        interpret=_interpret_mode(),
    )(fg_planes)


def _pack_channel_pairs(texT: jnp.ndarray) -> jnp.ndarray:
    """bf16-round the texture and pack channel PAIRS into one i32 plane.

    Hardware constraint (measured on v5e, 2026-08-19 selftest): Mosaic's
    ``tpu.dynamic_gather`` rejects bf16 data with i32 indices ("Gather
    indices and result have different bitwidths"), so a plain bf16 texture
    tile cannot be lane-gathered at all. The workaround exploits that a
    bf16 bit pattern IS the top 16 bits of its f32 representation: round
    each channel to bf16, take the f32 bit pattern's high half, and pack
    channels (2i, 2i+1) into one i32 as hi|lo. The kernel then gathers
    i32 (legal: index and data bitwidths match) and unpacks with one
    mask/shift + bitcast per channel — no numeric conversion work. Net
    effect vs the f32 path: ceil(C/2) gathers per row fetch instead of C
    (C=3 -> 2), at the cost of bf16-rounding the texture values (the
    documented --warp_dtype bfloat16 semantics; error ~2^-8 relative).
    """
    t32 = texT.astype(jnp.bfloat16).astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(t32, jnp.uint32)
    hi = bits & jnp.uint32(0xFFFF0000)
    C = hi.shape[2]
    if C % 2:
        hi = jnp.pad(hi, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))
    packed = hi[:, :, 0::2] | (hi[:, :, 1::2] >> 16)
    return jax.lax.bitcast_convert_type(packed, jnp.int32)


def _unpack_pair(g: jnp.ndarray):
    """i32 packed gather result -> (even, odd) f32 channel tiles."""
    even = jax.lax.bitcast_convert_type(g & jnp.int32(-0x10000), jnp.float32)
    odd = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
    return even, odd


def _to_planes(tex, uv, probs, k, block_parts=0, eps=0.0,
               compute_dtype=jnp.float32):
    """Returns (texT (B,P,C|Cpk,T,T), u,v,w (B,P,NB,8,128), shapes).

    compute_dtype governs the TEXTURE planes only: bf16 mode bf16-rounds
    the texture and packs channel pairs into i32 planes (see
    _pack_channel_pairs — Mosaic cannot gather bf16 directly), cutting the
    gather count of the dominant (128,128) lane-gather work to ceil(C/2)/C
    (half for even C, 2/3 for the C=3 flagship); unpacked math
    runs f32, so bf16 mode's total error is exactly the texture-value
    rounding. Costs no information when the texture is bf16-sourced anyway
    (TexG runs in the model dtype). Coordinates/weights stay f32 — bf16's
    8-bit mantissa on u*(T-1) would be half-texel position error."""
    B, P, Ht, Wt, C = tex.shape
    H, W = uv.shape[1], uv.shape[2]
    N = H * W
    NB = N // _BLK
    fg = jnp.moveaxis(probs[..., 1:], -1, 1).reshape(B, P, N)
    u = jnp.moveaxis(uv[..., 0], -1, 1).reshape(B, P, N)
    v = jnp.moveaxis(uv[..., 1], -1, 1).reshape(B, P, N)
    fg_planes = fg.astype(jnp.float32).reshape(B, P, NB, _BLK_ROWS, _BLK_LANES)
    w = _topk_call(jax.lax.stop_gradient(fg_planes), k,
                   block_parts, eps).reshape(B, P, N)
    # gradient w.r.t. probs flows through the warp's custom VJP (dw masked
    # by w > 0 in _texture_warp_bwd), so the selection op itself is
    # gradient-free — fg enters it via stop_gradient.
    shp = (B, P, NB, _BLK_ROWS, _BLK_LANES)
    u = u.reshape(shp)
    v = v.reshape(shp)
    w = w.reshape(shp)
    # transposed tiles: texT[b,p,c,col,row] = tex[b,p,row,col,c]
    texT = jnp.transpose(tex, (0, 1, 4, 3, 2))
    if compute_dtype == jnp.bfloat16:
        texT = _pack_channel_pairs(texT)
    else:
        texT = texT.astype(compute_dtype)
    return texT, u.astype(jnp.float32), \
        v.astype(jnp.float32), w.astype(jnp.float32), (B, P, C, H, W, NB)


def _coords(u_row, v_row, ext=_TILE):
    """(1,128) uv rows -> integer taps + fractional weights (all (1,128)).

    `ext` is the EFFECTIVE tile edge: sub-128 tiles are zero-padded up to
    the kernel's native 128 but sampled on their own (ext-1) grid with
    clips at ext-1 — bit-identical coordinates/taps to the unpadded
    reference for every uv in [0,1] (including the exact u=1.0 boundary,
    where the clip keeps x1 off the padded texels). The earlier
    rescale-uv approach (u*(T-1)/127, then *127 in-kernel) double-rounded
    and could flip floor() cells at integer texels — harmless forward
    (continuous) but a spurious duv discontinuity."""
    x = u_row * (ext - 1)
    y = v_row * (ext - 1)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, ext - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, ext - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, ext - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, ext - 1)
    return x0, x1, y0, y1, wx, wy


def _row_gather(texT_c, y_row):
    """rowsT[c', l] = tex[y_row[l], c']  — (128,128) lane-gather."""
    by = jnp.broadcast_to(y_row, (_TILE, _BLK_LANES))
    return jnp.take_along_axis(texT_c, by, axis=1)


def _chan_rows(texT_ref, y0, y1, C):
    """Per-channel row fetches: [(c, rT0, rT1)] for the C real channels.

    f32 planes: one gather pair per channel, returned in the plane dtype.
    Packed i32 planes (bf16 pair packing, _pack_channel_pairs): one gather
    pair per PLANE — ceil(C/2) instead of C — then each gathered tile is
    unpacked into its two f32 channel tiles with mask/shift + bitcast.
    Unused odd halves of a padded last plane are dead code Mosaic drops."""
    out = []
    if texT_ref.dtype == jnp.int32:
        for cp in range(texT_ref.shape[0]):
            rT0 = _row_gather(texT_ref[cp], y0)
            rT1 = _row_gather(texT_ref[cp], y1)
            e0, o0 = _unpack_pair(rT0)
            e1, o1 = _unpack_pair(rT1)
            out.append((2 * cp, e0, e1))
            if 2 * cp + 1 < C:
                out.append((2 * cp + 1, o0, o1))
    else:
        for c in range(C):
            out.append((c, _row_gather(texT_ref[c], y0),
                        _row_gather(texT_ref[c], y1)))
    return out


def _col_masks(x0, x1):
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _BLK_LANES), 0)
    m0 = (iota_sub == jnp.broadcast_to(x0, (_TILE, _BLK_LANES)))
    m1 = (iota_sub == jnp.broadcast_to(x1, (_TILE, _BLK_LANES)))
    return m0.astype(jnp.float32), m1.astype(jnp.float32)


# ----------------------------------------------------------------------
# forward kernel: grid (B, NB, P) — P innermost so the output block stays
# resident and accumulates across parts
# ----------------------------------------------------------------------

def _fwd_kernel(ext, u_ref, v_ref, w_ref, texT_ref, out_ref):
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    w_all = w_ref[...]

    @pl.when(jnp.max(w_all) > 0.0)
    def _active():
        C = out_ref.shape[0]
        # gather/mask-reduce precision follows the texture planes' dtype;
        # packed-i32 planes (bf16 mode) gather ceil(C/2) planes and unpack
        # to f32, so their reduce math is f32 on bf16-rounded values. The
        # (1,128) tail — y-lerp and the blend multiply-accumulate — is f32.
        cd = texT_ref.dtype
        mask_dt = jnp.float32 if cd == jnp.int32 else cd
        u_all = u_ref[...]
        v_all = v_ref[...]
        acc = [[None] * _BLK_ROWS for _ in range(C)]
        for r in range(_BLK_ROWS):
            u_row = u_all[r:r + 1, :]
            v_row = v_all[r:r + 1, :]
            w_row = w_all[r:r + 1, :]
            x0, x1, y0, y1, wx, wy = _coords(u_row, v_row, ext)
            m0, m1 = _col_masks(x0, x1)
            # fold the x-interpolation into ONE column mask: the forward
            # only needs top = v00*(1-wx)+v01*wx = sum(rT0 * mx), so per
            # channel it's 2 masked reduces instead of 4 (the backward
            # keeps m0/m1 separate — it needs the x-derivative)
            mx = (m0 * (1.0 - wx) + m1 * wx).astype(mask_dt)
            for c, rT0, rT1 in _chan_rows(texT_ref, y0, y1, C):
                top = jnp.sum(rT0 * mx, axis=0,
                              keepdims=True).astype(jnp.float32)
                bot = jnp.sum(rT1 * mx, axis=0,
                              keepdims=True).astype(jnp.float32)
                samp = top * (1 - wy) + bot * wy
                acc[c][r] = samp * w_row
        res = jnp.stack([jnp.concatenate(acc[c], axis=0) for c in range(C)])
        out_ref[...] += res


# ----------------------------------------------------------------------
# backward kernel: grid (B, P, NB) — NB innermost so the dtexT block stays
# resident and accumulates across pixel blocks
# ----------------------------------------------------------------------

def _bwd_kernel(ext, u_ref, v_ref, w_ref, texT_ref, g_ref,
                du_ref, dv_ref, dw_ref, dtexT_ref):
    nb = pl.program_id(2)

    @pl.when(nb == 0)
    def _init():
        dtexT_ref[...] = jnp.zeros_like(dtexT_ref)

    du_ref[...] = jnp.zeros_like(du_ref)
    dv_ref[...] = jnp.zeros_like(dv_ref)
    dw_ref[...] = jnp.zeros_like(dw_ref)

    w_all = w_ref[...]

    @pl.when(jnp.max(w_all) > 0.0)
    def _active():
        C = dtexT_ref.shape[0]
        # like the forward, gather precision follows the texture planes'
        # dtype (packed i32 planes unpack to f32 rows); all (1,128)-row
        # gradient math stays f32. The dtex matmuls run the MXU in bf16 in
        # bf16 mode — the one-hot/coef operands round to bf16, accumulation
        # is f32 (preferred_element_type below).
        cd = texT_ref.dtype
        mask_dt = jnp.float32 if cd == jnp.int32 else cd
        mm_dt = jnp.bfloat16 if cd == jnp.int32 else cd
        u_all = u_ref[...]
        v_all = v_ref[...]
        g_all = g_ref[...]                      # (C, 8, 128)
        du_rows = [None] * _BLK_ROWS
        dv_rows = [None] * _BLK_ROWS
        dw_rows = [None] * _BLK_ROWS
        dtex_acc = [jnp.zeros((_TILE, _TILE), jnp.float32) for _ in range(C)]
        for r in range(_BLK_ROWS):
            u_row = u_all[r:r + 1, :]
            v_row = v_all[r:r + 1, :]
            w_row = w_all[r:r + 1, :]
            x0, x1, y0, y1, wx, wy = _coords(u_row, v_row, ext)
            m0, m1 = _col_masks(x0, x1)
            m0c, m1c = m0.astype(mask_dt), m1.astype(mask_dt)
            # one-hot row masks (y-on-sublanes, slot-on-lanes) — same
            # orientation as the column masks, so no cross-lane reshape;
            # the matmul below contracts over the slot (lane) axis
            oh_y0, oh_y1 = _col_masks(y0, y1)
            du_acc = jnp.zeros((1, _BLK_LANES), jnp.float32)
            dv_acc = jnp.zeros((1, _BLK_LANES), jnp.float32)
            dw_acc = jnp.zeros((1, _BLK_LANES), jnp.float32)
            for c, rT0, rT1 in _chan_rows(texT_ref, y0, y1, C):
                g_row = g_all[c, r:r + 1, :]
                v00 = jnp.sum(rT0 * m0c, axis=0,
                              keepdims=True).astype(jnp.float32)
                v01 = jnp.sum(rT0 * m1c, axis=0,
                              keepdims=True).astype(jnp.float32)
                v10 = jnp.sum(rT1 * m0c, axis=0,
                              keepdims=True).astype(jnp.float32)
                v11 = jnp.sum(rT1 * m1c, axis=0,
                              keepdims=True).astype(jnp.float32)
                top = v00 * (1 - wx) + v01 * wx
                bot = v10 * (1 - wx) + v11 * wx
                samp = top * (1 - wy) + bot * wy
                gw = g_row * w_row
                # d/duv (chain through x = u*(ext-1), y = v*(ext-1))
                du_acc += gw * ((v01 - v00) * (1 - wy) + (v11 - v10) * wy) \
                    * (ext - 1)
                dv_acc += gw * (bot - top) * (ext - 1)
                dw_acc += g_row * samp
                # dtexT[c', y] += sum_l m_x[c', l] * coef[l] * oh_y[l, y]
                c00 = gw * (1 - wx) * (1 - wy)
                c01 = gw * wx * (1 - wy)
                c10 = gw * (1 - wx) * wy
                c11 = gw * wx * wy
                a0 = (m0 * c00 + m1 * c01).astype(mm_dt)   # (c'=128, l=128)
                a1 = (m0 * c10 + m1 * c11).astype(mm_dt)
                # dtexT[c', y] += sum_l a[c', l] * oh_y[y, l]
                contract = (((1,), (1,)), ((), ()))
                dtex_acc[c] = dtex_acc[c] + jax.lax.dot_general(
                    a0, oh_y0.astype(mm_dt), contract,
                    preferred_element_type=jnp.float32) + jax.lax.dot_general(
                    a1, oh_y1.astype(mm_dt), contract,
                    preferred_element_type=jnp.float32)
            du_rows[r] = du_acc
            dv_rows[r] = dv_acc
            dw_rows[r] = dw_acc
        du_ref[...] = jnp.concatenate(du_rows, axis=0)
        dv_ref[...] = jnp.concatenate(dv_rows, axis=0)
        dw_ref[...] = jnp.concatenate(dw_rows, axis=0)
        dtexT_ref[...] += jnp.stack(dtex_acc)


# ----------------------------------------------------------------------
# pallas_call wrappers
# ----------------------------------------------------------------------

def _interpret_mode() -> bool:
    return jax.default_backend() != "tpu"


def _kernel_cost(dims):
    # declare the true cost so XLA's remat/scheduling heuristics never
    # decide to re-execute the kernel instead of keeping its (small) output
    B, P, C, H, W, NB = dims
    slots = B * H * W
    return pl.CostEstimate(flops=slots * P * C * 40,
                           bytes_accessed=slots * P * 4 * 4,
                           transcendentals=0)


def _fwd_call(texT, u, v, w, dims, ext=_TILE):
    B, P, C, H, W, NB = dims
    Ct = texT.shape[2]   # ceil(C/2) packed planes in bf16 mode, else C
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, ext),
        grid=(B, NB, P),
        cost_estimate=_kernel_cost(dims),
        in_specs=[
            pl.BlockSpec((None, None, None, _BLK_ROWS, _BLK_LANES),
                         lambda b, nb, p: (b, p, nb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, None, _BLK_ROWS, _BLK_LANES),
                         lambda b, nb, p: (b, p, nb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, None, _BLK_ROWS, _BLK_LANES),
                         lambda b, nb, p: (b, p, nb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, Ct, _TILE, _TILE),
                         lambda b, nb, p: (b, p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, None, C, _BLK_ROWS, _BLK_LANES),
                               lambda b, nb, p: (b, nb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NB, C, _BLK_ROWS, _BLK_LANES),
                                       jnp.float32),
        interpret=_interpret_mode(),
    )(u, v, w, texT)
    return out


def _bwd_call(texT, u, v, w, g_planes, dims, ext=_TILE):
    B, P, C, H, W, NB = dims
    Ct = texT.shape[2]   # ceil(C/2) packed planes in bf16 mode, else C
    blk = pl.BlockSpec((None, None, None, _BLK_ROWS, _BLK_LANES),
                       lambda b, p, nb: (b, p, nb, 0, 0),
                       memory_space=pltpu.VMEM)
    du, dv, dw, dtexT = pl.pallas_call(
        functools.partial(_bwd_kernel, ext),
        grid=(B, P, NB),
        cost_estimate=_kernel_cost(dims),
        in_specs=[
            blk, blk, blk,
            pl.BlockSpec((None, None, Ct, _TILE, _TILE),
                         lambda b, p, nb: (b, p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, C, _BLK_ROWS, _BLK_LANES),
                         lambda b, p, nb: (b, nb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            blk, blk, blk,
            pl.BlockSpec((None, None, C, _TILE, _TILE),
                         lambda b, p, nb: (b, p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, P, NB, _BLK_ROWS, _BLK_LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, P, NB, _BLK_ROWS, _BLK_LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, P, NB, _BLK_ROWS, _BLK_LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, P, C, _TILE, _TILE), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(u, v, w, texT, g_planes)
    return du, dv, dw, dtexT


# ----------------------------------------------------------------------
# public op with custom VJP
# ----------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def texture_warp_pallas(tex: jnp.ndarray, uv: jnp.ndarray,
                        probs: jnp.ndarray, k: int = 4,
                        block_parts: int = 0,
                        eps: float = 0.0,
                        ext: int = _TILE,
                        compute_dtype: str = "float32") -> jnp.ndarray:
    """Fused Pallas texture warp. Same contract as texture_warp_topk.

    block_parts caps active parts per kernel block (LOSSY, opt-in only);
    eps drops sub-eps blend weights (bounded error <= k*eps per pixel,
    engages the kernel's all-zero-block skip on trained checkpoints) —
    see _topk_dense_weights for both. ext is the effective tile edge for
    zero-padded sub-128 tiles (see _coords): uv samples the (ext-1) grid
    exactly, so the padded path is bit-identical to the unpadded op.
    compute_dtype "bfloat16" bf16-rounds the texture and packs channel
    PAIRS into i32 planes (Mosaic cannot lane-gather bf16 directly —
    measured v5e negative result, see _pack_channel_pairs), cutting the
    dominant row-gather count to ceil(C/2) — texture VMEM traffic drops to
    ceil(C/2)/C (half for even C, 2/3 for the C=3 flagship); unpacked math
    runs f32, so the forward equals the f32 kernel
    on a bf16-rounded texture BIT-EXACTLY (the dtex matmuls additionally
    run the MXU in bf16). Costs nothing when the texture is bf16-sourced
    (TexG runs in the model dtype). Default f32 is bit-exact vs the XLA
    reference.
    """
    out, _ = _texture_warp_fwd(tex, uv, probs, k, block_parts, eps, ext,
                               compute_dtype)
    return out


def _texture_warp_fwd(tex, uv, probs, k, block_parts=0, eps=0.0, ext=_TILE,
                      compute_dtype="float32"):
    B, P, Ht, Wt, C = tex.shape
    H, W = uv.shape[1], uv.shape[2]
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    texT, u, v, w, dims = _to_planes(tex, uv, probs, k, block_parts, eps,
                                     compute_dtype=cd)
    out_planes = _fwd_call(texT, u, v, w, dims, ext)      # (B,NB,C,8,128)
    out = jnp.moveaxis(out_planes.reshape(B, H * W // _BLK, C, _BLK),
                       2, 3).reshape(B, H, W, C)
    # residuals are the plane-layout tensors: the backward then skips the
    # (B,H,W,P)->(B,P,N) transposes, which the device trace shows cost
    # ~100 ms/step at 512px when recomputed
    dtype_tokens = (jnp.zeros((0,), tex.dtype), jnp.zeros((0,), uv.dtype),
                    jnp.zeros((0,), probs.dtype))
    return out, (texT, u, v, w, dims, dtype_tokens)


def _texture_warp_bwd(k, block_parts, eps, ext, compute_dtype, res, g):
    texT, u, v, w, dims, dtype_tokens = res
    tex_dt, uv_dt, probs_dt = (t.dtype for t in dtype_tokens)
    B, P, C, H, W, NB = dims
    N = H * W
    g_planes = jnp.moveaxis(
        g.reshape(B, NB, _BLK, C).astype(jnp.float32), 3, 2
    ).reshape(B, NB, C, _BLK_ROWS, _BLK_LANES)
    du_p, dv_p, dw_p, dtexT = _bwd_call(texT, u, v, w, g_planes, dims, ext)

    # planes -> original layouts
    def planes_to_bhwp(x):
        return jnp.moveaxis(x.reshape(B, P, N), 1, -1).reshape(B, H, W, P)

    du = planes_to_bhwp(du_p)
    dv = planes_to_bhwp(dv_p)
    # the kernel computes dw densely for every part in an active block;
    # only top-k-selected parts (w > 0) actually contributed to the output
    dw = planes_to_bhwp(jnp.where(w > 0, dw_p, 0.0))
    duv = jnp.stack([du, dv], axis=-1)                    # (B,H,W,P,2)
    # w = probs[..., 1:] masked (mask const): dprobs fg channels = dw
    dprobs = jnp.concatenate(
        [jnp.zeros((B, H, W, 1), dw.dtype), dw], axis=-1)
    dtex = jnp.transpose(dtexT, (0, 1, 4, 3, 2))          # undo the T
    return dtex.astype(tex_dt), duv.astype(uv_dt), dprobs.astype(probs_dt)


texture_warp_pallas.defvjp(_texture_warp_fwd, _texture_warp_bwd)


def pallas_warp_supported(tex, uv) -> bool:
    B, P, Ht, Wt, C = tex.shape
    H, W = uv.shape[1], uv.shape[2]
    return (Ht == _TILE and Wt == _TILE and (H * W) % _BLK == 0
            and uv.shape[3] == P)


# deferred imports used inside kernels (kept at bottom so module import
# works even where pallas is unavailable; kernels only run under pallas_call)
from jax.experimental import pallas as pl          # noqa: E402
from jax.experimental.pallas import tpu as pltpu   # noqa: E402
