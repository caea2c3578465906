"""Pose-label rasterization as jit-able JAX ops.

The reference rasterizes OpenPose keypoints into a 3-channel skeleton image
(``--input_nc 3`` with JSON pose inputs, reference: test_start/start.sh:24,
train_start/pretrain_start.sh:25) plus optional Gaussian joint heatmaps.
Instead of per-limb cv2.line calls (host-side, serial), rasterization here is
a single vectorized distance-to-segment computation over the full pixel grid —
fixed shapes, no host sync, fuses into the forward pass under jit.

TPU notes: all tensors are (H, W, C) fp32 in [-1, 1]; the (L, H, W) distance
field is elementwise VPU work that XLA fuses into one pass.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .keypoints import COCO18_LIMBS, LIMB_COLORS, N_COCO18

_LIMBS_A = np.array([a for a, _ in COCO18_LIMBS], np.int32)
_LIMBS_B = np.array([b for _, b in COCO18_LIMBS], np.int32)


def _point_segment_dist2(px, py, ax, ay, bx, by):
    """Squared distance from pixel grid (H,W) to segment a-b (scalars)."""
    abx, aby = bx - ax, by - ay
    apx, apy = px - ax, py - ay
    denom = abx * abx + aby * aby
    t = jnp.clip((apx * abx + apy * aby) / jnp.maximum(denom, 1e-6), 0.0, 1.0)
    dx = apx - t * abx
    dy = apy - t * aby
    return dx * dx + dy * dy


@functools.partial(jax.jit, static_argnames=("height", "width", "radius", "conf_thresh"))
def render_skeleton(joints: jnp.ndarray, height: int, width: int,
                    radius: float = 4.0, conf_thresh: float = 0.05) -> jnp.ndarray:
    """Rasterize COCO-18 joints into an RGB skeleton label image.

    Args:
      joints: (18, 3) array of (x, y, confidence) in pixel coords of the
        target canvas.
      height/width: output canvas size (static).
      radius: limb capsule half-width in pixels.
      conf_thresh: joints below this confidence do not draw.

    Returns:
      (H, W, 3) float32 image in [-1, 1]; background is -1, limbs carry the
      OpenPose rainbow color per limb (nearest limb wins on overlap).
    """
    joints = joints.astype(jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = jnp.broadcast_to(ys, (height, width))
    px = jnp.broadcast_to(xs, (height, width))

    a = joints[_LIMBS_A]  # (L, 3)
    b = joints[_LIMBS_B]
    colors = jnp.asarray(LIMB_COLORS)         # (L, 3) in [0,1]

    # running min over the (static) limb list: avoids materializing the
    # (L, H, W) distance stack + argmin (~64 ms/step at 512px in the device
    # trace); XLA fuses the unrolled chain into one pass over the grid.
    # Colors accumulate as THREE separate (H, W) planes: an (H, W, 3)
    # running image puts C=3 on the 128-lane minor dim (42x tile padding —
    # the per-limb updates cost ~23 ms/batch8 in the device trace); clean
    # (H, W) planes stack into the RGB image exactly once at the end.
    best_d2 = jnp.full((height, width), jnp.inf, jnp.float32)
    planes = [jnp.zeros((height, width), jnp.float32) for _ in range(3)]
    for i in range(len(_LIMBS_A)):
        ai, bi = a[i], b[i]
        d2 = _point_segment_dist2(px, py, ai[0], ai[1], bi[0], bi[1])
        valid = (ai[2] > conf_thresh) & (bi[2] > conf_thresh)
        d2 = jnp.where(valid, d2, jnp.inf)
        upd = d2 < best_d2
        best_d2 = jnp.where(upd, d2, best_d2)
        planes = [jnp.where(upd, colors[i, c], planes[c]) for c in range(3)]
    hit = best_d2 <= radius * radius
    planes = [jnp.where(hit, p, 0.0) * 2.0 - 1.0 for p in planes]
    return jnp.stack(planes, axis=-1)


@functools.partial(jax.jit, static_argnames=("height", "width", "sigma"))
def joint_heatmaps(joints: jnp.ndarray, height: int, width: int,
                   sigma: float = 6.0) -> jnp.ndarray:
    """(18,3) joints -> (H, W, 18) Gaussian heatmaps (0 where conf==0)."""
    joints = joints.astype(jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)[:, None, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :, None]
    jx = joints[None, None, :, 0]
    jy = joints[None, None, :, 1]
    conf = joints[None, None, :, 2]
    d2 = (xs - jx) ** 2 + (ys - jy) ** 2
    hm = jnp.exp(-d2 / (2.0 * sigma * sigma))
    return jnp.where(conf > 0.05, hm, 0.0)


def render_skeleton_batch(joints: jnp.ndarray, height: int, width: int,
                          radius: float = 4.0) -> jnp.ndarray:
    """(B,18,3) -> (B,H,W,3) batched skeleton render."""
    fn = functools.partial(render_skeleton, height=height, width=width, radius=radius)
    return jax.vmap(fn)(joints)


@functools.partial(jax.jit, static_argnames=("height", "width", "sigma",
                                             "conf_thresh"))
def limb_coord_maps(joints: jnp.ndarray, height: int, width: int,
                    sigma: float = 12.0,
                    conf_thresh: float = 0.05) -> jnp.ndarray:
    """(18,3) joints -> (H, W, 2L) limb-local coordinate channels.

    The structural answer to the IUV wall (docs/QUALITY.md decomposition:
    TransG's UV accuracy owns the ~15 dB held-out gap): DensePose UV is a
    limb-aligned parametrization, so hand the UV heads each limb's LOCAL
    frame instead of making convs reconstruct it from a line render. Per
    limb i two channels, both enveloped by a Gaussian w in perpendicular
    distance (so they are localized and w doubles as a soft limb mask):

      ch_t = w * (2t - 1)   t: normalized position along the segment [0,1]
      ch_d = w * (d / sigma)  d: SIGNED perpendicular distance (sign =
                              which side of the limb — the U axis needs it)

    Limbs with an endpoint below conf_thresh contribute zeros (same gating
    as render_skeleton). Purely keypoint-derived — a pose encoding in the
    same class as joint_heatmaps ("18Feature"), not corpus-specific
    supervision. Elementwise VPU work over the grid; fuses under jit.
    """
    joints = joints.astype(jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = jnp.broadcast_to(ys, (height, width))
    px = jnp.broadcast_to(xs, (height, width))
    a = joints[_LIMBS_A]  # (L, 3)
    b = joints[_LIMBS_B]
    chans = []
    for i in range(len(_LIMBS_A)):
        ai, bi = a[i], b[i]
        abx, aby = bi[0] - ai[0], bi[1] - ai[1]
        apx, apy = px - ai[0], py - ai[1]
        denom = jnp.maximum(abx * abx + aby * aby, 1e-6)
        t = jnp.clip((apx * abx + apy * aby) / denom, 0.0, 1.0)
        dx = apx - t * abx          # pixel -> closest point on segment
        dy = apy - t * aby
        # signed perpendicular distance: sign of the 2D cross product
        # (ab x ap); magnitude from the clamped closest point so endcap
        # regions fall off radially like the capsule render does
        d = jnp.sqrt(dx * dx + dy * dy + 1e-12)
        side = jnp.sign(abx * apy - aby * apx)
        w = jnp.exp(-(d * d) / (2.0 * sigma * sigma))
        valid = (ai[2] > conf_thresh) & (bi[2] > conf_thresh)
        w = jnp.where(valid, w, 0.0)
        chans.append(w * (2.0 * t - 1.0))
        chans.append(w * side * (d / sigma))
    return jnp.stack(chans, axis=-1)
