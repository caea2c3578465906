"""DensePose IUV decoding (pseudo-ground-truth for the UV generator).

The reference consumes detectron2-DensePose IUV images from the per-video
``densepose/`` directory (reference: README.md:54, train_start/
pretrain_start.sh:18). Contract pinned here (and by tests): an IUV image is
an 8-bit 3-channel image whose channel 0 holds the part index I in {0..24}
(0 = background), channel 1 holds U*255 and channel 2 holds V*255.

Decoded form used throughout the framework:
  parts: (H, W) int32 part index map, 0 = background
  uv:    (H, W, 2) float32 in [0, 1]
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

N_PARTS = 24


def decode_iuv(iuv: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(H,W,3) uint8 IUV image -> (parts (H,W) int32, uv (H,W,2) float32)."""
    iuv = np.asarray(iuv)
    parts = iuv[..., 0].astype(np.int32)
    parts = np.clip(parts, 0, N_PARTS)
    uv = iuv[..., 1:3].astype(np.float32) / 255.0
    uv[parts == 0] = 0.0
    return parts, uv


def encode_iuv(parts: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Inverse of decode_iuv -> (H,W,3) uint8."""
    out = np.zeros(parts.shape + (3,), np.uint8)
    out[..., 0] = np.clip(parts, 0, N_PARTS).astype(np.uint8)
    out[..., 1] = np.clip(np.round(uv[..., 0] * 255.0), 0, 255).astype(np.uint8)
    out[..., 2] = np.clip(np.round(uv[..., 1] * 255.0), 0, 255).astype(np.uint8)
    out[parts == 0, 1:] = 0
    return out


def parts_one_hot(parts: np.ndarray, n_parts: int = N_PARTS) -> np.ndarray:
    """(H,W) int -> (H,W,n_parts+1) float32 one-hot (channel 0 = background)."""
    return (parts[..., None] == np.arange(n_parts + 1)).astype(np.float32)
