"""Image conversion + saving helpers."""

from __future__ import annotations

import os

import cv2
import numpy as np


def to_uint8(img, assume_01: bool = False) -> np.ndarray:
    """(H,W,C) float image -> uint8 RGB. Default range [-1,1]; masks and
    other [0,1] data pass assume_01=True. Single channel is tiled to RGB."""
    arr = np.asarray(img, np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    if assume_01:
        arr = arr * 2.0 - 1.0
    arr = (np.clip(arr, -1, 1) + 1.0) * 127.5
    return arr.round().astype(np.uint8)


def save_image(path: str, img, quality: int = 98) -> None:
    """Write an RGB float image. JPEG quality defaults to 98: at the
    model's ~34 dB operating point the default encoder (q95, ~32.8 dB
    ceiling measured on texture-heavy renders) was eating an error share
    comparable to the model's own — q98 lifts the encode ceiling ~1 dB
    above it at ~1/3 of PNG size, keeping the reference's .jpg artifact
    contract."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    params = ([cv2.IMWRITE_JPEG_QUALITY, quality]
              if path.lower().endswith((".jpg", ".jpeg")) else [])
    cv2.imwrite(path, cv2.cvtColor(to_uint8(img), cv2.COLOR_RGB2BGR), params)
