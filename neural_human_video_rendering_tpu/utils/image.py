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


def save_image(path: str, img) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(to_uint8(img), cv2.COLOR_RGB2BGR))
